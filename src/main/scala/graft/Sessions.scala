package graft

import org.apache.spark.sql.SparkSession

/** One place for session config shared by Verify, Bench, and tests, so the
  * engine behaves identically under every entry point. */
object Sessions {

  /** Configs the engine requires regardless of entry point. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // events.parquet carries TIMESTAMP(NANOS); read as long, converted to
    // µs TimestampType in Tables.read (Spark 4 has no nanos timestamp).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: String): SparkSession = {
    val s = configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }
}
