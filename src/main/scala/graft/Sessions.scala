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
    // Streaming state-store provider override (r11, probe 17): every
    // stateful gate here keeps state proportional to DISTINCT KEYS
    // (open sessions, per-user rolling windows/totals), which the
    // default HDFS-backed provider holds in executor memory — the shape
    // that OOM'd stream_session's 100× run. SPARK_GRAFT_STATESTORE=
    // rocksdb flips the whole session to the off-heap/on-disk provider
    // (the production configuration) for A/B probing; the shipped
    // per-gate defaults are recorded in ARCHITECTURE.md.
    .config("spark.sql.streaming.stateStore.providerClass",
      sys.env.get("SPARK_GRAFT_STATESTORE") match {
        case Some("rocksdb") => "org.apache.spark.sql.execution.streaming" +
          ".state.RocksDBStateStoreProvider"
        case _ => "org.apache.spark.sql.execution.streaming" +
          ".state.HDFSBackedStateStoreProvider"
      })

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
