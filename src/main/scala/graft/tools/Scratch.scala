package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: the simhash
  * distinct-pair rewrite. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    noop(graft.SparkEntry.queries("text_stats")(spark, dir)) // warmup

    time("dedup_simhash QUERY warm0")(noop(
      graft.SparkEntry.queries("dedup_simhash")(spark, dir)))
    time("dedup_simhash QUERY warm1")(noop(
      graft.SparkEntry.queries("dedup_simhash")(spark, dir)))
    time("dedup_minhash QUERY warm0")(noop(
      graft.SparkEntry.queries("dedup_minhash_pairs")(spark, dir)))
    time("dedup_minhash QUERY warm1")(noop(
      graft.SparkEntry.queries("dedup_minhash_pairs")(spark, dir)))
    spark.stop()
  }
}
