package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Probe 19f (r12 verdict #3), the DETECTION-ONLY arm: the WithLate
  * 0%-late floor's remaining structural cost is one filtered pass over
  * the folded base per fold — `is_current && valid_from >= batchMin` —
  * and the r12 claim was that against a STORED SCD2 table the predicate
  * pushes to the scan, while the fold-chain regime scans a checkpoint.
  * Whole-fold A/Bs cannot see this (the per-fold parquet/checkpoint
  * round-trip noise is larger than the detection itself — measured both
  * ways in the 19f fold arms), so this probe times EXACTLY the
  * detection: the suspect-slice filter + emptiness probe of
  * `mergeHistoryWithLateImpl`, repeated `reps` times against
  *  (a) a DISK_ONLY localCheckpoint of the folded base (the fold-chain
  *      gate's regime), and
  *  (b) the same base as a parquet table (the warehouse regime),
  * with `batchMin` above every change point (the in-order shape: the
  * slice is empty and the probe returns false) — plus the structural
  * receipt: the parquet arm's executed plan's PushedFilters line.
  *
  * Usage: Test/runMain graft.tools.Scd2DetectProbe <sfDir> [reps]
  */
object Scd2DetectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    import spark.implicits._
    val history = graft.model.Tables.orders(spark, dir)
      .select($"o_custkey".as("key"), $"o_orderkey".as("version"),
        $"o_totalprice".as("amount"))
    val base = graft.ops.Cdc.compressHistory(history,
      Seq("key"), "version", Seq("amount"))
    val ckpt = base.localCheckpoint(true, StorageLevel.DISK_ONLY)
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft_scd2_detect").toString
    try {
      ckpt.write.mode("overwrite").parquet(pqDir)
      val stored = spark.read.parquet(pqDir)
      val n = stored.count()
      // A batch min above every change point: the in-order regime,
      // where the suspect slice is empty on every fold.
      val minTs = history.agg(max($"version")).head.getLong(0) + 1L
      def suspects(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("is_current") && col("valid_from") >= lit(minTs))
      def arm(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        require(suspects(df).isEmpty, "suspects must be empty") // warm
        val times = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          require(suspects(df).isEmpty)
          (System.nanoTime() - t0) / 1e9
        }
        val sorted = times.sorted
        println(f"""{"probe":"scd2detect","arm":"$name","rows":$n,"reps":$reps,"median_sec":${sorted(reps / 2)}%.3f,"min_sec":${sorted.head}%.3f,"max_sec":${sorted.last}%.3f}""")
      }
      arm("checkpoint", ckpt)
      arm("parquet", stored)
      // Structural receipt: the predicate reaches the parquet scan.
      val planLine = suspects(stored).queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PushedFilters"))
        .getOrElse("(no PushedFilters line)")
      println(s"""{"probe":"scd2detect","pushed":"${
        planLine.trim.replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
    } finally graft.util.FsUtil.deleteTree(pqDir)
    spark.stop()
  }
}
