package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r10 diagnosis tool for the late-SCD2 gate's 100× OOM: runs the
  * interleaved 4-batch mergeHistoryWithLate fold with configurable
  * checkpoint storage and per-fold wall/row reporting.
  *
  * Usage: Test/runMain graft.tools.Scd2Probe <sfDir> <mem|disk>
  */
object Scd2Probe {
  def main(args: Array[String]): Unit = {
    val Array(dir, mode) = args.take(2)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    import spark.implicits._
    val history = graft.model.Tables.orders(spark, dir)
      .select($"o_custkey".as("key"), $"o_orderkey".as("version"),
        $"o_totalprice".as("amount"))
    def pin(df: org.apache.spark.sql.DataFrame) =
      if (mode == "disk") df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      else df.localCheckpoint()
    val empty = graft.ops.Cdc.compressHistory(history.limit(0),
      Seq("key"), "version", Seq("amount"))
    var acc = empty
    for (b <- 0L until 4L) {
      val t0 = System.nanoTime()
      val batch = history.filter(pmod($"version", lit(4L)) === b)
      val raw = history.filter(pmod($"version", lit(4L)) < b)
      acc = pin(graft.ops.Cdc.mergeHistoryWithLate(acc, raw, batch,
        Seq("key"), "version", Seq("amount")))
      val n = acc.count()
      println(f"""{"probe":"scd2","fold":$b,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"mode":"$mode"}""")
    }
    spark.stop()
  }
}
