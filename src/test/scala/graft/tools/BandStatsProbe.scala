package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** r11 companion to SCALING.md probe 21: the (band, bh) bucket-size
  * distribution of the minhash band join on an arbitrary corpus —
  * the quantity that decides whether `saltedCandidatePairs`' triangle
  * blocks (blockRows) ever engage (a bucket of s rows splits into
  * ⌈s/blockRows⌉ blocks; s ≤ blockRows leaves the bucket unsplit).
  * Rebuilds the band buckets with the same public recipe the pair
  * queries use (default 8 bands × 4 rows, xxhash64 seeds).
  *
  * Usage: Test/runMain graft.tools.BandStatsProbe <sfDir>
  */
object BandStatsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    val docs = graft.model.Tables.documents(spark, dir)
    val (bands, rowsPerBand) = (8, 4)
    val k = bands * rowsPerBand
    val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
    val minCols = (0 until k).map(s =>
      min(xxhash64(col("shingle"), lit(s))).as(s"__m$s"))
    val sig = sh.groupBy("id").agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bh")))).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val hist = banded.groupBy("band", "bh").agg(count(lit(1)).as("n"))
    val row = hist.agg(count(lit(1)), max(col("n")),
      coalesce(sum(when(col("n") > 256, 1L)), lit(0L)),
      coalesce(sum(when(col("n") > 1024, 1L)), lit(0L)),
      coalesce(sum(when(col("n") > 4096, 1L)), lit(0L)),
      sum(col("n") * (col("n") - 1) / 2)).head
    println(s"""{"probe":"bandstats","dir":"$dir","buckets":${row.getLong(0)},""" +
      s""""max_bucket":${row.getLong(1)},"gt256":${row.getLong(2)},""" +
      s""""gt1024":${row.getLong(3)},"gt4096":${row.getLong(4)},""" +
      s""""pair_work":${row.getDouble(5).toLong}}""")
    spark.stop()
  }
}
