package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingRollupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rollup(df: DataFrame): DataFrame = df.groupBy($"k")
    .agg(count(lit(1)).as("cnt"), sum($"v").as("sv"))

  private val schema = rollup(Seq(("x", 1L)).toDF("k", "v")).schema

  private def state(dir: String): Map[String, (Long, Long)] =
    StreamingRollup.read(spark, dir, Seq("k"), schema)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("streamed rollup equals the batch aggregate of all input") {
    implicit val sql = spark.sqlContext
    val dir = tmpDir("rollup")
    val ckpt = tmpDir("rollup_ckpt")
    val input = MemoryStream[(String, Long)]
    val q = StreamingRollup.start(input.toDS().toDF("k", "v"),
      rollup, dir, ckpt)
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      assert(state(dir) == Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))
      input.addData(("a", 5L), ("c", 7L))
      q.processAllAvailable()
      assert(state(dir) ==
        Map("a" -> ((3L, 8L)), "b" -> ((1L, 10L)), "c" -> ((1L, 7L))))
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("an at-least-once replayed batch does not double-count") {
    val dir = tmpDir("rollup_replay")
    val b = rollup(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    StreamingRollup.writeDelta(b, dir, 0L)
    StreamingRollup.writeDelta(b, dir, 0L) // replay of batch 0
    assert(state(dir) == Map("a" -> ((1L, 1L)), "b" -> ((1L, 2L))))
  }

  test("compaction folds deltas without changing the rollup") {
    val dir = tmpDir("rollup_compact")
    StreamingRollup.writeDelta(
      rollup(Seq(("a", 1L), ("b", 2L)).toDF("k", "v")), dir, 0L)
    StreamingRollup.writeDelta(
      rollup(Seq(("a", 4L)).toDF("k", "v")), dir, 1L)
    val before = state(dir)
    StreamingRollup.compact(spark, dir, Seq("k"), schema)
    assert(state(dir) == before)
    // History really collapsed: exactly one delta partition remains.
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(parts.map(_.getName).toSeq == Seq("batch=-1"))
    // And maintenance continues cleanly after a compact.
    StreamingRollup.writeDelta(
      rollup(Seq(("b", 1L)).toDF("k", "v")), dir, 2L)
    assert(state(dir) == Map("a" -> ((2L, 5L)), "b" -> ((2L, 3L))))
  }

  test("reading an absent rollup yields an empty frame, not a failure") {
    assert(state(tmpDir("rollup_empty")).isEmpty)
  }
}
