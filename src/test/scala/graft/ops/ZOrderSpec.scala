package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits with column i at positions b*n+i") {
    // x = 0b1010 -> even positions 2,6; y = 0b0101 -> odd positions 1,5.
    val r = Seq((10, 5)).toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), 4).as("z"))
      .as[Long].head()
    assert(r == ((1L << 2) | (1L << 6) | (1L << 1) | (1L << 5)))
  }

  test("zValue of three columns matches a hand-computed code") {
    // x=1 (bit0), y=2 (bit1), z=4 (bit2): positions 0*3+0, 1*3+1, 2*3+2.
    val r = Seq((1, 2, 4)).toDF("x", "y", "z")
      .select(ZOrder.zValue(Seq($"x", $"y", $"z"), 3).as("m"))
      .as[Long].head()
    assert(r == ((1L << 0) | (1L << 4) | (1L << 8)))
  }

  test("z-order clustering concentrates a box query into fewer chunks") {
    // 32x32 grid, 16 chunks of 64 rows. The 8x8 box at the origin is
    // ONE contiguous z-range (z < 64 -> chunk 0); under lexicographic
    // (x, y) order the same box spreads over 4 chunks (x=0..7 spans
    // four 2-column stripes of 64 rows each).
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    def chunksTouched(ordered: org.apache.spark.sql.DataFrame): Long = {
      val (indexed, _) = ScaleOps.withGlobalIndex(
        ordered, Seq($"__k", $"x", $"y"), "pos")
      indexed.where($"x" < 8 && $"y" < 8)
        .select(($"pos" / 64).cast("long")).distinct().count()
    }
    val zChunks = chunksTouched(
      grid.select($"x", $"y", ZOrder.zValue(Seq($"x", $"y"), 5).as("__k")))
    val lexChunks = chunksTouched(
      grid.select($"x", $"y", ($"x" * 32 + $"y").cast("long").as("__k")))
    assert(zChunks == 1, s"z-order box should live in one chunk, got $zChunks")
    assert(lexChunks == 4)
  }

  test("degenerate shapes are rejected") {
    intercept[IllegalArgumentException] { ZOrder.zValue(Seq($"x"), 8) }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq($"a", $"b", $"c", $"d"), 16)
    }
  }
}
