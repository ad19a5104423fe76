package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class EmbeddingsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def dir(df: org.apache.spark.sql.DataFrame, dims: Int) =
    Embeddings.dominantDirection(df, "embedding", dims)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)

  test("recovers a planted dominant axis at unit max-norm") {
    // Strong variance along dim 1, noise elsewhere — the power method
    // must converge toward e1 (sign fixed + by the all-ones start).
    val rows = (0 until 200).map { i =>
      Seq(0.01 * (i % 7 - 3), 10.0 + (i % 5), 0.02 * (i % 3 - 1))
    }.toDF("embedding")
    val v = dir(rows, 3)
    assert(v(1) == 1.0, v.toSeq)
    assert(math.abs(v(0)) < 0.05 && math.abs(v(2)) < 0.05, v.toSeq)
  }

  test("result is partitioning-invariant (exact decimal matvec sums)") {
    val rows = (0 until 300).map { i =>
      Seq(math.sin(i * 0.7), math.cos(i * 1.3) * 2.0, (i % 11) * 0.1)
    }.toDF("embedding")
    val a = dir(rows, 3)
    val b = Embeddings.dominantDirection(rows.repartition(13), "embedding", 3)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    assert(a.toSeq == b.toSeq)
  }

  test("null vectors are dropped; null elements contribute nothing") {
    val clean = Seq(Seq[java.lang.Double](3.0, 1.0), Seq[java.lang.Double](3.0, -1.0))
    val dirty = clean ++ Seq(null, Seq[java.lang.Double](null, null))
    val a = dir(clean.toDF("embedding"), 2)
    val b = dir(dirty.toDF("embedding"), 2)
    assert(a.toSeq == b.toSeq)
    assert(a(0) == 1.0) // dominant axis is dim 0
  }

  test("an all-zero corpus is rejected, not silently returned") {
    val zeros = Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)).toDF("embedding")
    intercept[IllegalArgumentException] { dir(zeros, 2) }
  }
}
