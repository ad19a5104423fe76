package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.dedup.Dedup

class MinHashAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (3L, "a completely different document about catalyst optimizer rule design"),
  ).toDF("doc_id", "text")

  private def typedShingles =
    Dedup.shingleTable(docs, "text", "doc_id", 3)
      .select($"id", $"shingle").as[(Long, String)]

  test("signature estimate: near-dups agree, unrelated docs differ") {
    val sigs = typedShingles
      .groupByKey(_._1)
      .mapGroups { (id: Long, rows: Iterator[(Long, String)]) =>
        val agg = new MinHashAgg(32)
        val buf = rows.foldLeft(agg.zero) { case (b, (_, s)) => agg.reduce(b, s) }
        (id, agg.finish(buf))
      }
      .collect().toMap
    val nearDup = MinHashAgg.estimateJaccard(sigs(1L), sigs(2L))
    val unrelated = MinHashAgg.estimateJaccard(sigs(1L), sigs(3L))
    assert(nearDup > 0.5, s"near-dup estimate $nearDup")
    assert(unrelated < 0.2, s"unrelated estimate $unrelated")
  }

  test("runs inside Dataset.agg (distributed single-pass) = manual fold") {
    val viaDatasetAgg = typedShingles.groupByKey(_._1)
      .agg(new MinHashAggOnPair(16).toColumn).collect().toMap
    val manual = typedShingles.collect().groupBy(_._1).map { case (id, rows) =>
      val a = new MinHashAgg(16)
      id -> a.finish(rows.foldLeft(a.zero) { case (b, (_, s)) => a.reduce(b, s) })
    }
    assert(viaDatasetAgg.nonEmpty)
    viaDatasetAgg.foreach { case (id, sig) => assert(sig == manual(id)) }
  }
}

/** Pair-input adapter so the aggregator runs inside Dataset.agg (the
  * grouped value is the (id, shingle) tuple). */
class MinHashAggOnPair(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[(Long, String), Array[Long], Seq[Long]] {
  private val inner = new MinHashAgg(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], a: (Long, String)): Array[Long] =
    inner.reduce(b, a._2)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(r: Array[Long]): Seq[Long] = inner.finish(r)
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] = inner.bufferEncoder
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] = inner.outputEncoder
}
