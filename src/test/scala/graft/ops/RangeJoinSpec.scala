package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.Tables

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def bands = spark.range(0, 10)
    .select($"id".as("band_id"), ($"id" * lit(250.0)).as("lo"),
      (($"id" + 1) * lit(250.0)).as("hi"))

  test("binned equals the naive range join on the fixture") {
    val part = Tables.part(spark, sf).select("p_partkey", "p_retailprice")
    val naive = part.join(bands,
        $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
      .select("p_partkey", "band_id").as[(Long, Long)].collect().toSet
    val fast = RangeJoin.binned(part, $"p_retailprice", bands, $"lo", $"hi", 100.0)
      .select("p_partkey", "band_id").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("intervals spanning many bins and values on boundaries stay exact") {
    val values = Seq(0.0, 99.9, 100.0, 250.0, 999.9, 1000.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vid", "v")
    val intervals = Seq((0L, 100.0, 1000.0), (1L, 250.0, 250.0), (2L, 0.0, 100.0))
      .toDF("iid", "lo", "hi")
    val naive = values.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      .select("vid", "iid").as[(Long, Long)].collect().toSet
    val fast = RangeJoin.binned(values, $"v", intervals, $"lo", $"hi", 30.0)
      .select("vid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    // [250, 250) is empty; boundary 100.0 belongs to [100,1000) not [0,100).
    assert(naive.contains((2L, 0L)) && !naive.exists(_._2 == 1L))
  }

  test("a corrupt very-wide interval fails fast with a named width") {
    val values = Seq((1L, 5.0)).toDF("vid", "v")
    val intervals = Seq((1L, 0.0, 1.0e12)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.binned(values, $"v", intervals, $"lo", $"hi", 1.0).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("RangeJoin.binned"), msg)
    // A raised limit admits the same interval.
    val ok = RangeJoin.binned(values, $"v", intervals, $"lo", $"hi", 1.0e11,
      maxBinsPerInterval = 100L).select("vid", "iid")
      .as[(Long, Long)].collect().toSet
    assert(ok == Set((1L, 1L)))
  }

  test("null interval bounds drop the row (inner-join semantics), no abort") {
    val values = Seq((1L, 5.0)).toDF("vid", "v")
    val intervals = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(10.0)),
      (3L, Some(0.0), None)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(values, $"v", intervals, $"lo", $"hi", 5.0)
      .select("vid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("inverted intervals (hi <= lo) drop the row instead of exploding") {
    val values = Seq((1L, 5.0)).toDF("vid", "v")
    // negative nBins would sail past the guard and sequence() would then
    // build a huge DESCENDING array — the row must be dropped up front
    val intervals = Seq((1L, 1.0e12, 0.0), (2L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(values, $"v", intervals, $"lo", $"hi", 1.0)
      .select("vid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("binned plans as a hash join, never a nested loop") {
    val part = Tables.part(spark, sf).select("p_partkey", "p_retailprice")
    val plan = RangeJoin.binned(part, $"p_retailprice", bands, $"lo", $"hi", 250.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin"), plan)
  }
}
