package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.Tables

class TopKPerKeySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("TopK.perKey equals the window row_number formulation") {
    val orders = Tables.orders(spark, sf)
    val native = TopK.perKey(orders,
        Seq($"o_custkey"), Seq($"o_totalprice".desc, $"o_orderkey"), 3)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val windowed = orders.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    assert(native == windowed && native.nonEmpty)
  }

  test("0.0 and -0.0 double keys form ONE group, like the window form") {
    // Raw UnsafeRow bytes differ for the two zero encodings; the keys
    // must be normalized at construction or one semantic group splits
    // across two heaps (and potentially two shuffle partitions).
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L))
      .toDF("k", "v")
    val got = TopK.perKey(df, Seq($"k"), Seq($"v"), 1)
      .select("v").as[Long].collect().toSet
    assert(got == Set(1L, 4L), s"got $got")
  }

  test("plans as partial + final with one exchange between them") {
    val plan = TopK.perKey(Tables.orders(spark, sf),
        Seq($"o_custkey"), Seq($"o_totalprice".desc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.contains("Exchange"), plan)
  }

  test("handles k larger than any group (no row loss)") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopK.perKey(df, Seq($"k"), Seq($"v".desc), 100)
      .as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 20), (2, 5)))
  }

  test("partial-pass key overflow degrades to passthrough, stays exact") {
    // maxPartialKeys=1: nearly every key overflows the partial map and
    // rides the shuffle raw; the sort-based final pass must still
    // produce exactly the per-key top-k.
    spark.conf.set("graft.topk.maxPartialKeys", "1")
    try {
      val orders = Tables.orders(spark, sf)
      val native = TopK.perKey(orders,
          Seq($"o_custkey"), Seq($"o_totalprice".desc, $"o_orderkey"), 3)
        .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      val windowed = orders.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3).select("o_custkey", "o_orderkey")
        .as[(Long, Long)].collect().toSet
      assert(native == windowed && native.nonEmpty)
    } finally spark.conf.unset("graft.topk.maxPartialKeys")
  }

  test("tie-break ordering is respected (deterministic winners)") {
    val df = Seq((1, 10, "a"), (1, 10, "b"), (1, 10, "c")).toDF("k", "v", "t")
    val got = TopK.perKey(df, Seq($"k"), Seq($"v".desc, $"t"), 2)
      .select("t").as[String].collect().toSet
    assert(got == Set("a", "b"))
  }
}
