package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ProfilingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("b"), Some(10)),
    (2L, Some("a"), None),
    (3L, None, Some(30)),
    (4L, Some("a"), Some(10)),
  ).toDF("id", "s", "v")

  test("columnStats computes exact per-column stats in one row each") {
    val r = Profiling.columnStats(rows, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("id") == (("id", 4L, 4L, 4L, "1", "4")))
    assert(r("s") == (("s", 4L, 3L, 2L, "a", "b")))
    assert(r("v") == (("v", 4L, 3L, 2L, "10", "30")))
  }

  test("columnStats is a single aggregate, not one job per column") {
    // One Aggregate subtree (the Expand handles the distinct set); a
    // per-column implementation would union several aggregates.
    val plan = Profiling.columnStats(rows, Seq("id", "s", "v"))
      .queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(unions.isEmpty, plan.toString)
  }

  test("approxColumnStats matches exact counts on small-cardinality data") {
    val exact = Profiling.columnStats(rows, Seq("id", "s"))
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Profiling.approxColumnStats(rows, Seq("id", "s"))
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    // HLL++ is exact well below its error bound at cardinality 4.
    assert(approx == exact)
  }

  test("equiDepthHistogram balances counts and orders bounds") {
    // 100 skewed values: equi-depth must still give 25 per bucket.
    val df = (1 to 100).map(i => i * i).toDF("v")
    val h = Profiling.equiDepthHistogram(df, $"v", 4)
      .as[(Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(h.map(_._2).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(h.head._3 == 1 && h.last._4 == 10000)
    // Buckets tile the value range without overlap.
    h.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
  }

  test("equiDepthHistogram drops nulls and handles fewer rows than buckets") {
    val df = Seq(Some(3), None, Some(1)).toDF("v")
    val h = Profiling.equiDepthHistogram(df, $"v", 5)
      .as[(Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(h.map(_._2).sum == 2 && h.length == 2)
  }

  test("columnStats renders min/max under native ordering, not string") {
    // 9 < 10 numerically but "10" < "9" lexicographically.
    val df = Seq(9, 10, 2).toDF("n")
    val r = Profiling.columnStats(df, Seq("n"))
      .select("min_value", "max_value").as[(String, String)].head()
    assert(r == (("2", "10")))
  }
}
