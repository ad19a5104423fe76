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

  test("psiBins: identical distributions give near-zero terms, all bins kept") {
    val a = Seq(1.0, 12.0, 25.0, 38.0).toDF("v")
    val got = Profiling.psiBins(a, a, $"v", 0.0, 40.0, 4)
      .orderBy($"bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(0, 1, 2, 3))
    assert(got.forall(r => r._2 === r._3 && r._6 === 0.0))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12) // smoothed fracs sum to 1
  }

  test("psiBins: a shifted distribution registers positive drift terms") {
    val before = Seq.fill(50)(5.0).toDF("v")
    val after = Seq.fill(50)(35.0).toDF("v")
    val got = Profiling.psiBins(before, after, $"v", 0.0, 40.0, 4)
      .orderBy($"bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got(0)._2 === 50L && got(0)._3 === 0L)
    assert(got(3)._2 === 0L && got(3)._3 === 50L)
    // moved mass yields large positive terms at both ends
    assert(got(0)._6 > 1.0 && got(3)._6 > 1.0)
    // untouched middle bins: only smoothing mass, zero term
    assert(got(1)._6 === 0.0 && got(2)._6 === 0.0)
  }

  test("psiBins clamps out-of-range values into edge bins; nulls excluded") {
    val a = Seq(Some(-5.0), Some(100.0), None).toDF("v")
    val got = Profiling.psiBins(a, a, $"v", 0.0, 40.0, 4)
      .orderBy($"bin").as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got(0)._2 === 1L && got(3)._2 === 1L) // clamped, null dropped
    assert(got.map(_._2).sum === 2L)
    intercept[IllegalArgumentException](
      Profiling.psiBins(a, a, $"v", 0.0, 40.0, 0))
  }

  test("psiBins excludes NaN: no position on the axis, no edge-bin file") {
    // NaN passes isNotNull and Spark's floor→clamp would file it in bin
    // 0 while an ordering-based clamp (DuckDB least/greatest) files it
    // in the TOP bin — cross-engine divergence unless excluded.
    val a = Seq(Some(Double.NaN), Some(5.0), Some(35.0)).toDF("v")
    val got = Profiling.psiBins(a, a, $"v", 0.0, 40.0, 4)
      .orderBy($"bin").as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._2).sum === 2L) // NaN contributed to no bin
    assert(got(0)._2 === 1L && got(3)._2 === 1L)
  }
}
