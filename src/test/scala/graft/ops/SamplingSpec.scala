package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.Tables

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("splitColumn proportions approach the weights") {
    val n = docs.count().toDouble
    val counts = docs
      .select(Sampling.splitColumn($"doc_id", "s1",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / n - 0.8) < 0.06)
    assert(math.abs(counts("val") / n - 0.1) < 0.06)
    assert(math.abs(counts("test") / n - 0.1) < 0.06)
  }

  test("split assignment is deterministic and partitioning-invariant") {
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", Sampling.splitColumn($"doc_id", "s1",
        Seq("train" -> 0.8, "val" -> 0.2)).as("split"))
      .as[(Long, String)].collect().toMap
    val a = assign(docs)
    val b = assign(docs.repartition(7, $"source"))
    assert(a == b)
  }

  test("sampleByHash keeps ~fraction and is stable across runs") {
    val s1 = Sampling.sampleByHash(docs, $"doc_id", 0.3, "x")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(docs, $"doc_id", 0.3, "x")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size / docs.count().toDouble - 0.3) < 0.06)
    // Different salt draws a genuinely different sample.
    val s3 = Sampling.sampleByHash(docs, $"doc_id", 0.3, "y")
      .select("doc_id").as[Long].collect().toSet
    assert(s3 != s1)
  }

  test("mixture keeps unweighted groups whole and downsamples weighted ones") {
    val kept = Sampling.mixture(docs, $"source", $"doc_id",
      Map("src0" -> 0.2), defaultWeight = 1.0, salt = "m1")
    val bySource = kept.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    val origBySource = docs.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySource("src0") < origBySource("src0"))
    origBySource.keys.filter(_ != "src0").foreach { s =>
      assert(bySource(s) == origBySource(s), s"source $s should be whole")
    }
  }

  test("stratifiedK takes exactly k per stratum, partition-invariantly") {
    val sample = Sampling.stratifiedK(docs.select($"doc_id", $"source"),
      $"source", $"doc_id", 3, "sk")
    val counts = sample.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.forall(_ == 3) && counts.nonEmpty)
    val again = Sampling.stratifiedK(
        docs.select($"doc_id", $"source").repartition(7),
        $"source", $"doc_id", 3, "sk")
      .as[(Long, String)].collect().toSet
    assert(again == sample.as[(Long, String)].collect().toSet)
    // small strata return all their rows, not an error
    val tiny = Sampling.stratifiedK(
        docs.select($"doc_id", $"source").limit(2), $"source", $"doc_id",
        5, "sk")
      .count()
    assert(tiny == 2)
  }

  test("splitColumn rejects non-positive weights") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn($"doc_id", "s", Seq("a" -> 0.0, "b" -> 1.0))
    }
  }

  test("temperatureMixture keeps the smallest source whole, shrinks big ones") {
    val df = ((0 until 40).map(i => (i.toLong, "big")) ++
      (100 until 110).map(i => (i.toLong, "small")))
      .toDF("id", "src")
    val kept = Sampling.temperatureMixture(df, $"src", $"id", 0.5, "t0")
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    // keep("small") = 1.0 exactly; keep("big") = sqrt(10/40) = 0.5.
    assert(kept("small") == 10L)
    assert(kept("big") > 10L && kept("big") < 30L)
    // alpha = 1 is proportional: everything kept.
    val all = Sampling.temperatureMixture(df, $"src", $"id", 1.0, "t0")
    assert(all.count() == 50L)
  }

  test("temperatureMixture is layout-invariant and keeps null groups whole") {
    val df = ((0 until 30).map(i => (i.toLong, Some("a"))) ++
      (50 until 60).map(i => (i.toLong, Some("b"))) ++
      Seq((98L, None), (99L, None)))
      .toDF("id", "src")
    def keptIds(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMixture(d, $"src", $"id", 0.3, "t1")
        .select($"id").as[Long].collect().toSet
    val base = keptIds(df)
    assert(keptIds(df.repartition(7)) == base)
    assert(base.contains(98L) && base.contains(99L))
  }

  test("weightedSample: weight 1 always keeps, 0 never, null drops") {
    val df = (0L until 100L).map(i =>
      (i, if (i < 20) 1.0 else if (i < 40) 0.0
          else if (i < 60) Double.NaN else 0.5))
      .toDF("id", "w")
      .withColumn("w", when(isnan($"w"), lit(null)).otherwise($"w"))
    val kept = Sampling.weightedSample(df, $"w", $"id", "ws0")
      .select($"id").as[Long].collect().toSet
    assert((0L until 20L).forall(kept.contains))    // weight 1: all kept
    assert((20L until 60L).forall(i => !kept.contains(i))) // 0 and null
    val half = kept.count(_ >= 60)
    assert(half > 5 && half < 35, s"~half of 40 expected, got $half")
    // determinism: same call, same set
    val again = Sampling.weightedSample(df.repartition(7), $"w", $"id", "ws0")
      .select($"id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("weightedK takes exactly k per stratum, biased toward weight") {
    // one stratum; ids 0..199 with weight 1, ids 1000..1019 with weight
    // 100 — the heavy rows should dominate a k=10 sample.
    val df = ((0L until 200L).map(i => (i, 1.0)) ++
      (1000L until 1020L).map(i => (i, 100.0))).toDF("id", "w")
      .withColumn("g", lit("s"))
    val kept = Sampling.weightedK(df, $"g", $"w", $"id", 10, "wk0")
      .select($"id").as[Long].collect().toSet
    assert(kept.size == 10)
    assert(kept.count(_ >= 1000L) >= 6,
      s"heavy rows underrepresented: $kept")
    // partition-invariance: same winners any layout
    val again = Sampling.weightedK(df.repartition(13), $"g", $"w", $"id",
      10, "wk0").select($"id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("weightedK drops null/zero/negative weights; small strata whole") {
    val df = Seq(
      (1L, Some(2.0), "a"), (2L, Some(0.0), "a"), (3L, None, "a"),
      (4L, Some(-1.0), "a"), (5L, Some(1.0), "b"))
      .toDF("id", "w", "g")
    val kept = Sampling.weightedK(df, $"g", $"w", $"id", 5, "wk1")
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L)) // only positive-weight rows have ranks
  }

  test("shuffled assigns a contiguous partition-invariant permutation") {
    def perm(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Sampling.shuffled(df.select($"doc_id"), $"doc_id", "e0")
        .as[(Long, Long)].collect().toMap
    val base = perm(docs)
    val n = docs.count()
    assert(base.size == n)
    assert(base.values.toSeq.sorted == (0L until n))
    // Pure function of the keys: layout changes must not move any row.
    assert(perm(docs.repartition(11, $"source")) == base)
    // A different salt is an independent epoch order.
    val other = Sampling.shuffled(docs.select($"doc_id"), $"doc_id", "e1")
      .as[(Long, Long)].collect().toMap
    assert(other != base && other.values.toSeq.sorted == (0L until n))
  }

  test("shuffled drops null keys rather than ranking them") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    val r = Sampling.shuffled(df, $"doc_id", "e0")
      .as[(Long, Long)].collect()
    assert(r.map(_._1).toSet == Set(1L, 2L))
    assert(r.map(_._2).sorted.toSeq == Seq(0L, 1L))
  }

  test("negativesK: k non-self draws per anchor, deterministic, salt-sensitive") {
    val df = (1L to 20L).toDF("doc_id")
    val a = Sampling.negativesK(df, "doc_id", k = 3, salt = "e1")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a.size == 60)
    assert(a.forall { case (anchor, _, neg) => anchor != neg },
      "an anchor must never draw itself")
    assert(a.map(_._1).distinct.size == 20)
    // Pure function of (id, j, salt): identical on recompute...
    val b = Sampling.negativesK(df, "doc_id", k = 3, salt = "e1")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
    // ...and a different salt is an independent epoch.
    val c = Sampling.negativesK(df, "doc_id", k = 3, salt = "e2")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a != c)
  }

  test("negativesK excludes null ids and rejects degenerate corpora") {
    val df = Seq(Some(1L), None, Some(2L), Some(3L)).toDF("doc_id")
    val r = Sampling.negativesK(df, "doc_id", k = 2, salt = "e1")
      .as[(Long, Int, Long)].collect()
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(r.forall(x => Set(1L, 2L, 3L).contains(x._3)))
    intercept[IllegalArgumentException] {
      Sampling.negativesK(Seq(1L).toDF("doc_id"), "doc_id", 2, "e1")
    }
  }

  // --- budgetPlan ---

  private def planOf(rows: Seq[(String, Long)], budget: Long,
      alpha: Double = 0.5, iters: Int = 8) =
    Sampling.budgetPlan(
      rows.toDF("src", "toks"), col("src"), col("toks"), budget, alpha, iters)
      .as[(String, Long, Double, Long, Boolean)]
      .collect().sortBy(_._1).toSeq

  test("budgetPlan: ample budget allocates weight-proportional shares, no caps") {
    val p = planOf(Seq("a" -> 100L, "b" -> 400L), budget = 100L, alpha = 1.0)
    // alpha=1: weights 100/400 => shares 20/80 of the 100-token budget
    assert(p === Seq(("a", 100L, 100.0, 20L, false),
      ("b", 400L, 400.0, 80L, false)))
  }

  test("budgetPlan: capped groups get their capacity, surplus redistributes") {
    // uniform-ish weights, tiny group a caps; its unused share flows to b/c
    val p = planOf(Seq("a" -> 10L, "b" -> 1000L, "c" -> 1000L), 600L)
    val m = p.map(r => r._1 -> r).toMap
    assert(m("a")._4 === 10L && m("a")._5 === true)
    assert(!m("b")._5 && !m("c")._5)
    assert(m("b")._4 === m("c")._4) // equal capacities => equal shares
    // everything allocated except floor residue < |active|
    val total = p.map(_._4).sum
    assert(total <= 600L && total >= 600L - 2)
  }

  test("budgetPlan: cascading caps converge within the iteration bound") {
    // geometric capacities with a budget below total: capping group k
    // raises the rest's shares enough to cap group k+1 — a deep cascade
    val caps = (0 until 6).map(i => s"g$i" -> (10L << i)) // 10..320
    val p = planOf(caps, budget = 500L, alpha = 0.1, iters = 8)
    val total = p.map(_._4).sum
    assert(total <= 500L && total >= 500L - p.count(!_._5))
    assert(p.forall(r => r._4 <= r._2)) // never above capacity
    // budget below total capacity (630) => at least one uncapped group
    assert(p.exists(!_._5) && p.exists(_._5))
  }

  test("budgetPlan: budget above total capacity caps everything") {
    val p = planOf(Seq("a" -> 5L, "b" -> 7L), budget = 1000L)
    assert(p.forall(_._5) && p.map(_._4) === Seq(5L, 7L))
  }

  test("budgetPlan is partition-invariant and drops null groups/tokens") {
    import org.apache.spark.sql.functions.{col => c}
    val df = Seq((Some("a"), Some(100L)), (Some("a"), Some(50L)),
      (None, Some(10L)), (Some("b"), None), (Some("b"), Some(30L)))
      .toDF("src", "toks")
    val a = Sampling.budgetPlan(df, c("src"), c("toks"), 60L, 0.5)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Sampling.budgetPlan(df.repartition(7), c("src"), c("toks"),
      60L, 0.5).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.head) === Array("a", "b")) // null group excluded
    assert(a(0)(1) === 150L) // null-token row excluded from b's capacity
    intercept[IllegalArgumentException](
      Sampling.budgetPlan(df, c("src"), c("toks"), -1L, 0.5))
    intercept[IllegalArgumentException](
      Sampling.budgetPlan(df, c("src"), c("toks"), 1L, 0.0))
  }
}
