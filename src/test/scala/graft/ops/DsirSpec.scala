package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Target talks about cats; raw mixes cat-docs and metal-docs. An
  // importance weighter must rank the cat-docs above the metal-docs.
  private def fixture = {
    val target = Seq(
      (1000L, "the cat sat on the mat with the cat"),
      (1001L, "a cat and another cat on a mat")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the cat sat on the mat again today"),
      (2L, "a cat on a mat with a cat"),
      (3L, "zinc alloy furnace slag output rose sharply"),
      (4L, "furnace slag and zinc alloy tonnage report")).toDF("doc_id", "text")
    (target, raw)
  }

  test("target-like raw docs get higher importance weights") {
    val (target, raw) = fixture
    val ratios = Dsir.logRatioTable(target, raw, "text", "doc_id", 64)
    val w = Dsir.importanceWeights(raw, ratios, "text", "doc_id", 64)
      .as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L))
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)),
      s"cat docs must outrank metal docs: $w")
  }

  test("weights are partitioning-invariant (pure function of the corpora)") {
    val (target, raw) = fixture
    def run(t: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(r,
          Dsir.logRatioTable(t, r, "text", "doc_id", 64),
          "text", "doc_id", 64)
        .as[(Long, Double)].collect().toMap
    assert(run(target, raw) == run(target.repartition(5), raw.repartition(7)))
  }

  test("gumbel resampling is deterministic, re-salts, and tracks the weights") {
    val (target, raw) = fixture
    val wts = Dsir.importanceWeights(raw,
      Dsir.logRatioTable(target, raw, "text", "doc_id", 64),
      "text", "doc_id", 64)
    def sample(salt: String) = Dsir.gumbelResample(wts, 2, salt)
      .select($"id").as[Long].collect().toSeq
    assert(sample("epoch-1") == sample("epoch-1"), "same salt, same draw")
    // Tracks the weights: with a large margin the cat docs dominate any
    // single draw of 2 across many salts more often than not — assert a
    // clear majority rather than a fragile every-salt claim.
    val hits = (0 until 10).count { e =>
      sample(s"epoch-$e").forall(Set(1L, 2L).contains)
    }
    assert(hits >= 6, s"cat docs won only $hits/10 draws")
  }

  test("the sample plan is a global bounded top-k, not a one-task window") {
    val (target, raw) = fixture
    val wts = Dsir.importanceWeights(raw,
      Dsir.logRatioTable(target, raw, "text", "doc_id", 64),
      "text", "doc_id", 64)
    val plan = Dsir.gumbelResample(wts, 2, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("docs without bigrams carry no weight row") {
    val target = Seq((1L, "a b")).toDF("doc_id", "text")
    val raw = Seq((2L, "a b"), (3L, "solo"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw,
      Dsir.logRatioTable(target, raw, "text", "doc_id", 16),
      "text", "doc_id", 16)
      .as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(2L))
  }
}
