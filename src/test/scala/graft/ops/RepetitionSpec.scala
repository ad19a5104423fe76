package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RepetitionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)]) =
    Repetition.repetitionStats(rows.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("boilerplate spam trips the rules; varied prose passes") {
    val spam = (1L, Seq.fill(30)("click here now").mkString(" "))
    val prose = (2L, "the quick brown fox jumps over a lazy dog while " +
      "seven wizards brew strange potions beneath an ancient oak tree")
    val out = stats(Seq(spam, prose))
    assert(!out(1L)._8, "repeated boilerplate must be dropped")
    assert(out(1L)._2.get > 0.20, "top bigram coverage must be high for spam")
    assert(out(1L)._3.get > 0.29)
    assert(out(2L)._8, "varied prose must keep")
  }

  test("duplicate chunks (line proxy) are caught independently of n-grams") {
    // 10-token chunk repeated 4 times, but each chunk internally varied
    // enough that bigram concentration stays moderate.
    val chunk = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val dupLines = (1L, Seq.fill(4)(chunk).mkString(" "))
    val out = stats(Seq(dupLines))
    assert(out(1L)._4.get == 1.0, "all chunks are duplicates")
    assert(!out(1L)._7, "r_dup_chunk must fire")
  }

  test("documents too short to form a unit keep by default (null, not false)") {
    val out = stats(Seq((1L, "one"), (2L, "two words")))
    assert(out(1L)._2.isEmpty, "single token has no bigram")
    assert(out(1L)._8, "no evidence keeps the doc")
    // A 2-word doc's single bigram is trivially "the most frequent"
    // (frac 1.0) — the rule fires. Deliberate: Gopher composes the
    // repetition rules AFTER a minimum-length gate (docs_gopher_rules'
    // r_word_count), so degenerate-short docs never reach this filter
    // alone; standalone, a maximally-concentrated doc IS the signal.
    assert(out(2L)._2.contains(1.0) && out(2L)._3.isEmpty)
    assert(!out(2L)._8)
  }

  test("null-text docs keep a row: null fractions, keep=true (total policy)") {
    val out = stats(Seq((1L, null), (2L, "two words")))
    assert(out.contains(1L), "null-text doc must not vanish from the output")
    assert(out(1L)._2.isEmpty && out(1L)._3.isEmpty && out(1L)._4.isEmpty)
    assert(out(1L)._5 && out(1L)._6 && out(1L)._7 && out(1L)._8,
      "no evidence is not evidence of spam — an inner-join caller sees keep=true")
  }

  test("fractions are exact integer ratios and bounded in (0, 1]") {
    val docs = graft.model.Tables.documents(spark, sf)
    val out = Repetition.repetitionStats(docs, "text", "doc_id")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Boolean, Boolean, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq(r._2, r._3, r._4).flatten.foreach(f =>
        assert(f > 0.0 - 1e-12 && f <= 1.0))
      assert(r._2.forall(_ > 0.0), "a most-frequent bigram has count >= 1")
    }
  }

  test("single exploded exchange: no self-join, no per-row quadratic HOF") {
    val docs = graft.model.Tables.documents(spark, sf)
    val plan = Repetition.repetitionStats(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }
}
