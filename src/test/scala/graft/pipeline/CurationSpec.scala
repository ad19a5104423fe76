package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Docs long enough to clear the token gate, with stopwords for the
  // ratio gate. 1↔2 exact dup (whitespace/case), 3≈4 near dup (one token
  // changed in 12), 5 low quality (3 tokens), 6 contaminated (equals a
  // bench doc), 7 clean.
  private val base =
    "the quick brown fox jumps over the lazy dog near the river"
  private val base2 =
    "all happy families are alike but every unhappy family is unhappy in its own way it said"
  private val docs = Seq(
    (1L, base),
    (2L, "The  Quick  Brown fox jumps over the lazy dog near the river"),
    (3L, base2),
    (4L, base2 + " twice"),
    (5L, "tiny doc here"),
    (6L, "this exact passage appears inside the held out benchmark suite"),
    (7L, "a completely different story about the sea and all the ships sailing on it"),
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "this exact passage appears inside the held out benchmark suite"))
    .toDF("doc_id", "text")

  private lazy val curated =
    Curation.curate(docs, bench,
      quality = Curation.QualityThresholds(minTokens = 5)).cache()

  private def ids(pred: org.apache.spark.sql.Column): Set[Long] =
    curated.filter(pred).select("doc_id").as[Long].collect().toSet

  test("each stage tags the right documents") {
    assert(ids(!$"passed_quality") == Set(5L))
    assert(ids($"is_exact_dup") == Set(2L)) // min-id 1 survives
    assert(ids($"is_near_dup") == Set(4L)) // canonical 3 survives
    assert(ids($"is_contaminated") == Set(6L))
  }

  test("split is leakage-repaired: near-dup pairs share a split, moved rows are flagged") {
    val byId = curated.select("doc_id", "split", "split_moved")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> r).toMap
    // the 3≈4 near-dup cluster must land whole in one split
    assert(byId(3L)._2 == byId(4L)._2, "near-dup cluster straddles splits")
    // canonical keeps its own split; only non-canonical members can move
    val rawSplit = docs.select($"doc_id",
      graft.ops.Sampling.splitColumn($"doc_id", "curation-v1",
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)).as("s"))
      .as[(Long, String)].collect().toMap
    assert(!byId(3L)._3 && byId(3L)._2 == rawSplit(3L))
    byId.values.foreach { case (id, s, moved) =>
      assert(moved == (s != rawSplit(id)), s"split_moved wrong for $id")
    }
    // unclustered docs keep their raw hash split untouched
    Seq(5L, 6L, 7L).foreach(i => assert(byId(i)._2 == rawSplit(i)))
  }

  test("kept applies the conjunction; split is assigned to every row") {
    assert(Curation.kept(curated).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 7L))
    val splits = curated.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(curated.filter($"split".isNull).count() == 0)
  }

  test("split assignment is a pure function of (id, salt): rerun-stable") {
    val again = Curation.curate(docs, bench,
      quality = Curation.QualityThresholds(minTokens = 5))
      .select($"doc_id", $"split".as("split2"))
    val joined = curated.join(again, "doc_id")
    assert(joined.filter($"split" =!= $"split2").count() == 0)
  }

  test("auditCounts reconciles: drops + kept cover the corpus") {
    val row = Curation.auditCounts(curated).head()
    assert(row.getAs[Long]("n_docs") == 7L)
    assert(row.getAs[Long]("n_low_quality") == 1L)
    assert(row.getAs[Long]("n_exact_dup") == 1L)
    assert(row.getAs[Long]("n_near_dup") == 1L)
    assert(row.getAs[Long]("n_contaminated") == 1L)
    assert(row.getAs[Long]("n_kept") == 3L)
  }

  test("curateV2 adds the r8 gates and repairs; keptV2/auditCountsV2 reconcile") {
    val spam = (8L,
      Seq.fill(30)("click here now").mkString(" "), "en")
    // 9 repeats doc 7's full text (>= one 10-token span) plus unique
    // words: the non-first span occurrences are CUT, the remainder kept.
    val copier = (9L,
      "a completely different story about the sea and all the ships " +
        "sailing on it plus some fresh words", "en")
    val v2docs = docs.withColumn("lang", lit("en"))
      .unionByName(Seq(spam, copier).toDF("doc_id", "text", "lang"))
    val v2 = Curation.curateV2(v2docs, bench,
      quality = Curation.QualityThresholds(minTokens = 5)).cache()
    try {
      val byId = v2.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId.size == 9)
      // The spam doc trips the repetition gate; ordinary prose passes.
      assert(!byId(8L).getAs[Boolean]("passed_repetition"))
      assert(byId(7L).getAs[Boolean]("passed_repetition"))
      // Doc 9 loses its copied span tokens; the FIRST occurrence (7)
      // keeps everything.
      assert(byId(9L).getAs[Long]("n_span_tokens_removed") >= 10L)
      assert(byId(7L).getAs[Long]("n_span_tokens_removed") == 0L)
      // Single-language corpus + self-trained model: predictions agree
      // with the uniform label, so the langid gate drops nothing here.
      assert(v2.filter(!$"lang_agrees").count() == 0)
      // keptV2 is exactly kept ∧ repetition ∧ langid.
      val keptIds = Curation.keptV2(v2).select($"doc_id").as[Long]
        .collect().toSet
      val expected = v2.filter($"passed_quality" && !$"is_exact_dup" &&
        !$"is_near_dup" && !$"is_contaminated" &&
        $"passed_repetition" && $"lang_agrees")
        .select($"doc_id").as[Long].collect().toSet
      assert(keptIds == expected)
      // The audit row reconciles against direct counts.
      val row = Curation.auditCountsV2(v2).head()
      assert(row.getAs[Long]("n_docs") == 9L)
      assert(row.getAs[Long]("n_repetitive") ==
        v2.filter(!$"passed_repetition").count())
      assert(row.getAs[Long]("n_span_repaired") ==
        v2.filter($"n_span_tokens_removed" > 0).count())
      assert(row.getAs[Long]("n_kept") == keptIds.size)
    } finally v2.unpersist()
  }
}
