package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UnigramLmSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def seg(words: Seq[String], vocab: Map[String, Double], p: Int = 4) =
    UnigramLm.segmentTypes(Seq(words.mkString(" ")).toDF("text"), "text",
      vocab, p)
      .as[(String, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  test("train: single-char coverage, frequency-ranked multis, exact logp") {
    // corpus: "ab ab b" -> types ab(x2), b(x1)
    val got = UnigramLm.train(Seq("ab ab", "b").toDF("text"), "text",
      vocabSize = 3, maxPieceLen = 2)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // substrings weighted by type count: a=2, b=2+1=3, ab=2; singles a,b
    // always kept; one multi slot left -> ab. total = 2+3+2 = 7
    def lp(c: Long) = BigDecimal(math.log(c.toDouble / 7.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(r => (r._1, r._2)) === Seq(("a", 2L), ("ab", 2L), ("b", 3L)))
    got.foreach { case (_, c, logp) => assert(math.abs(logp - lp(c)) < 2e-8) }
  }

  test("viterbi picks the max-likelihood split; ties favor the longer piece") {
    // "ab" as one piece (-1.5) beats a+b (-4)
    val v1 = Map("a" -> -2.0, "b" -> -2.0, "ab" -> -1.5)
    assert(seg(Seq("ab"), v1)("ab") === (("ab", 1L)))
    // exact tie: a+b = -2 equals ab = -2 -> longest last piece wins
    val v2 = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(seg(Seq("ab"), v2)("ab") === (("ab", 1L)))
    // multi-piece optimum with a maxPieceLen window
    val v3 = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0, "ba" -> -1.0)
    assert(seg(Seq("abab"), v3)("abab") === (("ab ab", 2L)))
  }

  test("long words pass through whole; unknown chars fall back to singles") {
    val v = Map("a" -> -1.0)
    val long = "a" * (UnigramLm.MaxWordLen + 1)
    val got = seg(Seq(long, "axa"), v)
    assert(got(long) === ((long, 1L)))
    // 'x' is out-of-vocabulary: the -1e9 fallback yields single chars
    assert(got("axa") === (("a x a", 3L)))
  }

  test("end-to-end: train then segment; every split reassembles its word") {
    val docs = Seq("alpha beta alphabet beta", "beta gamma alpha").toDF("text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 32, maxPieceLen = 4)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val got = UnigramLm.segmentTypes(docs, "text", vocab, 4)
      .as[(String, Long, String, Long)].collect()
    assert(got.map(_._1).sorted === Array("alpha", "alphabet", "beta", "gamma"))
    got.foreach { case (word, _, pieces, nP) =>
      assert(pieces.split(" ").mkString("") === word,
        s"'$pieces' must reassemble '$word'")
      assert(pieces.split(" ").length.toLong === nP)
      assert(pieces.split(" ").forall(_.length <= 4))
    }
    // partitioning invariance: the segmentation is per-type arithmetic
    val re = UnigramLm.segmentTypes(docs.repartition(5), "text", vocab, 4)
      .as[(String, Long, String, Long)].collect().sortBy(_._1)
    assert(re === got.sortBy(_._1))
  }

  test("hard-EM round: likelihood never decreases, counts are Viterbi counts") {
    val docs = graft.model.Tables.documents(spark, sf)
    def vmap(df: org.apache.spark.sql.DataFrame) =
      df.select($"piece", $"logp").as[(String, Double)].collect().toMap
    val seed = vmap(UnigramLm.train(docs, "text", 64, 4))
    val refinedDf = UnigramLm.emRefine(docs, "text", seed, 4)
    val refined = vmap(refinedDf)
    // The refined vocabulary only keeps pieces the E-step used, and
    // every piece came from a segmentation under the seed vocabulary.
    assert(refined.nonEmpty && refined.keySet.subsetOf(seed.keySet))
    // Corpus Viterbi log-likelihood (types <= MaxWordLen, weighted by
    // frequency): monotone under the EM round — the M-step maximizes
    // the held segmentation's likelihood, re-segmentation only improves.
    def ll(vocab: Map[String, Double]) =
      UnigramLm.segmentTypes(docs, "text", vocab, 4)
        .filter(length($"word") <= UnigramLm.MaxWordLen)
        .as[(String, Long, String, Long)].collect()
        .map { case (_, cnt, pieces, _) =>
          cnt * pieces.split(" ").map(vocab).sum
        }.sum
    val (l0, l1) = (ll(seed), ll(refined))
    assert(l1 >= l0 - 1e-6, s"EM decreased likelihood: $l0 -> $l1")
    // E-step counts: exactly the frequency-weighted piece occurrences
    // of the seed segmentation (local reference fold).
    val segs = UnigramLm.segmentTypes(docs, "text", seed, 4)
      .filter(length($"word") <= UnigramLm.MaxWordLen)
      .as[(String, Long, String, Long)].collect()
    val expected = segs.flatMap { case (_, cnt, pieces, _) =>
      pieces.split(" ").map(_ -> cnt) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val gotCnt = refinedDf.select($"piece", $"cnt")
      .as[(String, Long)].collect().toMap
    assert(gotCnt === expected)
    // Chaining: a second round accepts the first round's output schema.
    val round2 = vmap(UnigramLm.emRefine(docs, "text", refined, 4))
    assert(round2.nonEmpty && round2.keySet.subsetOf(refined.keySet))
    assert(ll(round2) >= l1 - 1e-6)
  }
}
