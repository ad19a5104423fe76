package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("train learns the hand-computable merge sequence") {
    // Corpus: "low" x3, "lower" x2, "lowest" x1 (the Sennrich example
    // shape). Pair counts round 1: (l,o)=6, (o,w)=6, (w,e)=3, (e,r)=2,
    // (e,s)=1, (s,t)=1 → tie (l,o)/(o,w) breaks lexicographically to
    // (l,o). Round 2: ("lo",w)=6 wins. Round 3: ("low",e)=3. Round 4:
    // (e,r)=2. Then every remaining pair has count 1 < minCount → stop.
    val docs = Seq("low low low lower lower lowest").toDF("text")
    val merges = Bpe.train(docs, "text", 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "l", "o", "lo", 6L),
      (2, "lo", "w", "low", 6L),
      (3, "low", "e", "lowe", 3L),
      (4, "lowe", "r", "lower", 2L)))
  }

  test("mergePair is greedy left-to-right and non-overlapping") {
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"))
      .toDF("syms")
      .select(Bpe.mergePair($"syms", "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("aa", "a"), Seq("aa", "aa")))
  }

  test("mergePair never re-matches the symbol it just created") {
    // merge (a, ab): "a ab ab" -> first pair merges to "aab"; the new
    // "aab" must NOT merge with the following "ab" again as left="a".
    val out = Seq(Seq("a", "ab", "ab")).toDF("syms")
      .select(Bpe.mergePair($"syms", "a", "ab").as("m"))
      .as[Seq[String]].collect().head
    assert(out == Seq("aab", "ab"))
  }

  test("training is invariant to document partitioning (pure function of the corpus)") {
    val text = "pack packer packing unpack pack packer"
    val one = Seq(text).toDF("text")
    val many = text.split(" ").toSeq.toDF("text").repartition(4)
    val a = Bpe.train(one, "text", 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val b = Bpe.train(many, "text", 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("encodeWord with the trained table reproduces training segmentation") {
    val docs = Seq("low low low lower lower lowest").toDF("text")
    val merges = Bpe.train(docs, "text", 10)
      .orderBy($"rank")
      .select($"left", $"right").as[(String, String)].collect().toSeq
    assert(Bpe.encodeWord("low", merges) == Seq("low"))
    assert(Bpe.encodeWord("lower", merges) == Seq("lower"))
    assert(Bpe.encodeWord("lowest", merges) == Seq("lowe", "s", "t"))
    // out-of-vocabulary word: only applicable merges fire
    assert(Bpe.encodeWord("slow", merges) == Seq("s", "low"))
  }

  test("segment column equals the encodeWord reference on fixture corpus words") {
    val docs = graft.model.Tables.documents(spark, sf)
    val merges = Bpe.train(docs, "text", 20)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    val words = docs
      .select(explode(TextFunctions.tokens($"text")).as("w"))
      .where($"w" =!= "").distinct()
    val got = words.select($"w", Bpe.segment($"w", merges).as("segs"))
      .as[(String, Seq[String])].collect()
    assert(got.nonEmpty)
    val bad = got.filter { case (w, segs) =>
      segs != Bpe.encodeWord(w, merges) || segs.mkString != w
    }
    assert(bad.isEmpty, s"segment != encodeWord for ${bad.take(3).toSeq}")
  }

  test("empty and single-char corpora learn nothing (no crash, no junk merge)") {
    assert(Bpe.train(Seq("a b c a b").toDF("text"), "text", 5).count() == 0)
    assert(Bpe.train(Seq("").toDF("text"), "text", 5).count() == 0)
  }
}
