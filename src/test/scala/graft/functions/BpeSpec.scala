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

  test("driver tier and distributed tier train the identical merge table") {
    val docs = graft.model.Tables.documents(spark, sf)
    val local = Bpe.train(docs, "text", 20) // default limit → driver tier
      .as[(Int, String, String, String, Long)].collect().toSeq
    val dist = Bpe.train(docs, "text", 20, localTypeLimit = 0L) // force distributed
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(local.nonEmpty)
    assert(local == dist)
  }

  test("cpCompare is UTF-8 binary order where UTF-16 compareTo is not") {
    // U+FFFD (BMP, sorts HIGH in UTF-16) vs U+10400 (supplementary,
    // encoded as a surrogate pair that sorts LOW in UTF-16 but is the
    // larger code point). Spark's orderBy uses UTF-8 binary order.
    val bmp = "�"
    val supp = new String(Character.toChars(0x10400))
    assert(bmp.compareTo(supp) > 0) // UTF-16 order: the wrong answer
    assert(Bpe.cpCompare(bmp, supp) < 0) // code-point order
    assert(Bpe.cpCompare("ab", "abc") < 0 && Bpe.cpCompare("b", "a") > 0)
  }

  test("1,000+ merge vocabulary trains and applies without plan blowup") {
    // 200 distinct 12-char words, each twice → >2,000 learnable merges
    // with count ≥ 2. Training must stay driver-tier fast; segmentation
    // must auto-switch to the broadcast encoder (plan size O(1) in k).
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val rng = new scala.util.Random(42)
    val words = (0 until 600).map { _ =>
      (0 until 16).map(_ => alpha(rng.nextInt(26))).mkString
    }.distinct
    val docs = Seq((words ++ words).mkString(" ")).toDF("text")
    // minCount = 1: the corpus shares many pairs across words, so the
    // ≥2-count frontier saturates near 300 merges — count-1 merges are
    // exactly what a real 30k vocabulary's long tail is made of.
    val trained = Bpe.train(docs, "text", 1200, minCount = 1L)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    assert(trained.size >= 1000, s"only ${trained.size} merges learned")
    val seg = Seq(words.head, words(57), "zzqqzzqq").toDF("w")
      .select($"w", Bpe.segment($"w", trained).as("segs"))
      .as[(String, Seq[String])].collect()
    seg.foreach { case (w, segs) =>
      assert(segs == Bpe.encodeWord(w, trained))
      assert(segs.mkString == w)
    }
    // Every training word collapses to one learned token (merge table
    // saturates the corpus it was trained on).
    assert(Bpe.encodeWord(words.head, trained).size == 1)
  }

  test("segmentChained and segmentEncoded agree on a trained table") {
    val docs = graft.model.Tables.documents(spark, sf)
    val merges = Bpe.train(docs, "text", 20)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    val words = docs
      .select(explode(TextFunctions.tokens($"text")).as("w"))
      .where($"w" =!= "").distinct()
    val both = words.select($"w",
      Bpe.segmentChained($"w", merges).as("c"),
      Bpe.segmentEncoded($"w", merges).as("e"))
      .as[(String, Seq[String], Seq[String])].collect()
    assert(both.nonEmpty)
    val bad = both.filter { case (_, c, e) => c != e }
    assert(bad.isEmpty, s"chained != encoded for ${bad.take(3).toSeq}")
    // The apply leg is a NATIVE expression since r9 (the repo's last
    // UDF retired): the plan must show bpe_encode and no ScalaUDF node.
    val plan = words.select(Bpe.segmentEncoded($"w", merges))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_encode"), plan)
    assert(!plan.contains("UDF"), plan)
    // The degenerate inputs agree too — the size-based dispatch in
    // segment() can never flip a result when a vocabulary grows past
    // HofMergeLimit: empty word → empty array, null → null, both forms.
    val edge = Seq(Some(""), None).toDF("w")
      .select(Bpe.segmentChained($"w", merges).as("c"),
        Bpe.segmentEncoded($"w", merges).as("e"))
      .as[(Option[Seq[String]], Option[Seq[String]])].collect().toSeq
    assert(edge == Seq((Some(Seq.empty[String]), Some(Seq.empty[String])),
      (None, None)))
  }

  test("batched distributed tier equals driver tier on a batch-friendly corpus") {
    // Many mutually-disjoint frequent pairs with distinct counts — the
    // shape where safePrefix actually batches (multiple merges per job
    // set) instead of degrading to one sequential step per iteration.
    val text = (('a' to 'z').grouped(2).zipWithIndex.flatMap {
      case (Seq(x, y), i) => Seq.fill(26 - i)(s"$x$y")
    }).mkString(" ")
    val docs = Seq(text, text).toDF("text")
    def table(lim: Long) =
      Bpe.train(docs, "text", 10, minCount = 1L, localTypeLimit = lim)
        .as[(Int, String, String, String, Long)].collect().toSeq
    val driver = table(1000000L)
    assert(driver.size == 10)
    assert(table(0L) == driver, "batched tier must equal the driver tier")
  }

  test("safePrefix accepts disjoint counts above the horizon, trims ties, never stalls") {
    // Third candidate shares 'b' -> rejected, horizon 8; both accepted
    // counts are strictly above it -> batch of 2.
    assert(Bpe.safePrefix(
      Array(("a", "b", 10L), ("c", "d", 9L), ("b", "c", 8L)), 65) ==
      Seq(("a", "b", 10L), ("c", "d", 9L)))
    // Accepted tie WITH the horizon is unsafe (the rejected pair could
    // win the sequential tie-break after counts shift) -> trimmed.
    assert(Bpe.safePrefix(
      Array(("a", "b", 10L), ("c", "d", 8L), ("b", "c", 8L)), 65) ==
      Seq(("a", "b", 10L)))
    // Trim-to-empty falls back to the single top candidate (one plain
    // sequential step) so the loop can never stall.
    assert(Bpe.safePrefix(
      Array(("a", "b", 10L), ("b", "c", 10L)), 65) == Seq(("a", "b", 10L)))
    // A merged symbol colliding with a later candidate's operand is a
    // rejection too ("xy" created, then ("xy","z") must wait).
    assert(Bpe.safePrefix(
      Array(("x", "y", 10L), ("xy", "z", 9L)), 65) == Seq(("x", "y", 10L)))
    // Full fetch window with no rejection: horizon is the window
    // boundary — everything strictly above it survives.
    assert(Bpe.safePrefix(
      Array(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 9L)), 3) ==
      Seq(("a", "b", 10L)))
  }
}
