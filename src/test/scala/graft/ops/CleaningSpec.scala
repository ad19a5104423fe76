package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CleaningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def c4(docs: Seq[(Long, String)]) =
    Cleaning.lineClean(docs.toDF("doc_id", "text"), "text", "doc_id",
        t => split(t, "\n"))
      .orderBy($"id")
      .as[(Long, Long, Long, Boolean, Option[String], Option[String])]
      .collect()

  test("C4 preset: terminal punctuation, min words, javascript lines") {
    val out = c4(Seq((1L,
      "This sentence survives the filter.\n" + // kept
        "no terminal punctuation here\n" + // cut: no . ! ? "
        "Too short.\n" + // cut: 2 words < 3
        "Please enable JavaScript to view.\n" + // cut: blockword
        "Does a question mark count?\n" + // kept
        "He said \"indeed.\"\n" + // kept: closing quote
        "And one more proper sentence to finish!"))) // kept
    val (_, n, k, keep, reason, clean) = out.head
    assert(n == 7 && k == 4 && keep && reason.isEmpty)
    assert(clean.contains(
      "This sentence survives the filter.\n" +
        "Does a question mark count?\n" +
        "He said \"indeed.\"\n" +
        "And one more proper sentence to finish!"))
  }

  test("C4 preset: page rules beat line survival, first reason wins") {
    val good = "One full sentence that clearly passes every line rule.\n" +
      "Another full sentence that clearly passes every line rule.\n" +
      "A third full sentence that clearly passes every line rule."
    val out = c4(Seq(
      (1L, good), // kept
      (2L, good + "\nAlso some Lorem Ipsum filler text."), // page blocklist
      (3L, good + "\nfunction f() { return 1; }"), // brace page
      (4L, "Only two surviving sentences is not enough here.\n" +
        "Second surviving sentence, still one short of the cut."),
      (5L, null.asInstanceOf[String])))
    assert(out.map(r => (r._1, r._4, r._5)).toSeq == Seq(
      (1L, true, None),
      (2L, false, Some("page_blocklist")),
      (3L, false, Some("brace")),
      (4L, false, Some("too_few_lines")),
      (5L, false, Some("no_text"))))
    // dropped pages carry counts but no cleaned text
    assert(out.filter(!_._4).forall(_._6.isEmpty))
    assert(out.find(_._1 == 4L).get._3 == 2L)
    assert(out.find(_._1 == 5L).get._2 == 0L)
  }

  test("re-parameterized rules on token chunks (the fixture shape)") {
    // No punctuation in the corpus: terminalPunct=None, lines are
    // 4-token chunks, blockword 'dup', short tail chunks cut by
    // minWords, pages need 2 surviving chunks.
    val rules = Cleaning.LineRules(minWords = 3, terminalPunct = None,
      lineBlockWords = Seq("dup"), minLinesKept = 2)
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      (2L, "alpha bravo dup delta echo foxtrot golf hotel"),
      (3L, "alpha bravo charlie delta echo")) // tail chunk 'echo' cut
    val out = Cleaning.lineClean(docs.toDF("doc_id", "text"), "text",
        "doc_id", t => graft.dedup.Dedup.tokenChunks(t, 4),
        joiner = " ", rules = rules)
      .orderBy($"id")
      .as[(Long, Long, Long, Boolean, Option[String], Option[String])]
      .collect()
    // doc 1: chunks of 4/4/1 -> tail cut, 2 kept
    assert(out(0) == ((1L, 3L, 2L, true, None,
      Some("alpha bravo charlie delta echo foxtrot golf hotel"))))
    // doc 2: first chunk has 'dup' -> cut, 1 kept < 2
    assert(out(1) == ((2L, 2L, 1L, false, Some("too_few_lines"), None)))
    // doc 3: 4/1 -> tail cut, 1 kept < 2
    assert(out(2) == ((3L, 2L, 1L, false, Some("too_few_lines"), None)))
  }

  test("cleaning is idempotent on its own output") {
    val docs = Seq((1L,
      "A first proper sentence for the idempotence check.\n" +
        "drop me\n" +
        "A second proper sentence for the idempotence check.\n" +
        "A third proper sentence for the idempotence check."))
    val once = Cleaning.lineClean(docs.toDF("doc_id", "text"), "text",
        "doc_id", t => split(t, "\n"))
      .select($"id".as("doc_id"), $"text_clean".as("text"))
    val twice = Cleaning.lineClean(once, "text", "doc_id",
        t => split(t, "\n"))
      .select($"id", $"text_clean")
      .as[(Long, String)].collect()
    val first = once.as[(Long, String)].collect()
    assert(twice.toSeq == first.toSeq)
  }
}
