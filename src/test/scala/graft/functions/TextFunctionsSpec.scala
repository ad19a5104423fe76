package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("shingles are order-sensitive distinct n-grams") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
  }

  test("shingles of short docs are empty, not an error") {
    val got = Seq("a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(got.isEmpty)
  }

  test("fingerprint normalizes case and internal whitespace") {
    val fps = Seq("Hello  World", "hello world ").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("wordHits counts occurrences, not distinct matches") {
    val got = Seq("the cat the dog the end").toDF("t")
      .select(TextFunctions.wordHits($"t", Seq("the"))).as[Int].head()
    assert(got == 3)
  }

  test("bpeTokenCount counts contractions and punctuation as extra tokens") {
    val got = Seq("it's fine, really 42").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t")).as[Int].head()
    // it|'s| fine|,| really| 42
    assert(got == 6)
  }

  test("rollingHash is order-sensitive where fingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val (hx, hy) = df.select(
      TextFunctions.rollingHash(TextFunctions.tokens($"x")),
      TextFunctions.rollingHash(TextFunctions.tokens($"y")))
      .as[(Long, Long)].head()
    assert(hx != hy)
    val same = Seq(("a b c", "a b c")).toDF("x", "y").select(
      TextFunctions.rollingHash(TextFunctions.tokens($"x")),
      TextFunctions.rollingHash(TextFunctions.tokens($"y")))
      .as[(Long, Long)].head()
    assert(same._1 == same._2)
  }

  test("langId picks the language with the most marker hits") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("der hund und die katze sind nicht da", "de"),
      ("el perro y la casa es que una maravilla por fin", "es"),
      ("le chien est dans la maison pour une heure", "fr"),
      ("我 是 一个 人 的 朋友 在 北京", "zh"),
      ("xyzzy plugh quux", "und"),
    ).toDF("t", "expected")
    val got = samples.select($"expected", TextFunctions.langId($"t").as("got"))
      .as[(String, String)].collect()
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("urls extracts whitespace-delimited URLs; urlHost takes the authority") {
    val t = "pre https://a.b.example.com/x?q=1 mid http://news.org/p#f end ftp://skip.me"
    val got = Seq(t).toDF("t")
      .select(explode(TextFunctions.urls($"t")).as("u"))
      .select($"u", TextFunctions.urlHost($"u").as("h"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("https://a.b.example.com/x?q=1", "a.b.example.com"),
      ("http://news.org/p#f", "news.org")))
  }

  test("urlHost stops at port, path, query, or fragment") {
    val cases = Seq(
      "https://h.example.com:8443/p" -> "h.example.com",
      "http://bare.example.org" -> "bare.example.org",
      "https://q.example.net?x=1" -> "q.example.net")
    val got = cases.map(_._1).toDF("u")
      .select($"u", TextFunctions.urlHost($"u").as("h"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, h) => assert(got(u) == h) }
  }
}
