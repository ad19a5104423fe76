package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TfIdfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
  ).toDF("doc_id", "text")

  test("termFreq counts repeats, docFreq counts distinct docs") {
    val tf = TfIdf.termFreq(corpus, "text", "doc_id")
      .as[(Long, String, Long)].collect().toSet
    assert(tf.contains((1L, "apple", 2L)) && tf.contains((3L, "cherry", 3L)))
    val df = TfIdf.docFreq(corpus, "text", "doc_id")
      .as[(String, Long)].collect().toMap
    assert(df == Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 2L, "durian" -> 1L))
  }

  test("topTerms ranks rare-but-frequent terms above common ones") {
    val top1 = TfIdf.topTerms(corpus, "text", "doc_id", 1)
      .select($"doc_id".as[Long], $"token".as[String]).collect().toMap
    // doc 1: apple (tf=2, df=1) beats banana (tf=1, df=2)
    assert(top1(1L) == "apple")
    // doc 3: cherry tf=3·ln(1.5) ≈ 1.22 beats durian 1·ln(3) ≈ 1.10
    assert(top1(3L) == "cherry")
    // a term present in EVERY doc scores zero
    val all = Seq((1L, "x a"), (2L, "x b"), (3L, "x c")).toDF("doc_id", "text")
    val scores = TfIdf.topTerms(all, "text", "doc_id", 2)
      .filter($"token" === "x").select($"score".as[Double]).collect()
    assert(scores.forall(_ == 0.0))
  }

  test("topTerms keeps at most k rows per doc with a total tiebreak") {
    val got = TfIdf.topTerms(corpus, "text", "doc_id", 2)
      .groupBy($"doc_id").count().select($"count".as[Long]).collect()
    assert(got.forall(_ <= 2L))
  }
}
