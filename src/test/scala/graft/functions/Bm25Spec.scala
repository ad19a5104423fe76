package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.functions._

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "bm25 ranks documents for a query"),
      (3L, "the query terms drive bm25 bm25 bm25"),
      (4L, "an unrelated document about cats and dogs"),
      (5L, "cats chase dogs chase cats")
    ).toDF("doc_id", "text")
  }

  test("docs containing the query terms outrank docs without them") {
    import spark.implicits._
    val q = Seq((100L, "bm25 query")).toDF("qid", "qtext")
    val got = Bm25.topK(fixture, "text", "doc_id", q, "qtext", "qid", k = 10)
      .orderBy($"score".desc, $"doc_id")
      .select($"doc_id").as[Long].collect().toSeq
    // Only docs 2 and 3 contain any query term; doc 4/5 score nothing and
    // doc 1 shares only stop-ish words absent from the query.
    assert(got.toSet == Set(2L, 3L))
  }

  test("term saturation: repeating a term beats one occurrence but sub-linearly") {
    import spark.implicits._
    val q = Seq((1L, "bm25")).toDF("qid", "qtext")
    val rows = Bm25.topK(fixture, "text", "doc_id", q, "qtext", "qid", k = 10)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    assert(rows.keySet == Set(2L, 3L))
    assert(rows(3L) > rows(2L), "3x tf must outscore 1x tf")
    assert(rows(3L) < 3 * rows(2L), "but sub-linearly (saturation)")
  }

  test("k bounds results per query; several queries stay independent") {
    import spark.implicits._
    val q = Seq((1L, "cats dogs"), (2L, "bm25 query spark")).toDF("qid", "qtext")
    val got = Bm25.topK(fixture, "text", "doc_id", q, "qtext", "qid", k = 1)
    val byQ = got.select($"query_id", $"doc_id").as[(Long, Long)]
      .collect().toMap
    assert(byQ.keySet == Set(1L, 2L))
    // query 1: doc 5 has cats x2 + dogs x1 vs doc 4's 1+1, and is shorter.
    assert(byQ(1L) == 5L)
  }

  test("null and empty texts score nothing and crash nothing") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val q = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("qid", "qtext")
    val got = Bm25.topK(docs, "text", "doc_id", q, "qtext", "qid", k = 5)
    assert(got.select($"query_id", $"doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L)))
  }

  test("split query rows sharing an id contribute each shared term once") {
    import spark.implicits._
    val whole = Seq((1L, "bm25 query")).toDF("qid", "qtext")
    val split = Seq((1L, "bm25 query"), (1L, "bm25")).toDF("qid", "qtext")
    val score = (q: org.apache.spark.sql.DataFrame) =>
      Bm25.topK(fixture, "text", "doc_id", q, "qtext", "qid", k = 10)
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    // The duplicated phrasing adds no new terms, so scores must not move
    // (an instance-level term join would double-count "bm25").
    assert(score(split) == score(whole))
  }

  test("the corpus is exploded and exchanged exactly once (plan pin)") {
    import spark.implicits._
    // The single-corpus-pass property is load-bearing at scale and easy
    // to lose: an earlier formulation aggregated df from the tf subtree
    // as a SECOND consumer, and Catalyst's column pruning rewrote that
    // consumer into a narrower aggregate — no exchange reuse, corpus
    // scanned + exploded + exchanged twice. Pin the shape on the final
    // adaptive plan (AQE finalizes only during execution).
    val q = Seq((1L, "bm25 query")).toDF("qid", "qtext")
    val df = Bm25.topK(fixture, "text", "doc_id", q, "qtext", "qid", k = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.linesIterator.next())
    val finalPlan = p.split("== Initial Plan ==").head
    // The tf exchange partitions on (doc_id, token); every other
    // exchange keys on query_id/token (candidate-scale) or is the
    // single-row stats aggregate. Exactly one corpus-keyed exchange.
    val tfExchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id"))
    assert(tfExchanges == 1, s"corpus exchange built $tfExchanges times:\n$finalPlan")
    // Exactly one CORPUS tokenization (explode of the doc token array,
    // named `toks` in topK) — a second one means df split the chain. The
    // query text explodes separately (and may appear twice: the token
    // restriction and the per-query fan-out both consume qt), but that
    // side is small by nature and exempt from the single-pass property.
    val corpusExplodes = finalPlan.linesIterator.count(l =>
      l.contains("Generate explode(toks"))
    assert(corpusExplodes == 1,
      s"expected 1 corpus explode, got $corpusExplodes:\n$finalPlan")
  }

  test("the plan broadcasts the query side and runs the native TopK") {
    import spark.implicits._
    val q = Seq((1L, "bm25 query")).toDF("qid", "qtext")
    val plan = Bm25.topK(fixture, "text", "doc_id", q, "qtext", "qid", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    assert(plan.contains("TopKPerKey"), s"must use the native operator:\n$plan")
  }
}
