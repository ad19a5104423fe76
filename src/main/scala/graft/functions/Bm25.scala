package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.plans.TopK

/** BM25 ranked retrieval (Robertson/Spärck Jones, the Lucene-default
  * scoring) over a document corpus — the retrieval leg of a RAG pipeline,
  * which the chunking operators ([[graft.ops.Packing]]) feed.
  *
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
  *                            (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)     = ln((N − df + 0.5)/(df + 0.5) + 1)    (Lucene form)
  *
  * Scale shape (the part that must survive 100 TB):
  *  - ONE corpus exchange builds (doc, token, tf, dl) — dl is projected
  *    per doc BEFORE the explode, so no second aggregate-join on doc_id;
  *  - df is computed AFTER the broadcast restriction to query tokens:
  *    every posting of a query token survives that filter, so the count
  *    within the filtered set IS the full-corpus document frequency —
  *    and computing it as a window over the single candidate chain keeps
  *    the plan a straight line. The earlier formulation aggregated df
  *    from the tf subtree as a second consumer, and Catalyst's column
  *    pruning rewrote that consumer into a NARROWER aggregate — defeating
  *    exchange reuse and silently scanning + exploding + exchanging the
  *    corpus twice (caught by the plan pin in Bm25Spec);
  *  - the df window partitions by token, so one task handles all
  *    candidate postings of one query term — bounded by the hottest
  *    query term's df, not the corpus, and sort-based so it spills
  *    rather than OOMs;
  *  - the query table is small by nature (it is what a user asks), so
  *    the token restriction, the per-query fan-out and the corpus
  *    constants all ride broadcasts — the corpus never shuffles to meet
  *    the queries;
  *  - per-(query, doc) summation is the second exchange, sized by
  *    candidate postings (docs sharing a query term), not the corpus;
  *  - the final top-k per query runs on the native bounded-heap
  *    [[TopK.perKey]] operator, so per-query state is k rows, not a sort.
  *
  * Determinism / oracle form: idf is the one libm step, rounded to 4
  * decimals; each term's score is rounded at 8 decimals and summed as
  * DECIMAL(28,10) — order-independent — then one final round to 4. The
  * tf-normalization chain is plain IEEE arithmetic written in the same
  * textual shape the DuckDB oracle uses, so both engines evaluate the
  * identical float sequence.
  */
object Bm25 {

  /** Top-k documents per query by BM25. Output: (query_id, doc_id,
    * score), ties broken by doc_id ascending — a total order. */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, qTextCol: String, qIdCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // (doc_id, dl, token): dl = non-empty token count, attached before the
    // explode so term frequency and doc length cost ONE exchange total.
    val base = docs
      .select(col(idCol).as("doc_id"),
        filter(TextFunctions.tokens(col(textCol)), t => t =!= "").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("token"))
    val tf = base.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // Corpus constants fold to one row; avgdl = exact long sum / count,
    // one double division — engine-order-invariant.
    val stats = docs
      .select(size(filter(TextFunctions.tokens(col(textCol)),
        t => t =!= "")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // Query vocabulary (distinct terms per query). A term nobody has
    // produces no candidate postings and so scores no documents —
    // identical to summing its zero postings.
    // The cross-ROW distinct matters too: two query rows sharing an id
    // (split phrasings of one query) must contribute each term once —
    // array_distinct alone would double-count their shared terms.
    val qt = queries
      .select(col(qIdCol).as("query_id"),
        explode(array_distinct(TextFunctions.tokens(col(qTextCol))))
          .as("token"))
      .where(col("token") =!= "")
      .distinct()
    // Candidate postings: tf restricted to query tokens by broadcast —
    // the corpus side's only join work. df follows as a window count:
    // the restriction keeps EVERY posting of a surviving token, so the
    // per-token row count here equals the full-corpus df.
    val qtok = qt.select(col("token")).distinct()
    val cand = tf.join(broadcast(qtok), "token")
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("token"))))

    val idf = round(log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0)), 4)
    val tfn = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = cand.join(broadcast(qt), "token")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(idf * tfn, 8).cast(DecimalType(28, 10)).as("term_score"))
      .groupBy(col("query_id"), col("doc_id"))
      // Final round IN DECIMAL (HALF_UP scale-down cast) before the one
      // double cast — round(double, 4) of an exact 8-dp sum splits
      // engines on a 5e-5 tie (the Dsir/logprob postmortem, SCALING.md).
      .agg(sum(col("term_score")).cast(DecimalType(28, 4))
        .cast(DoubleType).as("score"))

    TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("doc_id").asc), k)
  }
}
