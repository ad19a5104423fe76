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
  *  - the query table is small by nature (it is what a user asks), so
  *    query terms + their df + the corpus constants ride ONE broadcast,
  *    and the corpus side never shuffles for the term join;
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

    // Query vocabulary (distinct terms per query) + df restricted to it.
    // df rows for absent terms vanish (inner join): a term nobody has
    // scores no documents, identical to summing its zero postings.
    // The cross-ROW distinct matters too: two query rows sharing an id
    // (split phrasings of one query) must contribute each term once —
    // array_distinct alone would double-count their shared terms.
    val qt = queries
      .select(col(qIdCol).as("query_id"),
        explode(array_distinct(TextFunctions.tokens(col(qTextCol))))
          .as("token"))
      .where(col("token") =!= "")
      .distinct()
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val qterms = qt.join(df, "token").crossJoin(broadcast(stats))

    val idf = round(log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0)), 4)
    val tfn = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf.join(broadcast(qterms), "token")
      .select(col("query_id"), col("doc_id"),
        round(idf * tfn, 8).cast(DecimalType(28, 10)).as("term_score"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("term_score")).cast(DoubleType), 4).as("score"))

    TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("doc_id").asc), k)
  }
}
