package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** TF-IDF corpus statistics (SURVEY §2.7 text-analysis widening): term
  * frequency per document, document frequency per term, and the per-doc
  * top-k terms by tf·idf — the classic keyword/salience signal for
  * pretraining-corpus profiling.
  *
  * Scale shape: tf is one partial-aggregable groupBy on (doc, token);
  * df one on token (vocabulary-sized); the corpus size folds to a single
  * broadcast row; top-k rides the native [[TopK]] bounded heaps, so the
  * only per-doc state is k rows. idf = ln(N/df) is the one libm step —
  * rounded to 4 decimals on both engines (the proven oracle-safe form).
  */
object TfIdf {

  /** (doc_id, token, tf) — repeats counted, empty tokens dropped. */
  def termFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** (token, df) — number of distinct documents containing the token. */
  def docFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** Top-k terms per document by score = tf · round4(ln(N/df)), ties
    * broken by token — a total order, so results are deterministic.
    * Output: (doc_id, token, tf, score). */
  def topTerms(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    val tf = termFreq(docs, textCol, idCol)
    // df derives from tf — one row per (doc, token) exists there already,
    // so counting rows per token IS the document frequency. Running
    // docFreq instead would tokenize and shuffle the whole corpus a
    // second time; here the second pass aggregates the (already tiny)
    // tf aggregate, and the tf exchange is reused across both branches.
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") *
          round(log(col("n_docs").cast("double") / col("df")), 4), 4))
      .select(col("doc_id"), col("token"), col("tf"), col("score"))
    TopK.perKey(scored, Seq(col("doc_id")),
      Seq(col("score").desc, col("token").asc), k)
  }
}
