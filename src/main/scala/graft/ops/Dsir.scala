package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw-corpus
  * document by how target-like its HASHED N-GRAM distribution is — the
  * log likelihood ratio between bag-of-hashed-bigram unigram models of
  * the target and raw slices — then resample raw documents with
  * probability ∝ exp(weight) via the Gumbel-max trick. The published
  * method's shape exactly, made engine-replayable:
  *
  *  - hashed features: bigrams → md5-prefix buckets (B buckets), so the
  *    feature space is fixed-width whatever the vocabulary;
  *  - both bucket models are ONE aggregate each over their slice
  *    (add-1 smoothing), B rows total — the ratio table broadcasts;
  *  - per-doc weight = Σ_b count_b(doc) · ratio_b as an exact decimal
  *    sum of fixed-scale-rounded terms (order-free);
  *  - Gumbel-max resampling IS the "sample ∝ weights without
  *    replacement" primitive, and with md5-derived uniforms it is a
  *    pure function of (doc_id, salt) — the same draw on any engine,
  *    any partitioning, any run. Top-k of (weight + gumbel) ≡ weighted
  *    sampling without replacement (Efraimidis–Spirakis via Gumbel).
  *
  * Float discipline (the repo's oracle-exact recipe): every ln() output
  * is rounded at 8 immediately; products are rounded at 8 before the
  * decimal cast; the final score rounds at 6.
  *
  * Scale shape: two slice aggregates (B-row outputs), one exploded
  * bigram count per doc (the only corpus-scale exchange, keyed by
  * (id, bucket)), one broadcast join of the B-row ratio table, one
  * grouped decimal sum. The raw corpus text is exchanged never; only
  * (id, bucket, cnt) rows move.
  */
object Dsir {

  /** md5-prefix bucket of one n-gram — 28 bits folded mod `buckets`;
    * the oracle replays ('0x' || substr(md5(g),1,7))::BIGINT % B. */
  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 7), 16, 10).cast("long"), lit(buckets))

  /** (id, bucket, cnt) hashed-bigram counts per document — repeats
    * count (a frequency model, not a set model). Null/short texts yield
    * no rows. */
  def bucketCounts(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    // Deliberately NOT input-spread (r14): unlike LangModel's two-level
    // form, the guide-§2.5 repartition measured FLAT on dsir_weights
    // and 1.8× WORSE on dsir_sample in two runs (the weights pipeline
    // is consumed twice there, and the spread exchange re-executes per
    // consumer).
    docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col("id"),
        explode(TextFunctions.bigramsFromTokens(col("__t"))).as("g"))
      .groupBy(col("id"), bucketOf(col("g"), buckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The B-row log-likelihood-ratio table between two corpus slices:
    * ratio_b = round(round(ln p_target(b), 8) − round(ln p_raw(b), 8), 8)
    * with add-1 smoothing over `buckets` cells. Every bucket gets a row
    * (a spine join), so unseen buckets carry the smoothed floor. */
  def logRatioTable(target: DataFrame, raw: DataFrame, textCol: String,
      idCol: String, buckets: Int): DataFrame =
    logRatioFromCounts(bucketCounts(target, textCol, idCol, buckets),
      bucketCounts(raw, textCol, idCol, buckets), buckets)

  /** [[logRatioTable]] over precomputed (id, bucket, cnt) tables — the
    * entry point [[dsirWeights]] uses so ONE raw-corpus bucket pass
    * feeds both the raw model and the per-doc weights. */
  def logRatioFromCounts(targetCounts: DataFrame, rawCounts: DataFrame,
      buckets: Int): DataFrame = {
    def slice(df: DataFrame): DataFrame =
      df.groupBy(col("bucket")).agg(sum(col("cnt")).as("c"))
    val t = slice(targetCounts)
    val r = slice(rawCounts)
    val spark = targetCounts.sparkSession
    val spine = spark.range(0, buckets).select(col("id").as("bucket"))
    def logp(c: Column, total: Column): Column =
      round(log((c + lit(1.0)) / (total + lit(buckets.toDouble))), 8)
    val tTot = t.agg(sum(col("c")).as("t_total"))
    val rTot = r.agg(sum(col("c")).as("r_total"))
    spine
      .join(t.withColumnRenamed("c", "tc"), Seq("bucket"), "left_outer")
      .join(r.withColumnRenamed("c", "rc"), Seq("bucket"), "left_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        round(
          logp(coalesce(col("tc"), lit(0L)).cast("double"),
            col("t_total").cast("double")) -
          logp(coalesce(col("rc"), lit(0L)).cast("double"),
            col("r_total").cast("double")), 8).as("ratio"))
  }

  /** Per-document importance log-weight over the raw slice: the exact
    * decimal sum of round(cnt · ratio_b, 8) terms, rounded at 6. Docs
    * with no bigrams (null/short text) get no row — they carry no
    * evidence either way. */
  def importanceWeights(raw: DataFrame, ratios: DataFrame, textCol: String,
      idCol: String, buckets: Int): DataFrame =
    importanceFromCounts(bucketCounts(raw, textCol, idCol, buckets), ratios)

  /** [[importanceWeights]] over a precomputed raw-count table. The
    * final round to 6 happens IN DECIMAL (Spark's decimal scale-down
    * cast is HALF_UP; DuckDB mirrors with round-on-decimal) before the
    * one double cast: `round(double, 6)` of an exact 8-dp sum splits
    * engines when the sum lands exactly on a 5e-7 tie — caught live at
    * sf0.001 (one row off by exactly 1e-6, r8; the
    * Parity.exactMeanRound4 postmortem class, SCALING.md). */
  def importanceFromCounts(rawCounts: DataFrame,
      ratios: DataFrame): DataFrame =
    rawCounts
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("id"))
      .agg(
        sum(round(col("cnt") * col("ratio"), 8).cast(DecimalType(28, 10)))
          .cast(DecimalType(28, 6)).cast("double").as("logw"))

  /** The composed weights pipeline: the raw corpus is bucket-counted
    * ONCE (pinned with a localCheckpoint so the ratio aggregate and the
    * weight join cannot recompute the corpus-scale explode), both slice
    * models are checked non-degenerate — an empty/bigram-free slice
    * would otherwise null every ratio and silently reduce the "weighted"
    * sample to an id-ordered head — and the B-row ratio table feeds the
    * per-doc sum. */
  def dsirWeights(target: DataFrame, raw: DataFrame, textCol: String,
      idCol: String, buckets: Int): DataFrame = {
    val rawCounts = bucketCounts(raw, textCol, idCol, buckets)
      .localCheckpoint()
    val targetCounts = bucketCounts(target, textCol, idCol, buckets)
      .localCheckpoint()
    require(!targetCounts.isEmpty, "DSIR target slice has no bigrams")
    require(!rawCounts.isEmpty, "DSIR raw slice has no bigrams")
    importanceFromCounts(rawCounts,
      logRatioFromCounts(targetCounts, rawCounts, buckets))
  }

  /** Gumbel-max weighted resampling without replacement: k docs drawn
    * ∝ exp(logw) via score = logw + Gumbel(doc_id, salt), global top-k
    * by (score desc, id) — deterministic (md5 uniforms), so epochs
    * re-salt and any engine replays the identical sample. Deliberately
    * `orderBy().limit(k)` and NOT a global row_number window: Spark
    * plans the former as TakeOrderedAndProject (per-partition bounded
    * heaps merged on the driver — the scalable global top-k), while an
    * unpartitioned window collapses the corpus to one task. */
  def gumbelResample(weights: DataFrame, k: Int, salt: String): DataFrame = {
    // u ∈ (0, 1]: (h + 1) / 2^52 over the 52-bit md5 prefix — never 0,
    // so ln(u) is finite; g = −ln(−ln u), each ln rounded at 8.
    val u = (conv(substring(md5(concat(col("id").cast("string"),
        lit(":" + salt))), 1, 13), 16, 10).cast("double") + lit(1.0)) /
      lit(4503599627370496.0)
    // Clamp lnU away from 0: a uniform within ~5e-9 of 1 (or exactly 1
    // — reachable, u = (h+1)/2^52) rounds ln(u) to 0, and ln(0) is NULL
    // on Spark but -inf on DuckDB — a doc that would sort last on one
    // engine and FIRST on the other. The clamp caps the Gumbel at
    // -ln(1e-8) ≈ 18.4, far above any real draw's influence.
    val lnU = least(round(log(u), 8), lit(-1.0e-8))
    val g = -round(log(-lnU), 8)
    weights
      // score = logw + g is an EXACT ≤8-dp decimal (logw 6 dp, g 8 dp)
      // — add and round to 6 in decimal (HALF_UP scale-down cast), one
      // double cast at the end: round(double, 6) splits engines on a
      // 5e-7 tie (the logw postmortem class, SCALING.md r8).
      .withColumn("score",
        (col("logw").cast(DecimalType(18, 6)) + g.cast(DecimalType(18, 8)))
          .cast(DecimalType(28, 6)).cast("double"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
