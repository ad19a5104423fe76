package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Learned quality scoring: a linear (logistic) quality classifier
  * DISTILLED from the heuristic gate — the fasttext-classifier shape of
  * LLM data curation (train a cheap scorer to mimic expensive
  * judgments, then score the whole corpus with one projection), with
  * the labels here produced by the rule gate itself (weak supervision).
  * The payoff over the rules is a SOFT margin: borderline documents get
  * a calibrated score instead of a hard cliff, and the score is one
  * codegen'd expression at corpus scale.
  *
  * Training is full-batch gradient descent with a fixed iteration
  * count — the [[Embeddings.dominantDirection]] determinism recipe
  * applied to a model: per iteration ONE aggregate job computes the
  * exact-decimal gradient sums (order-free), the weight update happens
  * driver-side in the same IEEE expression order the DuckDB oracle
  * uses, and every libm output (exp) is rounded at a fixed scale
  * immediately. The whole training run is therefore a pure function of
  * the corpus — partitioning-invariant and cross-engine replayable,
  * which puts a LEARNED model under the exact-hash oracle gate.
  *
  * Scale shape: O(iterations) jobs, each one partial-aggregable
  * scan-and-sum over the corpus (no shuffle beyond the single-row
  * aggregate); driver state is d+1 doubles. Scoring is a pure
  * projection with literal weights — no broadcast, no join, fully
  * inside whole-stage codegen.
  */
object QualityModel {

  /** The fixed feature map (bias + 4 bounded signals), shared by
    * training and scoring. Bounded to [0, ~1] so untuned GD is stable.
    * Expression order is part of the contract — the oracle mirrors it
    * term for term. */
  def features(text: Column, nChars: Column): Seq[Column] = {
    val n = TextFunctions.tokenCount(text)
    Seq(
      lit(1.0),
      least(n, lit(200)).cast("double") / lit(200.0),
      // The SAME TextFunctions expressions the rule gate (the label)
      // uses — one definition, so the distilled model and its teacher
      // cannot drift.
      TextFunctions.stopwordRatio(text),
      least(nChars, lit(1000)).cast("double") / lit(1000.0),
      TextFunctions.meanTokenLength(text) / lit(20.0))
  }

  /** σ(z) with the oracle-exact float recipe: ONE libm call (exp),
    * rounded at 8 immediately; the division is plain IEEE. */
  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + round(exp(-z), 8))

  private def dot(ws: Array[Double], xs: Seq[Column]): Column =
    xs.zip(ws).map { case (x, w) => x * lit(w) }.reduce(_ + _)

  /** Train weights by `iters` full-batch GD steps at learning rate
    * `lr`, from w = 0. Returns d+1 weights (bias first), each rounded
    * at 8 after every update. `label` must be a deterministic 0/1
    * double column. Rows with null text are excluded (null features
    * would poison the gradient sums). */
  def train(docs: DataFrame, textCol: String, nCharsCol: String,
      label: Column, iters: Int = 8, lr: Double = 2.0): Array[Double] = {
    require(iters >= 1 && lr > 0, s"need iters >= 1, lr > 0: ($iters, $lr)")
    // Null text OR null n_chars would null that row's whole gradient
    // term — silently excluded from the sums while still counted in
    // nRows. Filter both so "excluded" and "counted" coincide.
    val base = docs.filter(col(textCol).isNotNull && col(nCharsCol).isNotNull)
    val xs = features(col(textCol), col(nCharsCol))
    val dec = DecimalType(28, 10)
    var w = Array.fill(xs.size)(0.0)
    // Features and the label are ITERATION-INVARIANT — only w changes
    // between GD steps — yet the loop used to recompute the full text
    // feature pipeline (tokenize + stopword scan + mean-token-length,
    // the dominant per-row cost) on every iteration: iters+1 corpus
    // text passes for an 8-step train (r14, guide §1.2 "don't compute
    // things you throw away"). Materialize the (d+1 doubles + label)
    // feature table ONCE — eager DISK_ONLY localCheckpoint, the repo's
    // corpus-sized-pin convention (probe 16b) — and every iteration
    // aggregates over ~48 bytes/row instead of re-deriving them from
    // the text. Same doubles in, same gradient sums out: the features
    // are deterministic expressions, so the trained weights are
    // bit-identical (QualityModelSpec pins the weights; the DuckDB
    // oracle replay is unchanged). Measured at sf0.1: the three
    // registered quality-model queries drop ~2× each.
    val feat = base
      .select(xs.zipWithIndex.map { case (x, j) => x.as(s"__f$j") } :+
        label.as("__y"): _*)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val fxs = xs.indices.map(j => col(s"__f$j"))
    // The GD loop is the pin's ONLY consumer and completes inside this
    // call, so release the checkpointed RDD on every exit path instead
    // of leaking it for the session (r15, ADVICE r14) — three
    // registered quality-model queries pin per bench run, plus specs.
    try {
    val nRows = feat.count().toDouble
    require(nRows > 0, "empty corpus")
    for (_ <- 0 until iters) {
      // err = σ(w·x) − y, rounded at 8 (one more libm-adjacent pin so
      // the per-term product below starts from identical doubles).
      val err = round(sigmoid(dot(w, fxs)) - col("__y"), 8)
      val sums = feat
        .select(fxs.zipWithIndex.map { case (x, j) =>
          sum(round(err * x, 8).cast(dec)).as(s"g$j")
        }: _*)
        .collect().head
      w = w.indices.map { j =>
        require(!sums.isNullAt(j),
          s"gradient sum $j is null — label or a feature is null on every row")
        val g = sums.getDecimal(j).doubleValue / nRows
        BigDecimal(w(j) - lr * g)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toArray
    }
    w
    } finally feat.unpersist()
  }

  /** Score with trained weights: σ(w·x) rounded at 6 — a pure Column
    * over (textCol, nCharsCol), one codegen'd projection with literal
    * weights, applicable to any frame carrying those columns. */
  def score(textCol: String, nCharsCol: String, w: Array[Double]): Column =
    round(sigmoid(dot(w, features(col(textCol), col(nCharsCol)))), 6)

  /** Threshold calibration sweep: for each threshold, the confusion
    * counts of `scoreCol >= threshold` against the boolean truth
    * `labelCol`, plus precision/recall — the curve a pipeline owner
    * reads to pick the production cutoff for [[score]].
    * Output: (threshold, n_kept, tp, fp, fn, precision, recall),
    * precision null at operating points that keep nothing.
    *
    * Scale shape: ONE pass — the scored frame cross-joins the broadcast
    * |thresholds|-row table (constant-factor row amplification) and
    * partial aggregation collapses each input partition to
    * |thresholds| rows map-side; the ratios are single IEEE divisions
    * of exact counts, so the curve is engine-replayable. */
  def calibrate(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold")
    // A duplicate threshold would cross-join twice and the groupBy
    // would silently double every count for that operating point.
    require(thresholds.distinct.size == thresholds.size,
      s"duplicate thresholds: $thresholds")
    val spark = scored.sparkSession
    import spark.implicits._
    val t = broadcast(thresholds.toDF("threshold"))
    val (s, y) = (col(scoreCol), col(labelCol))
    scored.crossJoin(t)
      .groupBy(col("threshold"))
      .agg(
        count(when(s >= col("threshold"), 1)).as("n_kept"),
        count(when(s >= col("threshold") && y, 1)).as("tp"),
        count(when(s >= col("threshold") && !y, 1)).as("fp"),
        count(when(s < col("threshold") && y, 1)).as("fn"))
      .withColumn("precision",
        col("tp").cast("double") /
          nullif(col("tp") + col("fp"), lit(0L)).cast("double"))
      .withColumn("recall",
        col("tp").cast("double") /
          nullif(col("tp") + col("fn"), lit(0L)).cast("double"))
  }
}
