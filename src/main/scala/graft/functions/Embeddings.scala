package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-level linear algebra over an embedding column — the spectral
  * statistics a curation pipeline derives from its vector space (top
  * principal direction for drift monitoring, anisotropy measurement,
  * whitening preconditioners).
  */
object Embeddings {

  /** Dominant eigenvector of the corpus Gram matrix Xᵀ X by power
    * iteration, expressed as distributed matvecs: each iteration is
    * w = Xᵀ (X v) — ONE scan of the corpus computing per-row scores
    * s = x·v (v rides in as a literal array, no join), then a d-group
    * aggregate of x_j · s. The d×d Gram matrix is never materialized:
    * at 100 TB the corpus streams through each iteration and only the
    * d-vector (KBs) returns to the driver between iterations — the
    * standard distributed power method.
    *
    * Deterministic across engines and partitionings, like
    * [[graft.ops.Graph.pageRank]]: both sums (the per-row dot and the
    * per-dimension contraction) accumulate in exact decimal,
    * and the iterate is normalized to unit max-norm (no sqrt — keeps
    * the arithmetic replayable) and rounded once per iteration at
    * `roundScale` decimals, so the doubles entering the next iteration
    * are bit-identical anywhere.
    *
    * Sign/scale convention: v₀ = 1ᵈ; output is the (converging)
    * eigenvector scaled so its max-abs component is ±1. Rows with a
    * null vector or null elements in scoring contribute nothing.
    *
    * Returns (dim_idx, component), dim_idx 0-based, one row per
    * dimension. */
  def dominantDirection(df: DataFrame, vecCol: String, dims: Int,
      iterations: Int = 3, roundScale: Int = 10): DataFrame = {
    require(dims > 0 && iterations >= 1, "dims and iterations must be positive")
    val spark = df.sparkSession
    // Unsplittable-input spread (r14, guide §2.5), hoisted ABOVE the
    // power-iteration loop: every iteration's dot + posexplode + 64-way
    // decimal matvec otherwise runs single-task on a one-row-group
    // scan, three times over. Hash on the vector itself — the only
    // column this operator reads — so ReadSchema is unchanged.
    val src = graft.util.Spread.spreadInput(
      df.select(col(vecCol)), col(vecCol))
    val dec = DecimalType(38, 18)
    // Fold-accumulator precision is chosen so every add is EXACT: the
    // (37,12) accumulator + (25,12) term addition lands on precision
    // exactly 38 — one digit higher and Spark's decimal-precision
    // adjustment would silently round the running sum at scale 17,
    // diverging from the oracle's scale-12 exact SUM. (The groupBy sums
    // below don't have this problem: Spark's sum aggregate keeps
    // (38,18) exactly; only pairwise HOF folds re-type per add.)
    val termDec = DecimalType(25, 12)
    val accDec = DecimalType(37, 12)
    var v: Array[Double] = Array.fill(dims)(1.0)
    for (_ <- 0 until iterations) {
      val vLit = array(v.map(lit): _*)
      // s = x·v per row, as an exact decimal term-sum over the array —
      // no explode for the dot; the row count never inflates here.
      val sCol = aggregate(
        zip_with(col(vecCol).cast("array<double>"), vLit, (a, b) => a * b),
        lit(BigDecimal(0)).cast(accDec),
        (acc, t) => (acc + coalesce(t, lit(0.0)).cast(termDec)).cast(accDec))
        .cast("double")
      // w_j = Σ_rows x_j · s: one narrow explode of (vec, s), 64-group
      // decimal aggregate (map-side partial), d rows to the driver.
      val w = src.select(col(vecCol), sCol.as("__s"))
        .where(col("__s").isNotNull)
        .select(posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("dim_idx", "__xv")), col("__s"))
        .where(col("__xv").isNotNull)
        .groupBy(col("dim_idx"))
        .agg(sum((col("__xv") * col("__s")).cast(dec)).as("__wsum"))
        .select(col("dim_idx"), col("__wsum").cast("double").as("__w"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val dense = Array.tabulate(dims)(j => w.getOrElse(j, 0.0))
      val m = dense.map(math.abs).max
      require(m > 0, "zero matvec — corpus is empty, all-null, or orthogonal to v")
      v = dense.map(c => BigDecimal(c / m)
        .setScale(roundScale, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    v.zipWithIndex.map { case (c, j) => (j, c) }.toSeq
      .toDF("dim_idx", "component")
  }
}
