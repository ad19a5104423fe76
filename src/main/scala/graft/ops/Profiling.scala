package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column statistics in ONE pass over
  * the data — the stats a warehouse collects for cost-based optimization
  * (join reordering, broadcast decisions) and a data pipeline collects
  * for drift/quality monitoring. At 100 TB a profile must never become
  * one job per column; everything here is a single aggregate.
  */
object Profiling {

  /** Exact per-column stats: one output row per requested column with
    * (col_name, n_rows, n_nonnull, n_distinct, min_value, max_value).
    * min/max are computed under the column's NATIVE type ordering, then
    * rendered to string for the uniform output schema.
    *
    * One logical aggregate — Catalyst plans the multi-column DISTINCT
    * set via one Expand (input ×|cols| pre-shuffle, partial-aggregated
    * map-side), not |cols| scans. Exact n_distinct is the oracle-
    * checkable form; at 100 TB prefer [[approxColumnStats]], which
    * drops the Expand entirely.
    *
    * Callers pass numerically-stable columns for string rendering
    * (integers, strings, dates, decimals); float min/max render
    * engine-specifically and belong in typed profiles, not this one. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame =
    statsWith(df, cols, c => count_distinct(col(c)))

  /** [[columnStats]] with HyperLogLog++ distinct counts (`relativeSD`
    * standard error): no Expand, pure partial aggregation — the profile
    * costs one scan + one 1-row shuffle regardless of column count.
    * Estimates are deterministic for a given dataset (HLL++ sketches
    * merge commutatively) but engine-specific, so this variant is
    * spec-tested rather than oracle-hashed. */
  def approxColumnStats(df: DataFrame, cols: Seq[String],
      relativeSD: Double = 0.05): DataFrame =
    statsWith(df, cols, c => approx_count_distinct(col(c), relativeSD))

  /** Equi-DEPTH histogram of a column: `buckets` ranges holding equal
    * row counts (±1), with each bucket's count and [lo, hi] bounds —
    * the boundary stats a cost-based optimizer prefers over equi-width
    * when data is skewed. Runs on [[RefOps.splitEven]]'s scalable ntile
    * (range-sort + offset arithmetic, no single-partition window).
    * Ties straddling a boundary land deterministically by count; the
    * published (n, lo, hi) per bucket is unique either way. Nulls are
    * excluded (they have no place in a value ordering). */
  def equiDepthHistogram(df: DataFrame, value: org.apache.spark.sql.Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "at least one bucket")
    RefOps.splitEven(buckets, Seq(col("__v")))(
        df.select(value.as("__v")).where(col("__v").isNotNull))
      .groupBy(col("part_id").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  private def statsWith(df: DataFrame, cols: Seq[String],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n").as("n_rows"), explode(array(entries: _*)).as("__s"))
      .select(col("__s.col_name"), col("n_rows"), col("__s.n_nonnull"),
        col("__s.n_distinct"), col("__s.min_value"), col("__s.max_value"))
  }

  /** Population-stability drift between two slices of the same metric
    * (the PSI monitor an ML/data pipeline runs between yesterday's and
    * today's distribution): equi-width bins over [lo, hi), one row per
    * bin — (bin, n_expected, n_actual, frac_expected, frac_actual,
    * psi_term). The PSI total is the sum of the terms; it is emitted
    * PER BIN so the report also localizes WHERE the distribution moved,
    * and so the output is exact counts + one rounded term per bin
    * (engine-replayable) instead of an order-dependent float total.
    *
    * Laplace-smoothed fractions ((count+1) / (n+bins)) keep every term
    * defined when a bin is empty on one side. Values outside [lo, hi)
    * clamp into the edge bins (drift OUT of range must register, not
    * vanish); null AND NaN values are excluded — NaN has no position on
    * the metric axis, and engines disagree on where it would clamp
    * (Spark's floor sends it to bin 0, an ordering-based clamp sends it
    * to the top bin), so it must not be silently filed in either edge.
    * Each side is one conditional aggregate — two scans, map-side
    * collapse to `bins` rows. */
  def psiBins(expected: DataFrame, actual: DataFrame,
      value: org.apache.spark.sql.Column, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(lo < hi, s"need lo < hi: [$lo, $hi)")
    val width = (hi - lo) / bins
    // Clamp BEFORE the int cast: floor() is LongType, and casting an
    // extreme out-of-range long to int wraps negative in non-ANSI
    // Spark — which would file a huge corrupt value in the LOW edge
    // bin. Clamped first, the value is always in [0, bins).
    def binned(df: DataFrame, n: String) = df
      .filter(value.isNotNull && !isnan(value.cast("double")))
      .select(least(lit((bins - 1).toLong), greatest(lit(0L),
        floor((value - lo) / width))).cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val spark = expected.sparkSession
    import spark.implicits._
    val spine = (0 until bins).toDF("bin")
    val joined = spine
      .join(binned(expected, "__ne"), Seq("bin"), "left")
      .join(binned(actual, "__na"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__ne"), lit(0L)).as("n_expected"),
        coalesce(col("__na"), lit(0L)).as("n_actual"))
    val totals = broadcast(joined.agg(
      sum(col("n_expected")).as("__te"), sum(col("n_actual")).as("__ta")))
    val fe = (col("n_expected") + 1L).cast("double") /
      (col("__te") + bins).cast("double")
    val fa = (col("n_actual") + 1L).cast("double") /
      (col("__ta") + bins).cast("double")
    joined.crossJoin(totals)
      .select(col("bin"), col("n_expected"), col("n_actual"),
        fe.as("frac_expected"), fa.as("frac_actual"),
        round((fa - fe) * log(fa / fe), 8).as("psi_term"))
  }
}
