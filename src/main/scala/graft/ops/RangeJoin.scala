package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows whose scalar value falls inside
  * right-side intervals [lo, hi).
  *
  * Spark plans the naive predicate `v >= lo AND v < hi` as a (broadcast)
  * nested-loop join — O(|L|·|R|) comparisons, which is exactly what dies
  * first at 100 TB. The binned form maps both sides onto fixed-width
  * bins: values join their single bin, intervals explode into every bin
  * they overlap, the join becomes a HASH equi-join on bin id, and a
  * residual filter restores exactness. Cost ∝ |L| + Σ(interval width /
  * binWidth) + candidate pairs — choose `binWidth` near the typical
  * interval width so each interval lands in O(1) bins.
  */
object RangeJoin {

  /** Exact [lo, hi) interval join via bin equi-join + residual filter.
    * `valueCol` comes from `left`; `loCol`/`hiCol` from `right`. Column
    * sets must be disjoint (alias beforehand if not).
    *
    * `maxBinsPerInterval` guards the interval explosion: one corrupt or
    * very wide interval (hi-lo >> binWidth) would otherwise hit Spark's
    * sequence max-array-length limit or blow executor memory and fail the
    * whole job with an opaque error. An interval spanning more bins
    * fails FAST with a message naming the offending width — the caller
    * either fixes the data or picks a binWidth near the real interval
    * width (which is the point of the algorithm anyway: O(1) bins per
    * interval). */
  def binned(left: DataFrame, valueCol: Column, right: DataFrame,
      loCol: Column, hiCol: Column, binWidth: Double,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val l = left.withColumn("__bin", floor(valueCol / binWidth))
    // A null bound or an inverted/empty interval (hi <= lo) can never
    // satisfy `v >= lo AND v < hi`; drop such rows up front (inner-join
    // semantics). Nulls would otherwise reach assert_true below, which
    // treats null as failure and aborts with a misleading message; an
    // inverted interval would make nBins NEGATIVE — sailing under the
    // guard — and then sequence(start, stop) with start > stop builds a
    // huge DESCENDING array: exactly the explosion the guard prevents.
    val bounded = right.filter(
      loCol.isNotNull && hiCol.isNotNull && hiCol > loCol)
    val nBins = floor(hiCol / binWidth) - floor(loCol / binWidth) + lit(1L)
    // assert_true returns NULL on success and throws on failure; keeping
    // it inside a filter predicate pins it into the plan (a bare projected
    // column could be pruned away).
    val guarded = bounded.filter(assert_true(
      nBins <= lit(maxBinsPerInterval),
      concat(lit("RangeJoin.binned: interval width "),
        (hiCol - loCol).cast("string"),
        lit(s" spans more than maxBinsPerInterval=$maxBinsPerInterval bins"),
        lit(s" at binWidth=$binWidth — widen binWidth or filter the"),
        lit(" offending interval"))).isNull)
    val r = guarded.withColumn("__bin",
      explode(sequence(floor(loCol / binWidth), floor(hiCol / binWidth))))
    l.join(r, Seq("__bin"))
      .filter(valueCol >= loCol && valueCol < hiCol)
      .drop("__bin")
  }
}
