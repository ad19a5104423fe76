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
    * sets must be disjoint (alias beforehand if not). */
  def binned(left: DataFrame, valueCol: Column, right: DataFrame,
      loCol: Column, hiCol: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", floor(valueCol / binWidth))
    val r = right.withColumn("__bin",
      explode(sequence(floor(loCol / binWidth), floor(hiCol / binWidth))))
    l.join(r, Seq("__bin"))
      .filter(valueCol >= loCol && valueCol < hiCol)
      .drop("__bin")
  }
}
