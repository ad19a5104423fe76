package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of aggregate tables — the warehouse form of
  * "never reprocess the corpus": a daily batch folds into a maintained
  * rollup in O(batch), exactly like Spark's own partial aggregation
  * folds map-side states into final ones.
  */
object IncrementalAgg {

  /** Merge partial-aggregate tables that share a schema of `keys` plus
    * sum-mergeable measure columns (SUMs and COUNTs stored as counts —
    * both merge by addition; AVG is derivable as sum/cnt and must be
    * stored as its two parts). `merge(agg(b₁), agg(b₂)) == agg(b₁ ∪ b₂)`
    * is the law IncrementalAggSpec pins.
    *
    * One union + one grouped sum: the shuffle is proportional to the
    * DISTINCT KEYS of the inputs, not history — and when the state
    * table is read pre-bucketed on the keys, only the batch side
    * shuffles. Null measures merge as SQL sum does (ignored; all-null
    * group → null). */
  def mergeSums(state: DataFrame, batchAgg: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(batchAgg.columns.sorted.sameElements(state.columns.sorted),
      s"state/batch schemas differ: ${state.columns.mkString(",")} vs " +
        batchAgg.columns.mkString(","))
    fold(state.unionByName(batchAgg), keys)
  }

  /** Re-aggregate a stack of partial-aggregate rows (e.g. a union of
    * per-batch delta tables) down to one row per key. */
  def fold(deltas: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val measures = deltas.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "no measure columns to merge")
    deltas.groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }
}
