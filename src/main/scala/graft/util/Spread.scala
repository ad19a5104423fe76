package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Unsplittable-input spread — the optimization guide §2.5 input-skew
  * fix ("one huge unsplittable file … repartition immediately after the
  * read"), applied SURGICALLY at operator/query sites whose per-row
  * compute below the first exchange is heavy (md5 sketch digests, span
  * explosion + normalization, broadcast-join probe chains over the fact
  * table).
  *
  * The fixture parquet files hold ONE row group each, so every scan
  * plans as a single task and everything below the first exchange runs
  * on one of the session's cores. [[spreadInput]] hash-repartitions on
  * a key the call site already reads (so ReadSchema does not widen)
  * across `defaultParallelism` partitions — but ONLY when the input
  * actually plans to fewer partitions than the session width. At
  * warehouse scale the scan splits by itself, the condition is false,
  * and this is a no-op: the partitioning derives from the planned
  * input, never from a local[32] constant.
  *
  * Measured r14 (sf0.1, session-relative): sketch_cms_probe 0.55×,
  * q3_join_agg 0.62×, q9_profit_nation 0.68×, sketch_kmv_distinct
  * 0.69×, dedup_span_stats 0.53×. The BLANKET read-layer form was
  * measured first and rejected: consumers whose first operation is
  * itself an exchange (sort-first text queries, agg-first q17/q1) paid
  * more for the extra exchange + task wave than parallel compute
  * returned (q17_small_quantity 2.56×) — exactly guide §2.3's "shuffle
  * fewer bytes" warning, which is why the spread lives at the call
  * sites that win, not in the shared read path. Hash (not round-robin)
  * because round-robin pays the full-width sort-before-repartition
  * pass (SPARK-23207), measured 1.3–5.8× worse.
  */
object Spread {
  def spreadInput(df: DataFrame, key: Column): DataFrame = {
    // Streaming frames cannot be planned via .rdd (and micro-batch
    // partitioning is the source's business) — pass them through.
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (p > 1 && df.rdd.getNumPartitions < math.max(2, p / 2))
      df.repartition(p, key)
    else df
  }
}
