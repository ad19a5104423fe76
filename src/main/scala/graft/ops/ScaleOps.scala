package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and partitioning tools for the 100 TB design envelope. AQE's skew
  * join handles most cases at runtime; explicit salting remains for the
  * pathological hot-key joins AQE cannot split (e.g. a single key holding
  * >10% of the table joined against a non-broadcastable side).
  */
object ScaleOps {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, saltFactor); the small side is replicated saltFactor× with every
    * salt value; the join key becomes (key, salt), splitting each hot
    * key's rows across saltFactor reducers. Semantics are exactly the
    * plain inner join on `key`; cost trades saltFactor× replication of
    * the small side for even reducer load. */
  /** Contiguous global row index 0..n-1 over a total order, WITHOUT a
    * single-partition window (`row_number().over(Window.orderBy(...))`
    * funnels the full dataset through one task). Two passes over the
    * range-partitioned sort: a lightweight per-partition count job, then
    * per-partition offsets added map-side — the standard distributed
    * global-index pattern (what RDD.zipWithIndex does, surfaced here
    * with the row total, which callers otherwise pay another job for).
    *
    * `order` must be a TOTAL order (tie-free) or rows tying on it may
    * swap indexes between runs. Returns (indexed df, row count). */
  def withGlobalIndex(df: DataFrame, order: Seq[Column],
      out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val bc = spark.sparkContext.broadcast(offsets)
    val indexed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var pos = bc.value(i)
      it.map { r =>
        val row = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pos)
        pos += 1
        row
      }
    }
    val schema = sorted.schema
      .add(out, org.apache.spark.sql.types.LongType, nullable = false)
    (spark.createDataFrame(indexed, schema), total)
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Pre-shuffle both sides onto the same key partitioning so a chain of
    * operations (join + groupBy on the same key) reuses one exchange.
    * At warehouse scale the equivalent durable form is bucketed tables. */
  def coPartition(a: DataFrame, b: DataFrame, key: String,
      numPartitions: Int): (DataFrame, DataFrame) =
    (a.repartition(numPartitions, col(key)),
      b.repartition(numPartitions, col(key)))

  /** Runtime-filter semi-join: build a Bloom filter over the small
    * side's keys, pre-filter the big side with the broadcast filter (a
    * pure projection — no shuffle), THEN run the exact left-semi join on
    * the survivors. Bloom filters have no false negatives, so the result
    * is exactly `big semi-join small`; the payoff at 100 TB is that the
    * big side's shuffle input shrinks by the filter's selectivity before
    * the exchange (the explicit form of Spark's own
    * spark.sql.optimizer.runtime.bloomFilter.enabled rewrite, usable
    * when the planner can't infer it — e.g. keys crossing a UDF or a
    * non-equi pre-transform). False positives only cost shuffle bytes;
    * the final semi join removes them. */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
      m: Int = 1 << 20, numHashes: Int = 3): DataFrame = {
    import graft.functions.Sketches
    // Internal columns carry a __bloom_ prefix: `big` is an arbitrary
    // caller frame, so a bare name like "positions" could collide with
    // one of its columns and make the probe ambiguous.
    val filter = Sketches.bloomBuild(small, col(key), m, numHashes)
      .withColumnRenamed("positions", "__bloom_positions")
    // Project the md5 digest ONCE per row, then derive the k slots from
    // it — inlining base28 into each conjunct re-digests the key
    // numHashes times on exactly the hot pre-shuffle path this helper
    // exists to thin (same one-digest rule as Sketches.bloomContains).
    val member = (0 until numHashes)
      .map(j => array_contains(col("__bloom_positions"),
        pmod(Sketches.affineSlot(col("__bloom_b"), lit(j)), lit(m))))
      .reduce(_ && _)
    big.withColumn("__bloom_b", Sketches.base28(col(key), "bloom"))
      .crossJoin(broadcast(filter))
      .filter(member) // inline projection-level prune, no shuffle
      .drop("__bloom_positions", "__bloom_b")
      // No distinct on the build side: left_semi deduplicates by
      // definition, and the extra exchange+aggregate costs more than the
      // duplicate probe rows it would remove.
      .join(small.select(col(key)), Seq(key), "left_semi")
  }

  /** Durable co-location: write as a bucketed+sorted catalog table. Two
    * tables bucketed on the same key with the same bucket count join with
    * NO exchange — the shuffle is paid once at write time, amortized over
    * every subsequent join/groupBy on the key. The 100 TB form of
    * [[coPartition]]. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
