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
