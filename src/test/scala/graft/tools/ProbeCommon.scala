package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Knn

/** The shared recall-probe scaffold (r13 review): RecallProbe and
  * IvfScaleProbe must measure the SAME deterministic query sample
  * against the SAME exact baseline, or a drift in one formula makes
  * the two probes silently grade different query sets. */
object ProbeCommon {
  /** ~nQ queries, hash-selected — deterministic, corpus-size-adaptive. */
  def sampledQueries(emb: DataFrame, n: Long, nQ: Int): DataFrame = {
    val qEvery = math.max(1L, n / nQ)
    emb.filter(pmod(xxhash64(col("vec_id")), lit(qEvery)) === 0L)
      .localCheckpoint()
  }

  /** The exact top-10 ground truth for the sampled queries, pinned. */
  def exactTop10(emb: DataFrame, qs: DataFrame): DataFrame =
    Knn.bruteForce(emb, qs, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .localCheckpoint()
}
