package graft.tools

import graft.Sessions
import graft.dedup.Dedup
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val docs = Tables.documents(spark, dir)
    time("jaccard.count warm0")(Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8).count())
    time("jaccard.count warm1")(Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8).count())
    time("clusterPairs total")(
      Dedup.clusterPairs(Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8)).count())
    time("pairs.persist+count") {
      val p = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8).select("id_a", "id_b").persist()
      p.count(); p.collect(); p.unpersist()
    }
    // Distributed path (pointer doubling) at the same scale: must agree
    // with the local union-find labels exactly. One persisted pair list
    // feeds both calls so the timings isolate the clustering step;
    // localEdgeLimit = -1 forces the distributed branch even when the
    // pair list is empty (0 edges <= 0 would take the local branch).
    val pairsDf = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.8).persist()
    pairsDf.count()
    val localLabels = time("clusterPairs LOCAL only")(
      Dedup.clusterPairs(pairsDf).collect().toSet)
    val distLabels = time("clusterPairs DISTRIBUTED only")(
      Dedup.clusterPairs(pairsDf, localEdgeLimit = -1L).collect().toSet)
    pairsDf.unpersist()
    println(s"[scratch] labels equal: ${localLabels == distLabels} (${localLabels.size} rows)")

    // 10x-corpus stress of the PRODUCTION minhash path (xxhash64): the
    // copies are exact dups of each other, so LSH candidate volume grows
    // ~45x per original near-dup pair — a deliberate worst case for the
    // candidate-then-verify pipeline's scaling behaviour.
    import org.apache.spark.sql.functions._
    val big = (0 until 10).map(i => docs.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val t0 = System.nanoTime()
    val nBig = Dedup.minhashPairs(big, "text", "doc_id").count()
    println(f"[scratch] minhash 10x (${big.count()} docs): $nBig%d pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
