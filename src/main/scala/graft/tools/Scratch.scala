package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current targets (r15):
  * the dedup_embedding band-bucket size distribution (VERDICT r14 #4 —
  * is there a hot cell the salting must split?) and the
  * pipeline_curation_v2 stage split (r14 target, kept for reference).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    // ---- dedup_embedding LSH bucket histogram (VERDICT r14 #4) ----
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val b = graft.functions.Knn.autoBits(n)
    val t = graft.functions.Knn.autoTables(b)
    println(s"[scratch] corpus n=$n autoBits=$b autoTables=$t")
    val bucketed = graft.functions.Knn.lshBucketTable(
      emb, "vec_id", "embedding", t, b, 64,
      graft.functions.VectorFunctions.dotNative)
    val cells = bucketed.groupBy(col("t"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
    val stats = cells.agg(
      count(lit(1)).as("n_cells"), max(col("sz")).as("max_sz"),
      expr("percentile(sz, array(0.5, 0.9, 0.99, 1.0))").as("pct"),
      sum(col("sz") * (col("sz") - 1) / 2).as("cand_pairs")).head
    println(s"[scratch] lsh cells=${stats.getLong(0)} max=${stats.getLong(1)} " +
      s"p50/90/99/100=${stats.getSeq[Double](2).mkString(",")} " +
      s"candidate_pairs=${stats.get(3)}")
    // SemDeDup centroid buckets (dedup_semantic): 16 centroids.
    val assigned = graft.functions.Knn.assignWith(emb, "vec_id", "embedding",
      emb.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centv")),
      graft.GraftFunctions.cosineSim)
    val cstats = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("sz"))
      .agg(max(col("sz")), expr("percentile(sz, 0.5)"),
        sum(col("sz") * (col("sz") - 1) / 2)).head
    println(s"[scratch] semantic buckets max=${cstats.get(0)} " +
      s"p50=${cstats.get(1)} pairs=${cstats.get(2)}")

    // ---- timing: embedding dedup family, warmed 2nd run ----
    for (q <- Seq("dedup_embedding_pairs", "dedup_embedding_lsh",
        "dedup_embedding_incremental", "dedup_semantic")) {
      noop(graft.SparkEntry.queries(q)(spark, dir))
      time(q)(noop(graft.SparkEntry.queries(q)(spark, dir)))
    }

    // ---- pipeline_curation_v2 stage split (r14 target, reference) ----
    noop(graft.SparkEntry.queries("q1_agg")(spark, dir)) // warmup
    noop(graft.SparkEntry.queries("pipeline_curation_v2")(spark, dir))
    val q = time("v2 construction")(
      graft.SparkEntry.queries("pipeline_curation_v2")(spark, dir))
    time("v2 execution")(noop(q))
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("source") === "src0")
    import graft.dedup.Dedup
    time("curate v1 (warm2)")(noop(graft.pipeline.Curation.curate(docs, bench,
      family = Dedup.md5AffineFamily)))
    time("minhashClusters")(noop(Dedup.minhashClusters(docs, "text", "doc_id",
      3, 0.8, family = Dedup.md5AffineFamily)))
    time("contamination")(noop(Dedup.contaminationRatio(docs, bench,
      "text", "doc_id", 3)))
    time("repetitionStats")(noop(graft.ops.Repetition.repetitionStats(
      docs, "text", "doc_id")))
    time("selfClassify")(noop(graft.functions.LangModel.selfClassify(
      docs, "text", "lang", "doc_id", 256)))
    time("removeDupSpans")(noop(Dedup.removeDuplicatedSpans(
      docs, "text", "doc_id", 10)))
    spark.stop()
  }
}
