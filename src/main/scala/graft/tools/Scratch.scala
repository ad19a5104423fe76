package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: the
  * pipeline_curation_v2 stage split (construction vs execution, and the
  * per-stage noop costs of the V2 additions). */
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
    noop(graft.SparkEntry.queries("q1_agg")(spark, dir)) // warmup
    // warmed full query
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
