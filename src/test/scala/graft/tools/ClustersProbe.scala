package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.model.Tables

/** r11 decomposition of `dedup_clusters`' 100× exponent (r10 verdict
  * #1): the composed query reads 0.83 overall (4.2 / 49.7 / 187.7 s at
  * 1×/30×/100×), above the ~0.7 worry line, and the r10 explanation —
  * the local[32]/8 g disk-bandwidth asymptote — conflated the prefix
  * route's candidate volume with the environmental bend in one number.
  * This probe re-runs the SAME pipeline (exact-collapse →
  * jaccardPairsPrefix → clusterPairs, the `jaccardClusters` route) with
  * a DISK_ONLY pin between stages, timing each stage and counting its
  * output rows, so plan growth (rows per stage vs corpus factor) and
  * environment (seconds per row) separate.
  *
  * Stages: s0 collapse reps → s1 shingle explode → s2 prefix index →
  * s3 candidate pairs (raw emission counted separately from distinct)
  * → s4 exact-Jaccard verify → s5 cluster solve.
  *
  * The stage pins make the additive total slightly SLOWER than the
  * shipped fused plan (extra disk round-trips); the point is the
  * per-stage shape, not the total.
  *
  * Usage: Test/runMain graft.tools.ClustersProbe <sfDir>
  */
object ClustersProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    val n = 3
    val threshold = 0.8

    var t0 = System.nanoTime()
    def stage(name: String)(df: DataFrame): DataFrame = {
      val pinned = df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      val rows = pinned.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"clusters","stage":"$name","rows":$rows,"sec":$sec%.3f,"dir":"$dir"}""")
      t0 = System.nanoTime()
      pinned
    }

    // s0: exact-collapse prestage (mirrors Dedup.collapsedClusters).
    val docs = Tables.documents(spark, dir)
    val members = docs.select(col("doc_id").as("id"),
        md5(lower(col("text"))).as("__k"),
        (size(TextFunctions.tokens(col("text"))) >= n).as("__hs"))
      .filter(col("__k").isNotNull)
    val groups = members.groupBy(col("__k"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("__n"),
        max(col("__hs")).as("__hs"))
    val reps = stage("s0_collapse_reps")(docs.join(
      groups.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi"))

    // s1: shingle explode over representatives.
    val sh = stage("s1_shingles")(
      Dedup.shingleTable(reps, "text", "doc_id", n))

    // s2: the PPJoin prefix index (mirrors jaccardPairsPrefix).
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("id"))
      .orderBy(col("df"), col("shingle"))
    val ranked = stage("s2_prefix_index")(sh.join(dfs, Seq("shingle"))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n_sh", count(lit(1)).over(wRank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rk") <=
        col("n_sh") - floor(lit(threshold) * col("n_sh")) + 1)
      .select(col("id"), col("shingle"), col("rk"), col("n_sh")))

    // s3: candidate emission. The RAW join output (pre-distinct) is the
    // volume the SMJ tasks actually stream; report it via count, then
    // pin the distinct set for the verify stage. Mirrors the shipped
    // jaccardPairsPrefix, INCLUDING the r11 positional filter.
    val rawCand = ranked.as("a").join(ranked.as("b"), Seq("shingle"))
      .filter(col("a.id") < col("b.id"))
      .filter(lit(1) +
        least(col("a.n_sh") - col("a.rk"), col("b.n_sh") - col("b.rk")) >=
        lit(threshold / (1.0 + threshold)) *
          (col("a.n_sh") + col("b.n_sh")) - lit(1e-6))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val nRaw = rawCand.count()
    println(f"""{"probe":"clusters","stage":"s3_raw_emission","rows":$nRaw,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"dir":"$dir"}""")
    t0 = System.nanoTime()
    val cand = stage("s3_candidates_distinct")(rawCand.distinct())

    // s4: exact intersection verify on the candidates.
    val sized = stage("s4_verified_pairs")(cand
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b"))

    // s5: cluster solve over the verified pairs.
    stage("s5_cluster_solve")(Dedup.clusterPairs(sized))
    spark.stop()
  }
}
