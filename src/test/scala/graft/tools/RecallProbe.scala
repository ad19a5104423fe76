package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Knn
import graft.model.Tables

/** Probe 20e (r12 verdict #2): RECALL at the scale geometry. The r12
  * adaptive-width rule (B = max(6, ⌈log₂(n/32)⌉)) holds candidate COST
  * flat as the corpus grows by shrinking per-table collision
  * probability — (1-θ/π)^B per table — so the receipts that certified
  * flat cost at B→13 say nothing about what recall the larger operating
  * point retains, and the sf0.01 recall floors (B=6) don't transfer.
  * This probe measures, at the corpus the arg names (healthy 100× =
  * 200k vectors → B=13; embskew 30× = 60k → B=11):
  *
  *  - search recall@10 of [[Knn.lshCosine]] vs exact [[Knn.bruteForce]]
  *    on a deterministic hash-sampled query set, for the registered
  *    geometries (T=24, probes 0 and 2) and the candidate compensations
  *    (probes scaled with B; tables doubled), plus the pinned B=6
  *    contrast (the recall ceiling the gate scale enjoys, at its
  *    unbounded-candidate cost);
  *  - per-cosine-band PAIR recall of the `dedup_embedding_lsh` geometry
  *    vs exact ground truth on a bounded vector sample: the FULL corpus
  *    is bucketed at the full-corpus B (a pair collides iff its
  *    signatures collide — signatures depend only on the vectors, so
  *    restricting both join sides to the sample measures the true
  *    geometry at sample cost), then candidates within the sample are
  *    compared against [[Knn.cosinePairs]] on the sample. Each band
  *    also carries the ANALYTIC expectation E[1-(1-p^B)^T] over its
  *    pairs' measured angles, so measured-vs-theory divergence (e.g.
  *    correlated hyperplane hits under a flood) is visible directly.
  *
  * Usage: Test/runMain graft.tools.RecallProbe <dir> [nQueries] [pairSample]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQ = if (args.length > 1) args(1).toInt else 50
    val pairSample = if (args.length > 2) args(2).toInt else 4000
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    val emb = Tables.embeddings(spark, dir).localCheckpoint()
    val n = emb.count()
    val bAuto = Knn.autoBits(n)

    // ---- search recall@10 ------------------------------------------
    val qs = ProbeCommon.sampledQueries(emb, n, nQ)
    val nq = qs.count()
    val exact = ProbeCommon.exactTop10(emb, qs)
    val denom = exact.count() // <= nq*10; ties at the boundary are fixed
    // Per-query similarity band of the TRUE neighbors — fixed across
    // arms, so computed (and pinned) once, not per arm.
    val qBand = exact.groupBy(col("query_id"))
      .agg((floor(avg(col("cosine")) * 10) / 10).as("qband"),
        count(lit(1)).as("nn"))
      .localCheckpoint()
    val topStats = exact.agg(avg(col("cosine")), min(col("cosine"))).head
    println(f"""{"probe":"recall20e","dir":"$dir","vectors":$n,"autoBits":$bAuto,"queries":$nq,"exact_rows":$denom,"top10_avg_cos":${topStats.getDouble(0)}%.4f,"top10_min_cos":${topStats.getDouble(1)}%.4f}""")

    def searchArm(name: String, tables: Int, bits: Int, probes: Int): Unit = {
      val t0 = System.nanoTime()
      // Pinned: TWO actions consume the arm's result (headline count +
      // per-band breakdown) and an unpinned plan would re-run the whole
      // bucketing/candidate/top-k pipeline per consumer.
      val approx = Knn.lshCosine(emb, qs, "vec_id", "embedding", k = 10,
        dims = 64, tables = tables, bits = bits, probes = probes)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint()
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
        "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"recall20e","arm":"search","name":"$name","tables":$tables,"bits":$bits,"probes":$probes,"recall":${hits.toDouble / denom}%.4f,"sec":$sec%.2f}""")
      // Per-SIMILARITY breakdown: recall conditioned on the query's
      // exact-top-10 mean cosine band. The geometry's recall is a pure
      // function of the neighbor ANGLE, so a mixed corpus (embskew: 20%
      // flood at ~0.94 + near-random rest) separates "what a real
      // clustered corpus retains" from "what the near-random tail
      // loses" — the measured form of the scaladoc's claim that
      // neighbors at cosine 0.8+ keep recall through large B.
      val perBand = exact
        .join(approx.withColumn("__hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id")).agg(count(col("__hit")).as("h"))
        .join(qBand, Seq("query_id"))
        .groupBy(col("qband"))
        .agg(count(lit(1)).as("queries"), sum(col("h")).as("found"),
          sum(col("nn")).as("nn"))
        .orderBy(col("qband")).collect()
      perBand.foreach { r =>
        println(f"""{"probe":"recall20e","arm":"search_band","name":"$name","bits":$bits,"probes":$probes,"qband":${r.getDouble(0)}%.1f,"queries":${r.getLong(1)},"recall":${r.getLong(2).toDouble / r.getLong(3)}%.4f}""")
      }
    }

    searchArm("registered_topk", 24, bAuto, 0) // knn_lsh_topk geometry
    // knn_lsh_mp_topk's REGISTERED geometry since r13: the width-scaled
    // autoProbes budget (this probe's own r13 measurements picked it).
    searchArm("registered_mp_auto", 24, bAuto, Knn.autoProbes(bAuto))
    // Contrast arms: the r12 fixed-2 budget the registration replaced,
    // a double budget, tables doubled, and the pinned gate-scale width
    // (the recall ceiling, at unbounded candidate cost).
    if (bAuto > 6) {
      searchArm("fixed2_mp_r12", 24, bAuto, 2)
      searchArm("probes_scaled2x", 24, bAuto,
        math.min(bAuto, 2 * (bAuto - 6) + 2))
      searchArm("tables_2x", 48, bAuto, 0)
      searchArm("tables_2x_mp", 48, bAuto, 2)
      searchArm("pinned_b6_ceiling", 24, 6, 0)
    }

    // ---- pair recall per cosine band --------------------------------
    val sEvery = math.max(1L, n / pairSample)
    val sample = emb.filter(
      pmod(xxhash64(col("vec_id"), lit(20250816L)), lit(sEvery)) === 0L)
      .localCheckpoint()
    val ns = sample.count()
    val exactPairs = Knn.cosinePairs(sample, "vec_id", "embedding", 0.4)
      .localCheckpoint()
    val band = floor(col("cosine") * 10) / 10 // 0.4, 0.5, ..., 0.9, 1.0

    def pairArm(name: String, bits: Int, tables: Int): Unit = {
      val t0 = System.nanoTime()
      val sIds = sample.select(col("vec_id").as("vid"))
      // Full-corpus geometry, sample-restricted join: signatures are a
      // pure per-vector function, so (a,b)∈S×S collides here iff it
      // collides in the full-corpus self-join.
      val bucketed = Knn.lshBucketTable(emb, "vec_id", "embedding",
        tables, bits, 64)
        .join(sIds, Seq("vid"), "left_semi")
        .select(col("vid"), col("t"), col("bucket"))
      val cand = bucketed.as("x").join(bucketed.as("y"), Seq("t", "bucket"))
        .filter(col("x.vid") < col("y.vid"))
        .select(col("x.vid").as("id_a"), col("y.vid").as("id_b")).distinct()
      val theta = acos(least(lit(1.0), greatest(lit(-1.0), col("cosine"))))
      val pTable = pow(lit(1.0) - theta / lit(math.Pi), lit(bits))
      val predicted = lit(1.0) - pow(lit(1.0) - pTable, lit(tables.toDouble))
      val joined = exactPairs
        .join(cand.withColumn("__hit", lit(1)), Seq("id_a", "id_b"),
          "left_outer")
        .groupBy(band.as("band"))
        .agg(count(lit(1)).as("pairs"), count(col("__hit")).as("found"),
          avg(predicted).as("pred"))
        .orderBy(col("band"))
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      joined.foreach { r =>
        val pairs = r.getLong(1)
        println(f"""{"probe":"recall20e","arm":"pairs","name":"$name","bits":$bits,"tables":$tables,"band":${r.getDouble(0)}%.1f,"pairs":$pairs,"found":${r.getLong(2)},"recall":${r.getLong(2).toDouble / pairs}%.4f,"predicted":${r.getDouble(3)}%.4f}""")
      }
      println(f"""{"probe":"recall20e","arm":"pairs","name":"$name","bits":$bits,"tables":$tables,"sample":$ns,"sec":$sec%.2f}""")
    }

    // The REGISTERED r14 geometry: width-scaled tables (autoTables —
    // T = max(24, tablesFor(0.9, B, 0.95))). Identical to the old
    // fixed-24 arm through B=13; past the boundary the fixed_t24
    // contrast arm shows the envelope gap auto-T closes (probe 20f).
    val tAuto = Knn.autoTables(bAuto)
    pairArm("registered_autoT", bAuto, tAuto)
    if (tAuto != 24) pairArm("fixed_t24_r13", bAuto, 24)
    if (bAuto != 6) pairArm("pinned_b6_ceiling", 6, 24)
    spark.stop()
  }
}
