package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** SCALING.md probe for the r8 BATCHED distributed BPE tier
  * (`Bpe.trainDistributed`): the claim under test is that a k-merge
  * vocabulary needs ~k/|batch| job sets instead of the one-job-set-per-
  * merge shape VERDICT r7 flagged (What's wrong #2), while producing
  * the IDENTICAL merge table (BpeSpec pins equality on fixtures; this
  * probe re-checks it at probe scale and MEASURES the batching factor).
  *
  * Corpus: the R7Probe recipe — 20k distinct random 16-char word types
  * (the word-frequency table IS the training input at any corpus size)
  * — with a Zipf-ish frequency profile (freq = ⌈N/rank⌉) so the pair-
  * count argmax sees a realistic skewed distribution rather than the
  * all-ties worst case for batching.
  *
  * Usage: Test/runMain graft.tools.BpeBatchedProbe [numMerges]
  */
object BpeBatchedProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(200)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    import spark.implicits._

    val rng = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val types = (0 until 20000)
      .map(_ => (0 until 16).map(_ => alpha(rng.nextInt(26))).mkString)
      .distinct
    val words = types.zipWithIndex
      .map { case (w, i) => (w, (types.size / (i + 1)).max(1).toLong) }
      .toDF("w", "freq").repartition(32).localCheckpoint()

    // Batched distributed tier (the shape under test), instrumented.
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val t0 = System.nanoTime()
    val dist = Bpe.trainDistributed(words, k, minCount = 1L,
        onBatch = batches += _)
      .orderBy(col("rank")).collect()
    val tDist = (System.nanoTime() - t0) / 1e9

    // Driver tier on the same table — the reference output and the
    // wall-time comparison point.
    val collected = words.as[(String, Long)].collect()
    val t1 = System.nanoTime()
    val local = Bpe.trainLocal(collected, k, minCount = 1L)
    val tLocal = (System.nanoTime() - t1) / 1e9

    val same = dist.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq == local
    require(same, "batched distributed tier diverged from the driver tier")

    val jobSets = batches.size
    println(f"""{"probe":"bpe_batched","word_types":${types.size},""" +
      f""""num_merges":$k,"job_sets":$jobSets,""" +
      f""""merges_per_job_set":${k.toDouble / jobSets}%.1f,""" +
      f""""batch_sizes_head":[${batches.take(10).mkString(",")}],""" +
      f""""batch_sizes_tail":[${batches.takeRight(10).mkString(",")}],""" +
      f""""mean_last_20":${
        batches.takeRight(20).sum.toDouble / math.min(20, batches.size)}%.1f,""" +
      f""""dist_sec":$tDist%.2f,"local_sec":$tLocal%.2f,""" +
      f""""tables_equal":$same}""")
    spark.stop()
  }
}
