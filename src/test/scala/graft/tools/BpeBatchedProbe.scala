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
  * Corpus: the R7Probe recipe — distinct random 16-char word types
  * (the word-frequency table IS the training input at any corpus size)
  * — with a Zipf-ish frequency profile (freq = ⌈N/rank⌉) so the pair-
  * count argmax sees a realistic skewed distribution rather than the
  * all-ties worst case for batching.
  *
  * A second arg raises the type count (r13 — r12 verdict #4: no
  * wall-clock receipt existed ABOVE the 4M-type driver-tier boundary).
  * Past 500k types the corpus is generated DISTRIBUTED-side (16-hex-char
  * md5 words over spark.range — a driver-side Seq of 6M strings is
  * exactly what the tier boundary exists to avoid) and the driver-tier
  * equality arm is skipped: output equality is pinned at fixture and
  * 20k-type scale (BpeSpec + the default arm of this probe); the >4M
  * run is the wall/job-set receipt.
  *
  * Usage: Test/runMain graft.tools.BpeBatchedProbe [numMerges] [types]
  */
object BpeBatchedProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(200)
    val nTypes = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    import spark.implicits._

    val big = nTypes > 500000
    val words = if (big) {
      // 16-char hex words from one md5 per id: ~16-symbol alphabet,
      // heavy shared-bigram structure (what the argmax needs), no
      // driver-side materialization. The groupBy folds the ~1e-6
      // md5-prefix collision chance into summed freqs instead of
      // duplicate-type rows.
      spark.range(nTypes.toLong).select(
        substring(md5(concat(col("id").cast("string"), lit(":bpe13"))),
          1, 16).as("w"),
        // Spark's / on integral types is DOUBLE division: floor+cast
        // keeps the Zipf profile integral (freq: BIGINT, the train
        // contract).
        greatest(lit(1L),
          floor(lit(nTypes.toDouble) / (col("id") + 1)).cast("long"))
          .as("freq"))
        .groupBy("w").agg(sum("freq").as("freq"))
        .repartition(32)
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    } else {
      val rng = new scala.util.Random(7)
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val types = (0 until nTypes)
        .map(_ => (0 until 16).map(_ => alpha(rng.nextInt(26))).mkString)
        .distinct
      types.zipWithIndex
        .map { case (w, i) => (w, (types.size / (i + 1)).max(1).toLong) }
        .toDF("w", "freq").repartition(32).localCheckpoint()
    }
    val typeCount = words.count()

    // Batched distributed tier (the shape under test), instrumented.
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val t0 = System.nanoTime()
    val dist = Bpe.trainDistributed(words, k, minCount = 1L,
        onBatch = batches += _)
      .orderBy(col("rank")).collect()
    val tDist = (System.nanoTime() - t0) / 1e9

    // Driver tier on the same table — the reference output and the
    // wall-time comparison point. Skipped above the tier boundary (the
    // whole point of the big arm is that this collect must not happen).
    val (tLocal, same) = if (big) (-1.0, true) else {
      val collected = words.as[(String, Long)].collect()
      val t1 = System.nanoTime()
      val local = Bpe.trainLocal(collected, k, minCount = 1L)
      val tL = (System.nanoTime() - t1) / 1e9
      val eq = dist.map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq == local
      require(eq, "batched distributed tier diverged from the driver tier")
      (tL, eq)
    }

    val jobSets = batches.size
    println(f"""{"probe":"bpe_batched","word_types":$typeCount,""" +
      f""""num_merges":${dist.length},"job_sets":$jobSets,""" +
      f""""merges_per_job_set":${dist.length.toDouble / jobSets}%.1f,""" +
      f""""batch_sizes_head":[${batches.take(10).mkString(",")}],""" +
      f""""batch_sizes_tail":[${batches.takeRight(10).mkString(",")}],""" +
      f""""mean_last_20":${
        batches.takeRight(20).sum.toDouble / math.min(20, batches.size)}%.1f,""" +
      f""""dist_sec":$tDist%.2f,"local_sec":$tLocal%.2f,""" +
      // null, not true, when the driver-tier arm was skipped: the
      // receipt must not assert a verification that never ran.
      s""""tables_equal":${if (big) "null" else same.toString}}""")
    spark.stop()
  }
}
