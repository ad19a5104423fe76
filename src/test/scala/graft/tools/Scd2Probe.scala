package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r10 diagnosis tool for the late-SCD2 gate's 100× OOM: runs the
  * 4-batch mergeHistoryWithLate fold with configurable checkpoint
  * storage and per-fold wall/row reporting.
  *
  * Arrival modes (3rd arg, r11 — verdict #4's proportionality pin):
  *  - "interleave" (default, the r10 probe): batch b = versions with
  *    version % 4 == b — the everything-late worst case, where from
  *    fold 1 on nearly every touched key has a version at or before
  *    its current valid_from and takes the repair path;
  *  - "trickle:<D>": batches are version-QUARTILE ordered (in-order
  *    arrival per key by construction), except keys with
  *    key % D == 0 have their first-quartile versions DEFERRED to the
  *    last batch — so exactly ~1/D of keys arrive late, once, which is
  *    the operator's contract shape (O(batch + late keys' raw rows)).
  *    D = 100 ⇒ ~1% late keys;
  *  - "lagshard:<S>": quartile-ordered like trickle, but the late keys
  *    are ALL keys of rawBucket(key, S) bucket 0 — ~1/S of keys,
  *    clustered in exactly one raw-store partition (probe 19d's one-
  *    lagging-shard shape; pair with pruned:S).
  *
  * A 4th arg `pruned:<nBuckets>` (r11) folds through
  * [[graft.ops.Cdc.mergeHistoryWithLatePruned]] against a one-time
  * kbucket-PARTITIONED parquet write of the raw log, so the repair's
  * raw read partition-prunes to the late keys' buckets — the A/B for
  * SCALING.md probe 19c.
  *
  * r13 arms (probe 19f — r12 verdict #3, the WithLate 0%-late floor's
  * pushdown claim): mode `stored` pins the folded base as a PARQUET
  * table between folds (write + read-back, the warehouse shape) instead
  * of a localCheckpoint, so the detector's
  * `is_current && valid_from >= batchMin` suspect filter actually
  * pushes to a columnar scan; the extra arg `plain` folds through pure
  * [[graft.ops.Cdc.mergeHistory]] (requires an in-order arrival mode),
  * giving the same-session premium denominator in BOTH base regimes.
  *
  * Usage: Test/runMain graft.tools.Scd2Probe <sfDir> <mem|disk|stored> [interleave|inorder|trickle:D|lagshard:S] [pruned:N] [plain]
  */
object Scd2Probe {
  def main(args: Array[String]): Unit = {
    val Array(dir, mode) = args.take(2)
    require(Set("mem", "disk", "stored")(mode), s"unknown mode: $mode")
    val arrival = if (args.length > 2) args(2) else "interleave"
    val extras = args.drop(3).toSeq
    val plain = extras.contains("plain")
    val pruned: Option[Int] = extras.filterNot(_ == "plain") match {
      case Seq() => None
      case Seq(a) =>
        // Require the prefix explicitly: stripPrefix on a bare integer is
        // a no-op, which would silently enable pruned mode (r11 advice).
        require(a.startsWith("pruned:"),
          s"unknown arg: $a (expected pruned:<nBuckets> or plain)")
        Some(a.stripPrefix("pruned:").toInt)
      case other => sys.error(s"too many args: ${other.mkString(" ")}")
    }
    require(!(plain && pruned.isDefined), "plain and pruned are exclusive")
    // mergeHistory raises on any out-of-order arrival, so the plain arm
    // only makes sense (and only survives fold 1) on the no-deferral
    // mode — fail at parse time, not minutes into a 100x fold chain.
    require(!plain || arrival == "inorder",
      s"plain requires the inorder arrival mode, got: $arrival")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    import spark.implicits._
    val history = graft.model.Tables.orders(spark, dir)
      .select($"o_custkey".as("key"), $"o_orderkey".as("version"),
        $"o_totalprice".as("amount"))
    // One arrival-batch index per row, computed once so `batch` and
    // `raw` are filters over the same deterministic column.
    def quartileOf: org.apache.spark.sql.Column = {
      val Array(q1, q2, q3) =
        history.stat.approxQuantile("version", Array(0.25, 0.5, 0.75), 0.001)
      when($"version" < q1, 0L)
        .when($"version" < q2, 1L).when($"version" < q3, 2L).otherwise(3L)
    }
    val arrive: org.apache.spark.sql.Column = arrival match {
      case "interleave" => pmod($"version", lit(4L))
      // Pure quartile order, NO deferral — the only arrival the plain
      // mergeHistory arm accepts (custkey 0 exists in this data, so
      // even trickle:10⁹ defers one key and the in-order guard raises).
      case "inorder" => quartileOf
      case s if s.startsWith("trickle:") =>
        val d = s.stripPrefix("trickle:").toLong
        require(d > 0, s"trickle denominator must be > 0: $d")
        // Late keys' earliest-quartile rows arrive in the LAST batch —
        // at fold 3 those keys (and only those) take the repair path.
        val q = quartileOf
        when(q === 0L && pmod($"key", lit(d)) === 0L, 3L).otherwise(q)
      case s if s.startsWith("lagshard:") =>
        // ONE LAGGING SHARD (r12, probe 19d): the late keys are exactly
        // the keys of raw-store bucket 0 under rawBucket(key, S) — the
        // same hash the pruned repair's IN-list recomputes, so with
        // pruned:S the repair fold names exactly ONE of S partitions.
        // This is the operationally-common late shape (one replication
        // slot / one source shard lagging) that probe 19c's UNIFORM
        // trickle structurally cannot show: there 15k spread keys
        // covered all 64 buckets and pruning was par by saturation.
        val sh = s.stripPrefix("lagshard:").toLong
        require(sh > 0, s"lagshard shard count must be > 0: $sh")
        val q = quartileOf
        when(q === 0L &&
          pmod(xxhash64($"key".cast("string")), lit(sh)) === 0L, 3L)
          .otherwise(q)
      case other => sys.error(s"unknown arrival mode: $other")
    }
    // `arrive` is a pure row function (quantile cuts are precomputed
    // literals), so batch/raw stay scan-pruned filters on the source —
    // nothing pinned, same as the r10 probe.
    val tagged = history.withColumn("__arrive", arrive)
    // `stored` mode: the fold base round-trips a parquet table per fold
    // (the warehouse shape — the detector's suspect filter pushes to the
    // scan). Once fold b+1's store is WRITTEN, fold b's files are dead
    // (the write materialized everything read from them), so the
    // previous dir is deleted immediately — at most two corpus-sized
    // copies ever coexist, not one per fold.
    var baseDirs = List.empty[String]
    def pin(df: org.apache.spark.sql.DataFrame) = mode match {
      case "stored" =>
        val d = java.nio.file.Files
          .createTempDirectory("graft_scd2_base").toString
        df.write.mode("overwrite").parquet(d)
        baseDirs.foreach(graft.util.FsUtil.deleteTree)
        baseDirs = List(d)
        spark.read.parquet(d)
      case "disk" => df.localCheckpoint(true, StorageLevel.DISK_ONLY)
      case _ => df.localCheckpoint()
    }
    // pruned mode: materialize the raw log ONCE as a kbucket-partitioned
    // store (what a warehouse's staged-batch log looks like on disk) and
    // fold through the partition-pruning repair. The write cost is
    // reported separately — it is the store's layout cost, not a fold's.
    val storedTagged = pruned.map { n =>
      val t0 = System.nanoTime()
      val rawDir = java.nio.file.Files
        .createTempDirectory("graft_rawstore_probe").toString
      tagged
        .withColumn("kbucket", graft.ops.Cdc.rawBucket(Seq("key"), n))
        .repartition(col("kbucket"))
        .write.mode("overwrite").partitionBy("kbucket").parquet(rawDir)
      println(f"""{"probe":"scd2","arrival":"$arrival","stage":"bucketed_write","nBuckets":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"mode":"$mode"}""")
      (spark.read.parquet(rawDir), rawDir)
    }
    val empty = graft.ops.Cdc.compressHistory(history.limit(0),
      Seq("key"), "version", Seq("amount"))
    var acc = empty
    // try/finally (r14, r13 ADVICE): a fold that throws (or a later
    // arm's failure) must not leak up to two corpus-sized temp dirs —
    // in stored mode baseDirs holds a full folded-base parquet copy,
    // and pruned mode holds the bucketed raw store.
    try {
      for (b <- 0L until 4L) {
        val t0 = System.nanoTime()
        val batch = tagged.filter($"__arrive" === b).drop("__arrive")
        acc = pin(storedTagged match {
          case _ if plain =>
            graft.ops.Cdc.mergeHistory(acc, batch,
              Seq("key"), "version", Seq("amount"))
          case Some((stored, _)) =>
            val raw = stored.filter($"__arrive" < b).drop("__arrive")
            graft.ops.Cdc.mergeHistoryWithLatePruned(acc, raw, batch,
              Seq("key"), "version", Seq("amount"), pruned.get)
          case None =>
            val raw = tagged.filter($"__arrive" < b).drop("__arrive")
            graft.ops.Cdc.mergeHistoryWithLate(acc, raw, batch,
              Seq("key"), "version", Seq("amount"))
        })
        val n = acc.count()
        val tag = pruned.map(n => s""","pruned":$n""").getOrElse("") +
          (if (plain) ""","op":"plain"""" else "")
        println(f"""{"probe":"scd2","arrival":"$arrival","fold":$b,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"mode":"$mode"$tag}""")
      }
    } finally {
      storedTagged.foreach { case (_, d) => graft.util.FsUtil.deleteTree(d) }
      baseDirs.foreach(graft.util.FsUtil.deleteTree)
    }
    spark.stop()
  }
}
