package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("compressHistory keeps change points with correct validity intervals") {
    val history = Seq(
      // key 1: value changes at v1, v3 (v2 is a no-op copy), v4 no-op
      (1L, 1, "a"), (1L, 2, "a"), (1L, 3, "b"), (1L, 4, "b"),
      // key 2: single version
      (2L, 1, "x"),
      // key 3: flip-flop — every version is a change
      (3L, 1, "p"), (3L, 2, "q"), (3L, 3, "p"),
    ).toDF("k", "v", "value")
    val got = Cdc.compressHistory(history, Seq("k"), "v", Seq("value"))
      .select($"k", $"value", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got === Seq(
      (1L, "a", 1, Some(3), false),
      (1L, "b", 3, None, true),
      (2L, "x", 1, None, true),
      (3L, "p", 1, Some(2), false),
      (3L, "q", 2, Some(3), false),
      (3L, "p", 3, None, true)))
  }

  test("null value transitions are change points (null-safe comparison)") {
    val history = Seq(
      (1L, 1, Some("a")), (1L, 2, None), (1L, 3, None), (1L, 4, Some("a")),
    ).toDF("k", "v", "value")
    val got = Cdc.compressHistory(history, Seq("k"), "v", Seq("value"))
      .select($"valid_from", $"value").as[(Int, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1, Some("a")), (2, None), (4, Some("a"))))
  }

  test("multi-column tracking: a change in ANY tracked column opens a version") {
    val history = Seq(
      (1L, 1, "a", 10), (1L, 2, "a", 20), (1L, 3, "b", 20),
    ).toDF("k", "v", "s", "n")
    val got = Cdc.compressHistory(history, Seq("k"), "v", Seq("s", "n"))
      .select($"valid_from").as[Int].collect().sorted.toSeq
    assert(got === Seq(1, 2, 3))
  }

  test("mergeHistory delta-fold == compressHistory on the whole history") {
    // Random-ish multi-key history, split into ts-ORDERED batches (the
    // in-order CDC precondition): folding each batch into the running
    // SCD2 table must equal compressing the whole history at once.
    val history = Seq(
      (1L, 1, "a"), (1L, 2, "a"), (1L, 3, "b"), (1L, 4, "b"), (1L, 9, "c"),
      (2L, 1, "x"), (2L, 6, "x"), (2L, 8, "y"),
      (3L, 2, "p"), (3L, 5, "q"), (3L, 7, "p"), (3L, 10, "p"),
      (4L, 6, null.asInstanceOf[String]), (4L, 7, "z"),
      (5L, 9, "only-in-last-batch"),
    ).toDF("k", "v", "value")
    val whole = Cdc.compressHistory(history, Seq("k"), "v", Seq("value"))
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    // Batches by version range — in-order per key by construction.
    val batches = Seq(
      history.filter($"v" <= 3),
      history.filter($"v" > 3 && $"v" <= 6),
      history.filter($"v" > 6 && $"v" <= 8),
      history.filter($"v" > 8))
    val empty = Cdc.compressHistory(history.limit(0), Seq("k"), "v",
      Seq("value"))
    val folded = batches.foldLeft(empty)(
        (acc, b) => Cdc.mergeHistory(acc, b, Seq("k"), "v", Seq("value")))
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(folded === whole)
    // An all-no-op batch leaves the table unchanged (idempotent fold).
    val noop = Seq((1L, 11, "c"), (2L, 11, "y")).toDF("k", "v", "value")
    val after = Cdc.mergeHistory(
        Cdc.compressHistory(history, Seq("k"), "v", Seq("value")),
        noop, Seq("k"), "v", Seq("value"))
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(after === whole)
  }

  test("mergeHistoryWithLate == whole-history compress under any interleaving") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val all = Seq(
      // key 1: the LOSSY-HISTORY TRAP — raw (1,a),(2,a),(4,b) compresses
      // to (1,a),(4,b); the late v=3 'b' must resurrect v=4's... no:
      // late (3,b) makes (4,b) a no-op but v=2's 'a' stays merged. The
      // inverse trap is key 2 below; key 1 exercises plain interleaving.
      (1L, 1, "a"), (1L, 2, "a"), (1L, 4, "b"), (1L, 3, "b"),
      // key 2: raw (1,a),(2,a),(4,b); late (3,c) arrives BETWEEN the
      // merged duplicates and the change — v=3:'c' splits them, so the
      // correct history needs... compress(raw ∪ late) = 1:a, 3:c, 4:b.
      // A repair reading only the COMPRESSED table would get the same
      // here; the true resurrect case is key 3.
      (2L, 1, "a"), (2L, 2, "a"), (2L, 4, "b"), (2L, 3, "c"),
      // key 3: THE RESURRECT CASE. raw (1,a),(2,a),(3,b) compresses to
      // (1,a),(3,b) — the (2,a) duplicate is DROPPED. A late (1'=v 15
      // ordering trick: use ts 1,2,3 with late 1.5 → integers: scale
      // ×10) — raw (10,a),(20,a),(30,b), late (15,b): true compress =
      // 10:a, 15:b, 20:a, 30:b — v=20's 'a' is a change point AGAIN.
      // Reading only the compressed table would yield 10:a,15:b,30:b →
      // wrong. This row set proves the operator reads the raw store.
      (3L, 10, "a"), (3L, 20, "a"), (3L, 30, "b"), (3L, 15, "b"),
      // key 4: purely in-order rows (the fast path) alongside the late
      // keys, plus key 5: brand-new in the last batch.
      (4L, 1, "x"), (4L, 2, "y"),
      (5L, 9, "new"),
    ).toDF("k", "v", "value")
    // Arrival: batches 1-2 carry the early versions in order; batch 3
    // carries the late rows (v interleaving below existing points) plus
    // the in-order and new-key rows.
    val arrived1 = all.filter(($"k" <= 3L && ($"v" === 1 || $"v" === 10)) ||
      ($"k" === 4L && $"v" === 1))
    val arrived2 = all.filter(($"k" <= 2L && ($"v" === 2 || $"v" === 4)) ||
      ($"k" === 3L && ($"v" === 20 || $"v" === 30)))
    val arrived3 = all.filter(($"k" <= 2L && $"v" === 3) ||
      ($"k" === 3L && $"v" === 15) ||
      ($"k" === 4L && $"v" === 2) || ($"k" === 5L))
    assert(arrived1.count() + arrived2.count() + arrived3.count()
      === all.count(), "arrival partition must cover every row exactly once")
    val empty = Cdc.compressHistory(all.limit(0), Seq("k"), "v", Seq("value"))
    val (_, folded) = Seq(arrived1, arrived2, arrived3)
      .foldLeft((all.limit(0), empty)) { case ((raw, acc), b) =>
        val next = Cdc.mergeHistoryWithLate(acc, raw, b,
          Seq("k"), "v", Seq("value")).localCheckpoint()
        (raw.unionByName(b).localCheckpoint(), next)
      }
    assert(rows(folded) ===
      rows(Cdc.compressHistory(all, Seq("k"), "v", Seq("value"))))
    // The resurrect key's repaired history has FOUR change points —
    // the one a compressed-table-only repair cannot produce.
    assert(rows(folded).count(_._1 == 3L) === 4)
    // No late rows at all ≡ plain mergeHistory (fast path only).
    val table = Cdc.compressHistory(
      Seq((7L, 1, "a")).toDF("k", "v", "value"), Seq("k"), "v", Seq("value"))
    val inOrderOnly = Seq((7L, 2, "b")).toDF("k", "v", "value")
    assert(rows(Cdc.mergeHistoryWithLate(table, all.limit(0), inOrderOnly,
        Seq("k"), "v", Seq("value"))) ===
      rows(Cdc.mergeHistory(table, inOrderOnly,
        Seq("k"), "v", Seq("value"))))
    // SUSPECTS-nonempty but no late key (r12): key 8's current
    // valid_from (5) sits at-or-above the batch min ts (2, key 7's
    // in-order row), so key 8 enters the min-ts detector's suspect
    // slice — but its own batch row (6) is in order, so the late-key
    // set is still empty and the fold must equal plain mergeHistory.
    // This drives the detector's second short-circuit branch, which
    // the all-suspects-empty case above never reaches.
    val table2 = Cdc.compressHistory(
      Seq((7L, 1, "a"), (8L, 5, "x")).toDF("k", "v", "value"),
      Seq("k"), "v", Seq("value"))
    val mixedInOrder = Seq((7L, 2, "b"), (8L, 6, "y")).toDF("k", "v", "value")
    assert(rows(Cdc.mergeHistoryWithLate(table2, all.limit(0), mixedInOrder,
        Seq("k"), "v", Seq("value"))) ===
      rows(Cdc.mergeHistory(table2, mixedInOrder,
        Seq("k"), "v", Seq("value"))))
  }

  test("mergeHistoryWithLatePruned == unpruned over a bucketed raw store (r11)") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    // Includes the resurrect shape (key 1) so the pruned path is proven
    // on the case that REQUIRES the raw store, plus an untouched key (3)
    // whose bucket must not be read.
    val raw = Seq(
      (1L, 10, "a"), (1L, 20, "a"), (1L, 30, "b"),
      (2L, 10, "p"), (2L, 20, "q"),
      (3L, 10, "x"), (3L, 20, "y"),
    ).toDF("k", "v", "value")
    val batch = Seq((1L, 15, "b"), (2L, 30, "r")).toDF("k", "v", "value")
    val existing = Cdc.compressHistory(raw, Seq("k"), "v", Seq("value"))
    val nBuckets = 8
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rawbucket").toString
    raw.withColumn("kbucket", Cdc.rawBucket(Seq("k"), nBuckets))
      .write.mode("overwrite").partitionBy("kbucket").parquet(dir)
    val stored = spark.read.parquet(dir)
    val pruned = Cdc.mergeHistoryWithLatePruned(existing, stored, batch,
      Seq("k"), "v", Seq("value"), nBuckets)
    assert(rows(pruned) === rows(Cdc.mergeHistoryWithLate(existing, raw,
      batch, Seq("k"), "v", Seq("value"))))
    // The raw read is PARTITION-pruned: its scan carries a kbucket
    // partition filter (the IN list of the late keys' buckets), so a
    // partitioned store reads only those directories.
    val planStr = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*kbucket"
      .r.findFirstIn(planStr).isDefined,
      s"expected a kbucket partition filter on the raw scan:\n$planStr")
    graft.util.FsUtil.deleteTree(dir)
  }

  test("mergeHistoryWithLatePruned raises on layout drift instead of corrupting (r12 advice)") {
    import org.apache.spark.sql.functions.{lit, pmod}
    // A store whose kbucket column disagrees with rawBucket(keyCols,
    // nBuckets) — every bucket shifted by one stands in for any
    // nBuckets / key-order / key-type drift between write and read.
    // Without the guard, the IN-list selects partitions holding OTHER
    // keys' rows, the late key's raw history is never read, and the
    // repair silently recompresses from batch rows alone (dropping the
    // resurrect change point). With it, the call fails loudly.
    val raw = Seq(
      (1L, 10, "a"), (1L, 20, "a"), (1L, 30, "b"),
      (2L, 10, "p"),
    ).toDF("k", "v", "value")
    val batch = Seq((1L, 15, "b")).toDF("k", "v", "value")
    val existing = Cdc.compressHistory(raw, Seq("k"), "v", Seq("value"))
    val nBuckets = 8
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rawbucket_drift").toString
    raw.withColumn("kbucket",
        pmod(Cdc.rawBucket(Seq("k"), nBuckets) + lit(1L), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("kbucket").parquet(dir)
    val stored = spark.read.parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Cdc.mergeHistoryWithLatePruned(existing, stored, batch,
        Seq("k"), "v", Seq("value"), nBuckets)
    }
    assert(e.getMessage.contains("layout"), e.getMessage)
    graft.util.FsUtil.deleteTree(dir)
  }

  test("mergeHistoryWithLatePruned saturation falls back to the plain scan (r12 advice)") {
    // Once the late keys' buckets cover >= half the store, the IN-list
    // prunes ~nothing while costing O(list) per partition (probe 19c's
    // saturation regime) — the operator must skip the filter and still
    // produce the unpruned result. nBuckets = 1 saturates with a single
    // late key, and the fallback path must not demand a layout match
    // (no pruning ⇒ no layout risk), so this also pins that the r12
    // guard stays OUT of the saturated plan.
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val raw = Seq(
      (1L, 10, "a"), (1L, 20, "a"), (1L, 30, "b"),
      (2L, 10, "p"), (2L, 20, "q"),
    ).toDF("k", "v", "value")
    val batch = Seq((1L, 15, "b")).toDF("k", "v", "value")
    val existing = Cdc.compressHistory(raw, Seq("k"), "v", Seq("value"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rawbucket_sat").toString
    raw.withColumn("kbucket", Cdc.rawBucket(Seq("k"), 1))
      .write.mode("overwrite").partitionBy("kbucket").parquet(dir)
    val stored = spark.read.parquet(dir)
    val pruned = Cdc.mergeHistoryWithLatePruned(existing, stored, batch,
      Seq("k"), "v", Seq("value"), 1)
    assert(rows(pruned) === rows(Cdc.mergeHistoryWithLate(existing, raw,
      batch, Seq("k"), "v", Seq("value"))))
    // Saturated ⇒ no kbucket partition filter anywhere in the plan.
    val planStr = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*kbucket".r.findFirstIn(planStr).isEmpty,
      s"saturated fallback must not carry a kbucket partition filter:\n$planStr")
    graft.util.FsUtil.deleteTree(dir)
  }

  test("mergeHistory raises loudly on an out-of-order batch row") {
    // Contract guard (r9 verdict): a batch ts at-or-before the key's
    // current valid_from must FAIL the job, not silently corrupt
    // intervals. Both the strictly-earlier and the equal-ts cases raise;
    // the guard fires even when the offending row is a value no-op
    // (i.e. it would not have been a change point).
    // OPTIMIZER-ORDERING CANARY (r10 advice): the no-op case is the one
    // a guard evaluated AFTER the change predicate would miss — the row
    // is dropped as a non-change before the assert fires. The guard is
    // structurally the CaseWhen condition over the change predicate
    // (Cdc.mergeHistory), but if a future Spark version finds a way to
    // evaluate the branch first, THIS test is what goes red.
    val table = Cdc.compressHistory(
      Seq((1L, 5, "a"), (2L, 3, "x")).toDF("k", "v", "value"),
      Seq("k"), "v", Seq("value"))
    for (bad <- Seq(
        Seq((1L, 4, "b")),   // strictly before current valid_from
        Seq((1L, 5, "b")),   // ties current valid_from
        Seq((2L, 2, "x")))) { // no-op value, still out of order
      val e = intercept[Exception] {
        Cdc.mergeHistory(table, bad.toDF("k", "v", "value"),
          Seq("k"), "v", Seq("value")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("out-of-order")), s"for batch $bad")
    }
    // Strictly-later rows on the same keys still fold fine.
    val ok = Cdc.mergeHistory(table,
      Seq((1L, 6, "b"), (2L, 4, "x")).toDF("k", "v", "value"),
      Seq("k"), "v", Seq("value"))
    assert(ok.filter($"is_current").count() === 2L)
  }

  test("mergeHistory raises loudly on null batch keys (out of contract)") {
    val table = Cdc.compressHistory(
      Seq((1L, 1, "a")).toDF("k", "v", "value"), Seq("k"), "v", Seq("value"))
    val bad = Seq((Option.empty[Long], 2, "b")).toDF("k", "v", "value")
    val e = intercept[Exception] {
      Cdc.mergeHistory(table, bad, Seq("k"), "v", Seq("value")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null key")))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
    ).toDF("k", "s", "x")
    val neu = Seq(
      (1L, "a", 10.0),  // unchanged -> no row
      (2L, "B", 20.0),  // changed (first col)
      (3L, "c", 31.0),  // changed (second col)
      (5L, "e", 50.0),  // added; 4 removed
    ).toDF("k", "s", "x")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s", "x"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("snapshotDiff null-distinct encoding: null vs empty string differ") {
    val old = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("k", "s")
    val neu = Seq((1L, Option("")), (2L, Option.empty[String])).toDF("k", "s")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "changed"), (2L, "changed")))
  }

  test("snapshotDiff column boundaries do not alias ('ab','c') vs ('a','bc')") {
    val old = Seq((1L, "ab", "c")).toDF("k", "s1", "s2")
    val neu = Seq((1L, "a", "bc")).toDF("k", "s1", "s2")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s1", "s2"))
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "changed")))
  }

  test("snapshotDiff identical snapshots diff to nothing; payload never joins") {
    val snap = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "x")
    assert(Cdc.snapshotDiff(snap, snap, Seq("k"), Seq("s", "x")).count() === 0)
    // Scale pin: the join's inputs carry only (key, digest) — the
    // tracked payload columns are projected away BELOW the exchange.
    val plan = Cdc.snapshotDiff(snap, snap, Seq("k"), Seq("s", "x"))
      .queryExecution.executedPlan.toString
    val joinLine = plan.linesIterator.find(_.contains("Join")).get
    assert(!joinLine.contains("s#") && !joinLine.contains("x#"), joinLine)
  }
}
