package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: turn a full per-key version history
  * into SCD-type-2 validity intervals — keep only CHANGE POINTS (rows
  * whose tracked values differ from the key's previous version) and
  * stamp each with [valid_from, valid_to) plus an is_current flag. The
  * natural companion to the reference's MERGE loads (SURVEY §2.4): MERGE
  * keeps last-writer-wins snapshots, this keeps the queryable history a
  * warehouse derives from the same staged batches.
  *
  * Scale shape: two windows over the SAME (key, ts) partitioning — one
  * exchange, partitioned by the (high-cardinality) key, each partition
  * bounded by a key's version count. Change detection is null-safe
  * struct equality (`<=>`), so NULL→value and value→NULL transitions
  * count as changes and multi-column tracking needs no special-casing. */
object Cdc {

  /** One row per change point: all of `df`'s columns are preserved via
    * the tracked struct, output is (keyCols*, valueCols*, valid_from,
    * valid_to, is_current) with valid_to = the NEXT change's `tsCol`
    * (null while current). `tsCol` must be unique per key (a version
    * number or event timestamp). */
  def compressHistory(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val tracked: Column = struct(valueCols.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(tracked, 1).over(w))
      // First version (null prev) is always a change point; <=> makes
      // value-null transitions compare deterministically.
      .filter(col("__prev").isNull || !(col("__prev") <=> tracked))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Incremental SCD2 maintenance — the foreachBatch form of
    * [[compressHistory]]: fold a NEW batch of raw versions into an
    * existing SCD2 table (the [[compressHistory]] output schema) touching
    * only the batch's keys. PRECONDITION (the standard CDC in-order
    * contract): every batch row's `tsCol` exceeds every existing version
    * of its key — change points only ever append, so comparing the batch
    * against the key's CURRENT row suffices and the fold provably equals
    * re-compressing the whole history (law-pinned in CdcSpec). Late
    * (interleaving) versions need the batch re-unioned with raw history
    * — out of scope here by contract, like every delta-fold in this
    * module. The contract is ENFORCED, not trusted (r9 verdict): a batch
    * row with `tsCol` ≤ its key's current `valid_from` raises at
    * execution time (guard inlined in the change filter, so it runs on
    * every batch row and cannot be pruned) instead of silently
    * producing corrupt intervals. Null keys are likewise out of the
    * fold contract and raise — the equi-joins here are not null-safe,
    * so a null-key row could never be matched or closed (the same
    * explicit null-id policy as Dedup.clusterPairs);
    * [[compressHistory]] over the full history handles null keys fine
    * (its window treats them as one key).
    *
    * Scale shape: O(batch) — one window over the batch (its own keys),
    * one join of the CURRENT-row index against the batch's first change
    * points. Untouched keys' rows pass through by construction
    * (`existing` is unioned back, minus the closed current rows, so the
    * 100 TB history table is never rewritten beyond the touched rows —
    * with the table partitioned by is_current, the scan prunes to the
    * current partition). */
  def mergeHistory(existing: DataFrame, batch: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val keys = keyCols.map(col)
    val tracked: Column = struct(valueCols.map(col): _*)
    // Current row per touched key, as (keys*, tracked struct) — the only
    // piece of existing history the fold reads.
    val cur = existing.filter(col("is_current"))
      .join(batch.select(keys: _*).distinct(), keyCols, "left_semi")
      .select(keyCols.map(col) :+ tracked.as("__cur") :+
        col("valid_from").as("__cur_from"): _*)
    // Compress the batch internally (per-key window), seeded with the
    // key's current value: the first batch change point exists iff it
    // differs from the CURRENT tracked struct (or the key is new).
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    // Contract guards ride INSIDE the change filter: a standalone
    // projected guard column would be pruned (nothing consumes it), but
    // a filter predicate evaluates on EVERY input row — including rows
    // the change predicate then drops — so a null key or an
    // out-of-order ts anywhere in the batch fails the job loudly.
    // STRUCTURAL ordering (r11): the guards are the CONDITION of a
    // CaseWhen whose branch is the change predicate, not left-to-right
    // And-conjuncts — Catalyst rules may split or reorder conjuncts of
    // one Filter (e.g. push the cheaper predicate first), which would
    // let an out-of-order no-op row be dropped before its guard fired;
    // no rule evaluates a CaseWhen branch before its condition. The
    // guards always yield true or raise, so when(guards, pred) ≡ pred
    // for every surviving row. CdcSpec's no-op-value test is the canary.
    val keyNonNull = keys.map(_.isNotNull).reduce(_ && _)
    val inOrder = col("__cur_from").isNull || col(tsCol) > col("__cur_from")
    val guards =
      coalesce(assert_true(keyNonNull, lit(
        "Cdc.mergeHistory: null key in batch — null keys are out of " +
        "the incremental-fold contract; compress the full history " +
        "with compressHistory instead")), lit(true)) &&
      coalesce(assert_true(inOrder, concat(lit(
        "Cdc.mergeHistory: out-of-order batch row (" + tsCol +
        " <= the key's current valid_from) at ts="),
        col(tsCol).cast("string"), lit(" vs valid_from="),
        col("__cur_from").cast("string"))), lit(true))
    val changes = batch
      .withColumn("__prev", lag(tracked, 1).over(w))
      .join(cur, keyCols, "left")
      .filter(when(guards,
        when(col("__prev").isNotNull, !(col("__prev") <=> tracked))
          .otherwise(col("__cur_from").isNull || !(col("__cur") <=> tracked))))
    val newRows = changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
    // Close the previously-current row of every key that gained a change
    // point: valid_to = the key's FIRST new change ts.
    val firstNew = newRows
      .groupBy(keys: _*).agg(min(col("valid_from")).as("__first_new"))
    val updatedExisting = existing
      .join(firstNew, keyCols, "left")
      .withColumn("valid_to",
        when(col("is_current") && col("__first_new").isNotNull,
          col("__first_new")).otherwise(col("valid_to")))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__first_new")
    updatedExisting.unionByName(newRows)
  }

  /** [[mergeHistory]] with OUT-OF-ORDER REPAIR (r10) — closes the
    * documented gap in the incremental fold: a batch may now contain
    * LATE rows (ts at or before a key's current `valid_from`), and the
    * fold stays correct by splitting per KEY:
    *
    *  - keys whose batch rows are all strictly in order take the
    *    O(batch) [[mergeHistory]] fast path — the raw store is never
    *    scanned for them;
    *  - keys with ANY late row are REPAIRED: their rows are pulled from
    *    the RAW version store (semi-join on the late keys only —
    *    partition-prunable), re-unioned with their batch rows, and
    *    recompressed with [[compressHistory]]; the repaired intervals
    *    replace those keys' rows wholesale.
    *
    * The raw store is REQUIRED, not an optimization: SCD2 history is
    * lossy — [[compressHistory]] drops raw versions equal to their
    * predecessor, and a late interleaving row can RESURRECT one as a
    * change point (raw (t1,a),(t2,a),(t3,b) compresses to (t1,a),(t3,b);
    * a late (t1.5,b) makes t2's `a` a change point again — invisible to
    * any repair that reads only the compressed table). Spec-pinned in
    * CdcSpec with exactly that shape.
    *
    * CONTRACT: `existing` == compressHistory(`raw`) per key (the
    * maintained SCD2 table over the raw version log — the warehouse
    * appends each staged batch to `raw` after folding it, the staging
    * lifecycle the reference already keeps); (keyCols, tsCol) unique
    * across `raw` ∪ `batch` (the [[compressHistory]] tie-free order
    * contract — a replayed duplicate version is upstream dedup's job);
    * null keys raise, as in [[mergeHistory]].
    *
    * Scale shape: O(batch) for the split + in-order fold, plus
    * O(late keys' raw rows) for the repair — late keys are typically a
    * trickle, and the raw scan is a left-semi join on them, so the
    * 100 TB raw log is read only where it must be. MEASURED (SCALING.md
    * probe 19, 15M-row history at the 8 g contract heap): the late term
    * is below the run-to-run noise floor at every trickle fraction
    * (0.1% / 1% / 10% late all land in the 51–90 s band the 0%-late
    * baseline itself spans), and the everything-late arrival stays in
    * the same band — what the operator DOES cost is a fixed ~2.5–3×
    * per-fold premium over plain [[mergeHistory]] (22.3 s same corpus)
    * for the split machinery itself, paid regardless of late volume.
    * Since r11 (probe 19b) a fold whose batch carries NO late key
    * short-circuits to the [[mergeHistory]] plan after one driver-side
    * emptiness probe on the batch-scoped late-key set, so a
    * mostly-in-order source pays the premium only on the folds that
    * need the repair; since r12 (probe 19e) the detection itself is
    * one batch min-ts aggregate plus a join against the `valid_from >=
    * batchMin` slice of the current rows — empty-to-tiny under an
    * in-order source — instead of a batch-keys current-row
    * reconstruction, closing most of the detection floor probe 19b
    * left (the restriction is exact: late ⇒ cur_from ≥ ts ≥ batchMin). NOTE the API consequence: the call is EAGER — it
    * materializes the late-key set (and with it the batch/existing
    * split joins) at CALL time to pick the plan, so this is a
    * fold-step operator for foreachBatch-style sinks, not a lazy plan
    * builder; the split is frozen from the inputs' call-time contents
    * (re-reading a mutated source at execution time would route a new
    * late row down the in-order path and trip its guard). Prefer
    * [[mergeHistory]] when the source CONTRACTS
    * in-order delivery (it raises on violation rather than repairing);
    * at 100 TB, partition the raw store by key bucket so the late-key
    * semi-join prunes instead of scanning. */
  def mergeHistoryWithLate(existing: DataFrame, raw: DataFrame,
      batch: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame =
    mergeHistoryWithLateImpl(existing, batch, keyCols, tsCol,
      valueCols)(_ => raw)

  /** Deterministic key-bucket column for laying the raw version log out
    * as a PARTITIONED store: `pmod(xxhash64(keys), nBuckets)`. Write the
    * log once with
    * `raw.withColumn("kbucket", Cdc.rawBucket(keyCols, n))
    *   .repartition(col("kbucket")).write.partitionBy("kbucket")` (the
    * repartition keeps each bucket to one writer — without it every
    * write task emits a file per bucket and the store shatters into
    * tasks×buckets small files) and the late-repair path
    * ([[mergeHistoryWithLatePruned]]) turns its raw scan into a
    * partition-pruned read of only the late keys' buckets — the
    * mechanism SCALING.md probe 19 named as the unpruned scan's floor.
    * Size `nBuckets` well ABOVE the expected late keys per fold: the
    * prune reads every bucket the IN-list names, so uniformly-spread
    * late keys cover all buckets once their count nears `nBuckets`
    * (probe 19c measures exactly that saturation); operationally, late
    * data usually clusters (one lagging shard/source), which is where
    * the layout pays regardless of the count. */
  def rawBucket(keyCols: Seq[String], nBuckets: Int): Column = {
    require(keyCols.nonEmpty, "keys required")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // Keys are hashed through a canonical STRING cast: xxhash64 is
    // TYPE-sensitive (long 5 and int 5 hash differently), and the
    // store's buckets are computed at write time while the probe side
    // is computed from a later batch's lateKeys — a type drift between
    // the two (int vs long key after a schema evolution) would
    // otherwise build a wrong IN-list and silently select the wrong
    // partitions (the repair would then rebuild late keys from batch
    // rows alone). The cast makes all integer-typed keys agree; the
    // residual contract (don't flip a key between, say, decimal
    // scales across writes) is documented rather than checkable here.
    pmod(xxhash64(keyCols.map(c => col(c).cast("string")): _*),
      lit(nBuckets.toLong))
  }

  /** [[mergeHistoryWithLate]] against a KEY-BUCKETED raw store: `raw`
    * must carry `bucketCol` == [[rawBucket]](keyCols, nBuckets) — the
    * partition column of the stored log. The repair path computes the
    * late keys' distinct buckets (a driver-side collect bounded by
    * min(nBuckets, |late keys|)) and filters the raw scan on them
    * BEFORE the semi-join, so a partitioned parquet/table source prunes
    * to the late buckets statically — the 100 TB raw log is READ, not
    * just joined, proportionally to the late keys. Results are
    * identical to [[mergeHistoryWithLate]] (every late key's rows live
    * in its bucket, and the semi-join still scopes exactly; law-pinned
    * in CdcSpec).
    *
    * Two r12 hardenings (ADVICE):
    *
    *  - SATURATION FALLBACK: once the late keys' bucket list covers at
    *    least HALF the store (`buckets * 2 >= nBuckets` — the regime
    *    probe 19c measured at par with the plain scan, where the filter
    *    prunes a shrinking remainder), or exceeds [[inListMax]]
    *    literals (a plan-size bound only: Catalyst converts the list to
    *    an O(1)-lookup InSet, but a six-figure literal array still
    *    bloats every plan string and broadcast), the operator SKIPS the
    *    filter and lets the semi-join scope alone, exactly
    *    [[mergeHistoryWithLate]]'s plan. Note the cap deliberately sits
    *    high: a 10^6-bucket store with a few thousand late buckets is
    *    exactly where pruning pays 100×, and falling back there would
    *    de-optimize the regime the layout exists for.
    *  - LAYOUT GUARD: a caller whose `nBuckets` (or key order/type)
    *    differs from the write-time [[rawBucket]] layout would build an
    *    IN-list that selects the WRONG partitions; the late-key
    *    semi-join would then find no raw rows and the repair would
    *    silently recompress from batch rows alone, dropping resurrect
    *    change points. Before replacing any history, the pruned slice
    *    is checked to contain >= 1 raw row for EVERY late key — by the
    *    operator's own contract (`existing` == compressHistory(raw)) a
    *    late key always has raw versions, and a key's rows all live in
    *    ONE bucket, so presence of any row proves the key's whole
    *    history was read. The check is one count over the pruned slice
    *    (late-proportional when the layout is right, near-empty when it
    *    is wrong) and raises instead of corrupting; it is skipped in
    *    the saturation regime, where no pruning happens and the
    *    unpruned semantics need no layout at all. */
  def mergeHistoryWithLatePruned(existing: DataFrame, raw: DataFrame,
      batch: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], nBuckets: Int,
      bucketCol: String = "kbucket"): DataFrame = {
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"nBuckets must be in (0, 2^20]: $nBuckets")
    require(raw.columns.contains(bucketCol),
      s"raw store must carry its partition column '$bucketCol' " +
        s"(write it with rawBucket(keyCols, $nBuckets))")
    mergeHistoryWithLateImpl(existing, batch, keyCols, tsCol,
      valueCols) { lateKeys =>
      val buckets = lateKeys
        .select(rawBucket(keyCols, nBuckets).as("__b")).distinct()
        .collect().map(_.getLong(0))
      if (buckets.length > inListMax || buckets.length.toLong * 2 >= nBuckets) {
        raw.drop(bucketCol)
      } else {
        val pruned = raw.filter(col(bucketCol).isin(buckets: _*))
        val missing = lateKeys.join(
          pruned.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti").count()
        require(missing == 0L,
          s"mergeHistoryWithLatePruned: $missing late key(s) have no rows " +
            s"in the pruned raw slice — the store's $bucketCol layout does " +
            s"not match rawBucket(${keyCols.mkString(",")}, $nBuckets) " +
            "(nBuckets or key order/type drift between write and read), " +
            "or the raw log is missing history the SCD2 table implies")
        pruned.drop(bucketCol)
      }
    }
  }

  /** IN-list size ceiling for [[mergeHistoryWithLatePruned]]'s bucket
    * filter — a PLAN-SIZE bound, not an evaluation-cost one (Catalyst
    * rewrites large IN lists to a hashed InSet, so per-row/partition
    * cost is O(1) regardless of length; what grows is the literal
    * array carried in every plan copy). 2^17 keeps the worst plan
    * payload ~1 MB of longs while never binding below half-saturation
    * for any store up to the 2^18-bucket scale — far above the sizing
    * guidance (probe 19c: size nBuckets to the expected late-key
    * regime; the 4096-dir layout already cost 441 s to write). */
  private val inListMax = 1 << 17

  private def mergeHistoryWithLateImpl(existing: DataFrame,
      batch: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String])(
      rawForLate: DataFrame => DataFrame): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val keys = keyCols.map(col)
    val versionCols = (keyCols ++ valueCols).map(col) :+ col(tsCol)
    // A key is LATE iff ANY of its batch rows sits at or before its
    // current valid_from: one late row invalidates the whole key's
    // incremental fold, so the split is per key, not per row. New keys
    // (no current row) are never late.
    //
    // DETECTOR (r12, SCALING.md probe 19e — r11 verdict #3): a key can
    // be late only if its current `valid_from` is AT OR ABOVE the
    // batch's minimum ts (late needs ts <= valid_from and every batch
    // ts >= min). So instead of reconstructing the batch keys'
    // current-row slice (distinct batch keys + semi-join + wide join —
    // a per-fold corpus-history cost paid even when nothing is late),
    // take one cheap aggregate on the batch and join it against the
    // SUSPECT slice of the current rows — `valid_from >= batchMin` —
    // which under a mostly-in-order source is empty or tiny (the
    // batch's min ts exceeds every historical change point), so the
    // join broadcasts a near-empty side. The restriction is EXACT, not
    // a heuristic: late ⇒ cur_from >= ts >= batchMin ⇒ suspect.
    val batchMinTs = batch.agg(min(col(tsCol))).head.get(0)
    if (batchMinTs == null) // empty (or all-null-ts) batch: nothing is late
      return mergeHistory(existing, batch, keyCols, tsCol, valueCols)
    val suspects = existing
      .filter(col("is_current") && col("valid_from") >= lit(batchMinTs))
      .select(keyCols.map(col) :+ col("valid_from").as("__cur_from"): _*)
    // EMPTY-SUSPECTS short-circuit (probe 19e): under in-order delivery
    // the suspect slice is empty on EVERY fold, so checking it first
    // skips the batch join, the distinct, and the late-key pin job
    // outright — the whole detection is then the batch aggregate plus
    // this one filtered pass over the current rows. A fold that does
    // carry suspects pays one extra isEmpty probe on the (small) slice.
    if (suspects.isEmpty)
      return mergeHistory(existing, batch, keyCols, tsCol, valueCols)
    // Pinned (eager, batch-scoped — at most the batch's distinct keys,
    // the "batch-sized diamond pin" class of the probe-16 rule): FOUR
    // plan branches read lateKeys below, and the pin also lets the
    // fold's shape be decided by the data it actually carries.
    val lateKeys = batch.join(suspects, keyCols, "inner")
      .filter(col(tsCol) <= col("__cur_from"))
      .select(keys: _*).distinct()
      .localCheckpoint(true)
    // SHORT-CIRCUIT (r11, SCALING.md probe 19b): probe 19 measured the
    // repair machinery at a fixed ~2.5-3x per-fold premium over plain
    // mergeHistory even with ZERO late rows — the split joins, the
    // raw-log scan, and the replacement anti-join all execute for
    // nothing. A fold whose batch is entirely in order (the common case
    // under a mostly-in-order source) now pays one driver-side
    // emptiness probe on the pinned batch-scoped key set and takes the
    // mergeHistory plan outright. Data-dependent planning is fine here:
    // the operator's home is a foreachBatch fold, where each micro-batch
    // plans independently anyway.
    if (lateKeys.isEmpty)
      return mergeHistory(existing, batch, keyCols, tsCol, valueCols)
    val inOrder = batch.join(lateKeys, keyCols, "left_anti")
    val lateBatch = batch.join(lateKeys, keyCols, "left_semi")
    // Fast path: the incremental fold (its in-order guard now holds by
    // construction). Late keys' existing rows ride through unchanged...
    val base = mergeHistory(existing, inOrder, keyCols, tsCol, valueCols)
    // ...and are REPLACED by the recompress of raw ∪ batch, scoped to
    // the late keys. `rawForLate` lets the bucketed variant prune the
    // raw SCAN to the late keys' partitions before this semi-join.
    val lateAll = rawForLate(lateKeys).join(lateKeys, keyCols, "left_semi")
      .select(versionCols: _*)
      .unionByName(lateBatch.select(versionCols: _*))
    val repaired = compressHistory(lateAll, keyCols, tsCol, valueCols)
    base.join(lateKeys, keyCols, "left_anti").unionByName(repaired)
  }

  /** Keyed diff of two snapshots of the same table: one row per key whose
    * membership or tracked values differ, `change` ∈
    * 'added' (key only in `newSnap`) | 'removed' (only in `oldSnap`) |
    * 'changed' (in both, some `compareCols` value differs). Unchanged
    * keys emit nothing. The load-validation companion to the MERGE
    * snapshot loads (SURVEY §2.4) and [[compressHistory]]: MERGE applies
    * a batch, this AUDITS what a batch did — or reconciles two
    * independently-built copies of a table.
    *
    * Scale shape: each side collapses to (key, 128-bit digest) IN ITS
    * SCAN PROJECTION — the tracked payload never enters the exchange, so
    * the full-outer join moves ~24 bytes/row regardless of row width,
    * and with both snapshots bucketed by key even that exchange
    * disappears. The digest is md5 over a null-distinct encoding
    * (per-column null sentinel + field separator, both ASCII control
    * chars); change detection compares digests WITHIN one engine, so it
    * needs the encoding to be injective, not canonical across engines.
    *
    * `keyCols` must be a non-null primary key of each snapshot:
    * duplicate keys would cross-match in the join and null keys never
    * equi-join (each side's null-key rows would read as added+removed).
    * Values containing the separator/sentinel control characters (0x1e,
    * 0x1f) could alias across column boundaries — absent by construction
    * in machine-generated keys/measures, the caller's contract for
    * free-text columns. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "keys and compare columns required")
    def digested(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u001f", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u001e"))): _*)).as(as): _*)
    digested(oldSnap, "__od")
      .join(digested(newSnap, "__nd"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__od").isNull, "added")
          .when(col("__nd").isNull, "removed")
          .when(col("__od") =!= col("__nd"), "changed"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
