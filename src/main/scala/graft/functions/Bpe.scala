package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * vocabulary step of a training-data pipeline (Sennrich et al. 2016 /
  * the HF-tokenizers architecture), as opposed to [[TextFunctions
  * .bpeTokenCount]]'s fixed pre-tokenizer regex.
  *
  * The 100 TB shape is the standard two-phase one:
  *
  *   1. ONE corpus pass aggregates word frequencies — the only touch of
  *      corpus-scale data.
  *   2. Every merge iteration then runs on the WORD-TYPE table
  *      (vocabulary scale — millions of rows no matter how many
  *      petabytes of text). The table is vocabulary-scale BY
  *      CONSTRUCTION, so the shrink-then-solve tier proven in
  *      [[graft.dedup.Dedup.clusterPairs]] applies: when the type count
  *      fits `localTypeLimit`, collect it and run classic fast BPE
  *      driver-side (inverted index + lazy-deletion heap — one pass per
  *      merge over only the words containing the merged pair, the
  *      HF-tokenizers algorithm). A real 30k–100k-merge vocabulary is
  *      then 30k heap pops, not 30k Spark job sets. Above the limit the
  *      BATCHED distributed loop takes over (pair-count aggregate →
  *      top-k collect → safe-prefix batch of merges per rewrite pass,
  *      so k merges need k/|batch| job sets — see [[safePrefix]]'s
  *      equality argument); all tiers are pure functions of the corpus
  *      and produce IDENTICAL merge tables (tie-break below), which
  *      BpeSpec/LawsProps pin by running both.
  *
  * Determinism: ties in pair counts break lexicographically on (left,
  * right) in CODE-POINT order — Spark's string ordering is UTF-8 binary
  * order, which equals code-point order, NOT Java's UTF-16 `compareTo`
  * (they diverge on supplementary-plane characters) — so the merge
  * table is a pure function of the corpus: any run, partitioning,
  * tier, or engine reproduces it.
  */
object Bpe {

  /** Greedy left-to-right merge of adjacent (a, b) symbol pairs in one
    * symbol array — non-overlapping by construction: the merged symbol
    * replaces the pair atomically and (being strictly longer than `a`)
    * can never re-match as the left element of the same pair. Pure
    * column fold, codegen-friendly HOF — no UDF. */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, t) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && t === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(t))))

  /** UTF-8 binary string order == code-point order — the tie-break
    * Spark's `orderBy($"a".asc)` applies (UTF8String.compareTo), which
    * Java's UTF-16 `String.compareTo` does NOT match for supplementary-
    * plane characters (surrogates 0xD800–0xDFFF sort below 0xE000–0xFFFF
    * in UTF-16 but encode code points above all of the BMP). The driver
    * tier must break ties exactly like the distributed argmax. */
  private[graft] def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** One code point per symbol — matches the distributed initializer's
    * `substr(i, 1)` (Spark character positions are code points). */
  private def toCodePointSyms(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Greedy left-to-right non-overlapping rewrite — the driver-side twin
    * of [[mergePair]] (equality argued there: the merged symbol is
    * strictly longer than `a`, so it can never re-match in-pass). */
  private def mergeAll(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Classic fast BPE on a collected word-type frequency table — the
    * driver tier of [[train]]. Incremental pair maintenance: a merge
    * touches only the words that contain its pair (inverted index,
    * stale-tolerant), subtracting each touched word's old adjacent-pair
    * counts and adding the rewritten ones; the argmax is a lazy-deletion
    * max-heap (an entry is valid iff its count still matches — stale
    * entries from superseded updates pop and drop). O(merges · affected
    * words · word length) total, independent of corpus size. Pair counts
    * count OVERLAPPING adjacencies ("aaa" has two (a,a)s), exactly like
    * the distributed explode — greedy rewrite then merges
    * non-overlapping occurrences, on both tiers. */
  private[graft] def trainLocal(wordFreqs: Array[(String, Long)],
      numMerges: Int, minCount: Long): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val syms = mutable.ArrayBuffer.empty[Array[String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    wordFreqs.foreach { case (w, f) =>
      val s = toCodePointSyms(w)
      if (s.length >= 2) { syms += s; freqs += f }
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def bump(p: (String, String), d: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + d
      if (c == 0L) counts.remove(p) else counts(p) = c
    }
    for (wi <- syms.indices) {
      val s = syms(wi)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        bump(p, freqs(wi))
        occ.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        j += 1
      }
    }
    // Max-heap: count desc, then (left, right) asc in code-point order —
    // the distributed `orderBy($"cnt".desc, $"a".asc, $"b".asc)`.
    val ord: Ordering[(Long, String, String)] =
      (p: (Long, String, String), q: (Long, String, String)) => {
        val c = java.lang.Long.compare(p._1, q._1)
        if (c != 0) c
        else {
          val a = cpCompare(p._2, q._2)
          if (a != 0) -a else -cpCompare(p._3, q._3)
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    val merges =
      mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val top = heap.dequeue()
        if (counts.getOrElse((top._2, top._3), 0L) == top._1) best = top
      }
      if (best == null || best._1 < minCount) done = true
      else {
        val (cnt, a, b) = best
        merges += ((rank, a, b, a + b, cnt))
        val touched = mutable.HashSet.empty[(String, String)]
        occ.getOrElse((a, b), mutable.HashSet.empty).toArray.foreach { wi =>
          val s = syms(wi)
          // stale-tolerant: an earlier merge may have rewritten the pair
          // away; such a word's counts already reflect its current state.
          var has = false
          var j = 0
          while (!has && j < s.length - 1) {
            has = s(j) == a && s(j + 1) == b; j += 1
          }
          if (has) {
            var k = 0
            while (k < s.length - 1) {
              val p = (s(k), s(k + 1)); bump(p, -freqs(wi)); touched += p
              k += 1
            }
            val ns = mergeAll(s, a, b)
            syms(wi) = ns
            k = 0
            while (k < ns.length - 1) {
              val p = (ns(k), ns(k + 1)); bump(p, freqs(wi)); touched += p
              occ.getOrElseUpdate(p, mutable.HashSet.empty) += wi
              k += 1
            }
          }
        }
        touched.foreach { p =>
          counts.get(p).foreach(c => heap.enqueue((c, p._1, p._2)))
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Train `numMerges` BPE merges over the whitespace words of `textCol`.
    * Returns (rank, left, right, merged, pair_count) — rank 1 is the
    * first (most frequent) merge learned. Stops early when no adjacent
    * pair occurs at least `minCount` times.
    *
    * Tiering (the clusterPairs pattern): the word-TYPE table is
    * vocabulary-scale regardless of corpus size; when its cardinality is
    * ≤ `localTypeLimit` (default 4M types — a few hundred MB of driver
    * state, the standard tokenizer-training envelope) it is collected
    * ONCE and [[trainLocal]] solves all merges driver-side. Above the
    * limit the BATCHED distributed loop runs one job set per safe batch
    * of merges (not per merge — [[trainDistributed]]), with
    * localCheckpointed iteration state (k chained HOF rewrites would
    * otherwise stack k aggregate lambdas into one plan and codegen
    * super-linearly). Both tiers produce the identical merge table. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, localTypeLimit: Long = 4000000L): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // Phase 1 — the one corpus-scale pass: word-type frequencies,
    // pinned so the tier probe (count) and the chosen tier share it.
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .where($"w" =!= "" && $"w".isNotNull)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    if (words.count() <= localTypeLimit) {
      val collected = words.as[(String, Long)].collect()
      trainLocal(collected, numMerges, minCount)
        .toDF("rank", "left", "right", "merged", "pair_count")
    } else trainDistributed(words, numMerges, minCount)
  }

  /** Top-k candidates fetched per distributed iteration — bounds both
    * the collect (k small rows) and the largest possible batch. */
  private[graft] val DistributedBatchCandidates = 64

  /** BATCHED distributed merge loop (r8) — the tier for vocabularies too
    * large to collect. Instead of one job set per merge, each iteration
    * fetches the top-[[DistributedBatchCandidates]] pairs and applies
    * the longest SAFE prefix of them in ONE rewrite pass, so a k-merge
    * vocabulary needs k/|batch| job sets while producing the IDENTICAL
    * merge table the sequential argmax would (the tier-equality law in
    * LawsProps/BpeSpec runs THIS path via localTypeLimit = 0).
    *
    * Safe prefix, and why it preserves sequential semantics exactly:
    * accept candidates in (cnt desc, a asc, b asc) order while
    *
    *  1. SYMBOL-DISJOINT: the candidate's {left, right, merged} strings
    *     share no symbol with any earlier accepted candidate's set.
    *     Rewrites of disjoint pairs touch disjoint symbol positions, so
    *     applying them in one pass equals applying them sequentially,
    *     and no accepted pair's count is changed by another's rewrite.
    *  2. STRICTLY ABOVE THE HORIZON: every accepted count stays > the
    *     "horizon" = the count of the first rejected (symbol-sharing)
    *     candidate, or of the (k+1)-ranked fetch boundary when nothing
    *     in the fetched window was rejected. Any pair NOT in the
    *     accepted prefix that could beat a later accepted merge in the
    *     true sequential run — a symbol-sharing pair whose count a
    *     rewrite changes, or a NEW pair created by a rewrite (its count
    *     is bounded by its parent symbol-sharing pair's) — has count ≤
    *     that horizon, hence strictly below every accepted merge: the
    *     sequential argmax at step j provably picks accepted[j].
    *
    * The first candidate is always applied even when the safe prefix is
    * empty past it (rule 2 can trim to nothing on count ties at the
    * horizon) — that is exactly one sequential step, always sound — so
    * the loop can never stall. Iteration state stays localCheckpointed
    * (chained HOF rewrites would stack lambdas into one plan). */
  private[graft] def trainDistributed(words: DataFrame, numMerges: Int,
      minCount: Long, onBatch: Int => Unit = _ => ()): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var types = words.select($"freq",
      transform(sequence(lit(1), length($"w")), i => $"w".substr(i, lit(1)))
        .as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // Pair counts at vocabulary scale: explode adjacent symbol pairs,
      // weight by word frequency; fetch the top-k window.
      val fetch = DistributedBatchCandidates + 1
      val top = types
        .where(size($"syms") >= 2)
        .select($"freq", $"syms",
          explode(sequence(lit(1), size($"syms") - 1)).as("i"))
        .groupBy(element_at($"syms", $"i".cast("int")).as("a"),
          element_at($"syms", $"i".cast("int") + 1).as("b"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"a".asc, $"b".asc)
        .limit(fetch)
        .as[(String, String, Long)].collect()
      if (top.isEmpty || top.head._3 < minCount) done = true
      else {
        val prefix = safePrefix(top, fetch).take(numMerges - rank + 1)
        val batch = prefix.takeWhile(_._3 >= minCount)
        onBatch(batch.size) // probe hook: merges applied this job set
        batch.foreach { case (a, b, cnt) =>
          merges += ((rank, a, b, a + b, cnt)); rank += 1
        }
        // minCount stop: by the safety proof the sequential argmax at
        // the first trimmed step IS the trimmed candidate, whose count
        // is below the floor — sequential training would stop here.
        if (batch.size < prefix.size) done = true
        types = types
          .select($"freq", batch.foldLeft($"syms".as("syms")) {
            case (s, (a, b, _)) => mergePair(s, a, b)
          }.as("syms"))
          .localCheckpoint()
      }
    }
    merges.toSeq
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The safe batch prefix of a ranked candidate window (see
    * [[trainDistributed]]): symbol-disjoint prefix, trimmed strictly
    * above the first-rejection/window-boundary horizon; never empty —
    * falls back to the single top candidate (one sequential step). */
  private[graft] def safePrefix(top: Array[(String, String, Long)],
      fetch: Int): Seq[(String, String, Long)] = {
    val accepted = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    val used = scala.collection.mutable.HashSet.empty[String]
    var horizon = // nothing rejected yet: the fetch-window boundary
      if (top.length >= fetch) top.last._3 else Long.MinValue
    var i = 0
    var open = true
    while (open && i < math.min(top.length, fetch - 1)) {
      val (a, b, cnt) = top(i)
      if (!used(a) && !used(b) && !used(a + b)) {
        accepted += ((a, b, cnt))
        used += a; used += b; used += a + b
        i += 1
      } else { horizon = math.max(horizon, cnt); open = false }
    }
    val safe = accepted.takeWhile(_._3 > horizon)
    if (safe.nonEmpty) safe.toSeq else Seq(top.head)
  }

  /** Above this many merges [[segment]] switches from the chained-HOF
    * fold to the broadcast rank-map encoder: k chained `aggregate()`
    * lambdas build a k-deep Catalyst expression tree (plan/codegen cost
    * grows with the VOCABULARY — a 30k-merge table would be a 30k-deep
    * tree), while the encoder's plan is O(1) in k. */
  val HofMergeLimit: Int = 64

  /** Segment a word column with a trained merge table, applying merges
    * in learned rank order (the original subword-nmt apply scheme).
    *
    * Two implementations, switched on `merges.size` vs [[HofMergeLimit]]:
    * [[segmentChained]] (k folds inside one projection — SQL-traceable,
    * what the DuckDB oracle replays) for small tables, and
    * [[segmentEncoded]] (broadcast rank map, plan size independent of
    * k) for production-size vocabularies. On any well-formed TRAINED
    * table the two are identical (a merge's operand symbols always
    * originate from strictly earlier merges — guaranteed by training,
    * since a pair must EXIST to be counted — so rank-order application
    * equals lowest-rank-first encoding; BpeSpec pins the equivalence on
    * the fixture corpus and on a 1,000-merge table). A hand-built table
    * violating that invariant may diverge between the two — call one
    * explicitly to pin semantics. */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    if (merges.size <= HofMergeLimit) segmentChained(word, merges)
    else segmentEncoded(word, merges)

  /** The chained-HOF apply: k [[mergePair]] folds over the char array,
    * all inside one projection — distributed, per-row O(k·len) work, no
    * UDF, no state. Plan depth grows with k: use only for small merge
    * tables (see [[segment]]). The empty word is normalized to an empty
    * array up front (Spark's `sequence(1, 0)` descends to [1, 0], which
    * would yield a junk ["",""]), so both apply forms agree on EVERY
    * input — [[segment]]'s size-based dispatch can never flip a result
    * because a vocabulary crossed [[HofMergeLimit]]. */
  def segmentChained(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = when(length(word) === 0, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
    merges.foldLeft(chars) { case (syms, (a, b)) => mergePair(syms, a, b) }
  }

  private type MergeBc = org.apache.spark.broadcast.Broadcast[
    (Array[(String, String)], Map[(String, String), Int])]

  /** Broadcast handles memoized per (SparkContext, merge table): calling
    * [[segmentEncoded]] repeatedly with the same trained table — every
    * re-run of a registered query does — must not accumulate a new
    * multi-MB broadcast per call for the session's lifetime. Weak on the
    * context so a restarted session's stale handles are collectable.
    *
    * BOUNDED (r8): a long-lived session that RETRAINS periodically
    * yields a new distinct table per retrain; without eviction each
    * leaves a multi-MB broadcast pinned forever. Per context the map is
    * an access-order LRU of [[BcCacheSize]] tables whose evictees are
    * destroyed — eviction means the 9th distinct
    * vocabulary in one session, by which point no job still references
    * the oldest one (a query holds its broadcast only while its own
    * plan executes, and re-requesting an evicted table just re-broadcasts). */
  private[graft] val BcCacheSize = 8

  private val bcCache = new java.util.WeakHashMap[
    org.apache.spark.SparkContext,
    java.util.LinkedHashMap[Seq[(String, String)], MergeBc]]

  private def mergeBroadcast(merges: Seq[(String, String)]): MergeBc =
    bcCache.synchronized {
      val sc = SparkSession.active.sparkContext
      val perCtx = Option(bcCache.get(sc)).getOrElse {
        val m = new java.util.LinkedHashMap[Seq[(String, String)], MergeBc](
          16, 0.75f, /* accessOrder = */ true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[Seq[(String, String)], MergeBc]): Boolean =
            size() > BcCacheSize && {
              try e.getValue.destroy()
              catch { case _: Throwable => () } // already destroyed/stopped ctx
              true
            }
        }
        bcCache.put(sc, m); m
      }
      Option(perCtx.get(merges)).getOrElse {
        val bc = sc.broadcast((merges.toArray, merges.zipWithIndex.toMap))
        perCtx.put(merges, bc); bc
      }
    }

  /** The production apply: ONE broadcast of the (pair → rank) map and a
    * per-row lowest-rank-first encode ([[encodeWord]]'s order — equal to
    * rank-order application on trained tables, see [[segment]]). Per-word
    * cost is O(len²) worst-case in the word length and INDEPENDENT of
    * vocabulary size k — vs the chained form's O(k·len) work and k-deep
    * plan. A native Catalyst expression since r9
    * ([[graft.functions.expressions.BpeEncode]] — retires the repo's
    * last UDF): the loop is data-dependent iteration with early exit,
    * which no fold-shaped HOF expresses without paying k passes, so it
    * runs as one generated-code method call over the broadcast rank map
    * (memoized per table, [[mergeBroadcast]]) with no ScalaUDF converter
    * round-trips. Null word → null, empty word → empty array —
    * identical to [[segmentChained]] on every input. */
  def segmentEncoded(word: Column, merges: Seq[(String, String)]): Column = {
    val bc = mergeBroadcast(merges)
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.expressions.BpeEncode(
        org.apache.spark.sql.GraftSqlShim.expression(word), bc))
  }

  /** Encode one word with a learned merge table (driver-side reference
    * implementation, used by specs to validate round-trips): repeatedly
    * apply the LOWEST-rank merge whose pair is adjacent somewhere in the
    * current segmentation — the standard BPE encode order, which is what
    * makes encoding with a trained table reproduce training's
    * segmentation on the training corpus. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    encodeWithRanks(word, merges.toArray, merges.zipWithIndex.toMap)

  private[graft] def encodeWithRanks(word: String,
      merges: Array[(String, String)],
      rankOf: Map[(String, String), Int]): Seq[String] = {
    var syms = toCodePointSyms(word).toVector
    var continue = syms.size >= 2
    while (continue) {
      val candidates = syms.indices.dropRight(1)
        .flatMap(i => rankOf.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (candidates.isEmpty) continue = false
      else {
        val (r, _) = candidates.minBy(_._1)
        val (a, b) = merges(r)
        syms = mergeAll(syms.toArray, a, b).toVector
        continue = syms.size >= 2
      }
    }
    syms
  }
}
