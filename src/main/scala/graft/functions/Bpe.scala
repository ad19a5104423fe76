package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
  *      petabytes of text), as (pair-count aggregate → one-row argmax →
  *      merge rewrite). The argmax collect is a single row per
  *      iteration; the rewrite is a fold over each word's symbol array
  *      (words are short — O(word-length) state, no corpus join).
  *
  * Determinism: ties in pair counts break lexicographically on (left,
  * right), so the merge table is a pure function of the corpus — any
  * run, partitioning, or engine reproduces it (the property the
  * spec's hand-computable corpus pins).
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

  /** Train `numMerges` BPE merges over the whitespace words of `textCol`.
    * Returns (rank, left, right, merged, pair_count) — rank 1 is the
    * first (most frequent) merge learned. Stops early when no adjacent
    * pair occurs at least `minCount` times.
    *
    * Iteration state is localCheckpointed: each rewrite references the
    * previous types table once, but k chained HOF rewrites would
    * otherwise stack k aggregate lambdas into one plan and codegen
    * super-linearly (the clusterPairs lesson, Dedup.scala). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // Phase 1 — the one corpus-scale pass: word-type frequencies.
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .where($"w" =!= "" && $"w".isNotNull)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    // Word types as symbol arrays (initially characters).
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
      // weight by word frequency.
      val best = types
        .where(size($"syms") >= 2)
        .select($"freq", $"syms",
          explode(sequence(lit(1), size($"syms") - 1)).as("i"))
        .groupBy(element_at($"syms", $"i".cast("int")).as("a"),
          element_at($"syms", $"i".cast("int") + 1).as("b"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"a".asc, $"b".asc)
        .limit(1)
        .as[(String, String, Long)].collect()
      best.headOption.filter(_._3 >= minCount) match {
        case None => done = true
        case Some((a, b, cnt)) =>
          merges += ((rank, a, b, a + b, cnt))
          types = types
            .select($"freq", mergePair($"syms", a, b).as("syms"))
            .localCheckpoint()
          rank += 1
      }
    }
    merges.toSeq
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Segment a word column with a trained merge table, applying merges
    * in learned rank order (the original subword-nmt apply scheme) — k
    * chained [[mergePair]] folds over the char array, all inside one
    * projection: distributed, per-row O(k·len) work, no UDF, no state.
    * On any well-formed trained table (a merge's operand symbols always
    * originate from strictly earlier merges — guaranteed by training,
    * since a pair must EXIST to be counted) rank-order application
    * equals the lowest-rank-first reference [[encodeWord]]; the
    * equivalence is spec-pinned against the fixture corpus. */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Encode one word with a learned merge table (driver-side reference
    * implementation, used by specs to validate round-trips): repeatedly
    * apply the LOWEST-rank merge whose pair is adjacent somewhere in the
    * current segmentation — the standard BPE encode order, which is what
    * makes encoding with a trained table reproduce training's
    * segmentation on the training corpus. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rankOf = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var continue = syms.size >= 2
    while (continue) {
      val candidates = syms.indices.dropRight(1)
        .flatMap(i => rankOf.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (candidates.isEmpty) continue = false
      else {
        val (r, _) = candidates.minBy(_._1)
        val (a, b) = merges(r)
        // merge every non-overlapping occurrence, left to right
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
        continue = syms.size >= 2
      }
    }
    syms
  }
}
