package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram family, the second production tokenizer family
  * next to BPE): a piece vocabulary with log-probabilities, applied by
  * Viterbi max-likelihood segmentation. [[train]] is the SEED-VOCABULARY
  * step — pieces scored by corpus substring frequency (logp =
  * ln(count/total) over the selected vocabulary), exactly
  * SentencePiece's initialization. [[emRefine]] (r9) is one hard-EM
  * (Viterbi-EM) refinement round over the seed: E-step = Viterbi counts
  * at TYPE scale (each piece occurrence in a type's max-likelihood
  * segmentation, weighted by the type's corpus frequency), M-step =
  * renormalize ln(count/total). Hard EM is monotone — the M-step
  * maximizes the held segmentation's likelihood and re-segmentation
  * can only improve it — so the refined vocabulary's corpus Viterbi
  * log-likelihood never decreases (law-pinned in UnigramLmSpec). The
  * soft-EM variant (lattice forward-backward expected counts) remains
  * out of scope. Every step is engine-replayable: one ln per piece
  * rounded at 8, exact integer counts everywhere else.
  *
  * Scale shape: training is three aggregates — word-type counts
  * (vocabulary-scale, never instance-scale), substring counts over the
  * type table (|types| × L × P rows exploded, still vocabulary-scale),
  * and the top-V selection planned as TakeOrderedAndProject (never a
  * one-task window). Segmentation runs per word TYPE with the vocabulary
  * broadcast as ONE MapType literal (plan size O(1) in V), then joins
  * back by word; the Viterbi DP is two HOF folds per type — O(L·P)
  * score updates and an O(L) backtrace — inside whole-stage codegen.
  */
object UnigramLm {

  /** Words longer than this segment as a single whole-word piece (the
    * junk-token policy: at curation time an unbroken 100-char "word" is
    * noise, and a fixed cap is what lets the fixed-depth oracle replay
    * the DP). */
  val MaxWordLen = 16

  /** Train the seed vocabulary: all single characters (coverage
    * guarantee — every word stays segmentable) plus the top multi-char
    * substrings by (count desc, piece asc) up to `vocabSize` total.
    * Counts weigh each substring by its word's corpus frequency.
    * Returns (piece, cnt, logp) with logp = round8(ln(cnt / total)),
    * total = the selected vocabulary's count mass. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val types = wordTypes(docs, textCol)
    val subs = types.select(
      explode(substrings(col("word"), maxPieceLen)).as("piece"),
      col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    val singles = subs.filter(length(col("piece")) === 1)
    // |singles| = the corpus's distinct characters — counted from the
    // type table directly, NOT via singles.count(), which would execute
    // the full substring aggregate (the heaviest step) once for the
    // count and again for the vocab job. The two `subs` consumers below
    // share one exchange (ReusedExchange) inside the single vocab plan.
    val nSingles = types
      .select(explode(split(col("word"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .agg(countDistinct(col("ch"))).head.getLong(0)
    val multis = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(math.max(0, vocabSize - nSingles.toInt))
    val vocab = singles.unionByName(multis)
    val total = broadcast(vocab.agg(sum(col("cnt")).as("__total")))
    vocab.crossJoin(total)
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__total").cast("double")),
          8).as("logp"))
  }

  /** One hard-EM refinement round: segment every word type under
    * `vocab` ([[segmentTypes]]), count each piece's occurrences across
    * the best segmentations weighted by type frequency, renormalize.
    * Returns (piece, cnt, logp) — the [[train]] schema, so rounds
    * chain. Types longer than [[MaxWordLen]] pass through segmentation
    * whole (the junk-token policy) and are EXCLUDED from the counts: a
    * 100-char "word" must not enter the vocabulary as a piece. Pieces
    * the E-step never uses drop out (their Viterbi count is 0 and
    * ln(0) is undefined); every surviving word stays segmentable
    * because its own best path's pieces all survive. */
  def emRefine(docs: DataFrame, textCol: String,
      vocab: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val counts = segmentTypes(docs, textCol, vocab, maxPieceLen)
      .filter(length(col("word")) <= MaxWordLen)
      .select(explode(split(col("pieces"), " ")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    val total = broadcast(counts.agg(sum(col("cnt")).as("__total")))
    counts.crossJoin(total)
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__total").cast("double")),
          8).as("logp"))
  }

  /** Viterbi segmentation of every word TYPE in the corpus under the
    * trained vocabulary: (word, cnt, pieces, n_pieces) with `pieces`
    * the max-log-likelihood split joined by spaces. Ties break toward
    * the smallest last-piece start (candidates scan ascending start j,
    * replace only on strictly-greater score — i.e. the LONGEST last
    * piece wins a tie). Words longer than [[MaxWordLen]] pass through
    * as one whole piece (the junk-token policy that also fixes the
    * oracle's DP depth); characters outside the vocabulary take a
    * -1e9 penalty and surface as single-char pieces — unreachable on
    * the trained corpus itself (single-char coverage), the documented
    * fallback for cross-corpus application. */
  def segmentTypes(docs: DataFrame, textCol: String,
      vocab: Map[String, Double], maxPieceLen: Int): DataFrame = {
    require(vocab.nonEmpty, "vocabulary required")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val lp = typedLit(vocab) // ONE MapType literal — plan O(1) in |vocab|
    val types = wordTypes(docs, textCol)
    val w = col("word")
    val n = length(w)
    val P = lit(maxPieceLen)
    // best[k] (array element k, 0-based = word position k): struct
    // (s, b) — the max score of segmenting word[0, k) and the start of
    // its last piece. Filled left to right.
    val init = concat(
      array(struct(lit(0.0).as("s"), lit(-1).as("b"))),
      transform(sequence(lit(1), n),
        _ => struct(lit(-1e18).as("s"), lit(-1).as("b"))))
    val best = aggregate(
      sequence(lit(1), n), init,
      (acc, i) => transform(acc, (el, idx) =>
        when(idx === i,
          aggregate(
            sequence(greatest(lit(0), i - P), i - 1),
            struct(lit(-1e18).as("s"), lit(-1).as("b")),
            (cand, j) => {
              val piece = w.substr((j + 1).cast("int"), (i - j).cast("int"))
              // Unknown SINGLE chars take the -1e9 OOV penalty (the
              // char still becomes its own piece); unknown multi-char
              // pieces are infeasible — -1e18 absorbs any prefix score
              // in double arithmetic, so they never beat the sentinel.
              val oov = when(i - j === 1, lit(-1e9)).otherwise(lit(-1e18))
              val score = element_at(acc, (j + 1).cast("int"))
                .getField("s") +
                coalesce(element_at(lp, piece), oov)
              when(score > cand.getField("s"),
                struct(score.as("s"), j.cast("int").as("b"))).otherwise(cand)
            })).otherwise(el)))
    val withBest = types.withColumn("__best",
      when(n <= lit(MaxWordLen), best))
    // Backtrace: walk backpointers from n to 0, prepending each piece —
    // at most n steps, so folding over sequence(1, n) always reaches
    // position 0 (steps past it are no-ops).
    val bestC = col("__best")
    val walk = aggregate(
      sequence(lit(1), n),
      struct(n.cast("int").as("pos"), typedLit(Seq.empty[String]).as("parts")),
      (st, _) => {
        val pos = st.getField("pos")
        val bk = element_at(bestC, pos + 1).getField("b")
        when(pos > 0,
          struct(bk.as("pos"),
            concat(array(w.substr(bk + 1, pos - bk)), st.getField("parts"))
              .as("parts")))
          .otherwise(st)
      })
    withBest
      .withColumn("pieces",
        when(bestC.isNull, w)
          .otherwise(array_join(walk.getField("parts"), " ")))
      .withColumn("n_pieces",
        when(bestC.isNull, lit(1L))
          .otherwise(size(split(col("pieces"), " ")).cast("long")))
      .select(col("word"), col("cnt"), col("pieces"), col("n_pieces"))
  }

  /** Distinct whitespace word types with corpus frequencies — the
    * vocabulary-scale spine both training and segmentation run on. */
  private def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** All substrings of `word` with length 1..maxPieceLen, duplicates
    * included (a repeated substring inside one word counts each
    * occurrence — frequency semantics, matching the SQL replay). */
  private def substrings(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(0), length(word) - 1), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(word) - s)),
        l => word.substr(s + 1, l))))
}
