package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Within-document repetition signals — the OTHER half of the Gopher
  * quality suite (Rae et al. 2021 §A1.1): a document whose mass
  * concentrates in a few repeated n-grams or repeated lines is
  * boilerplate/spam even when its length and stopword statistics look
  * healthy. Three signals per document:
  *
  *  - `top_bigram_frac`: instances of the MOST FREQUENT bigram / all
  *    bigram instances (Gopher's top-2-gram coverage);
  *  - `dup_trigram_frac`: instances of trigrams occurring ≥ 2 times /
  *    all trigram instances (duplicate-n-gram coverage);
  *  - `dup_chunk_frac`: same over fixed 10-token chunks — the
  *    duplicate-LINE fraction for corpora without newlines (the
  *    [[graft.dedup.Dedup.tokenChunks]] convention).
  *
  * Null fractions (too few tokens to form the unit) keep the document:
  * no evidence is not evidence of spam. That policy is TOTAL (r8):
  * null-text documents — which produce no grams at all — still get a
  * row (null fractions, every rule true, keep=true) via a union of the
  * filtered subset, so a caller composing the gate with an inner join
  * on id cannot silently discard them. A doc with exactly ONE unit of
  * a kind is maximally concentrated by construction (frac 1.0 → rule
  * fires) — deliberate: Gopher composes these rules after the
  * minimum-length gate (docs_gopher_rules' r_word_count), which is
  * what screens degenerate-short documents.
  *
  * Scale shape: ONE exploded (id, unit-kind, gram) exchange feeds all
  * three signals (the three unit lists concatenate before the explode),
  * then two keyed aggregates — never a self-join, never per-row
  * quadratic work (an in-row HOF count would be O(len²) per document,
  * hopeless at book length). All fractions are single divisions of
  * exact integers — bit-identical across engines, no rounding step.
  */
object Repetition {

  /** Per-document repetition statistics plus thresholded keep flags.
    * Thresholds follow Gopher's published cutoffs (0.20 top-2-gram,
    * 0.29 duplicate-3-gram proxy, 0.30 duplicate-line). */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 10, topBigramMax: Double = 0.20,
      dupTrigramMax: Double = 0.29, dupChunkMax: Double = 0.30): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // Unsplittable-input spread (r14, guide §2.5): the three-way gram
    // explosion below the first aggregate is this operator's dominant
    // CPU; single-task on a one-row-group scan, no-op once the input
    // scan splits.
    val tagged = graft.util.Spread.spreadInput(docs, col(idCol))
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), toks.as("__t"))
      .select(col("id"), explode(concat(
        tag(2, TextFunctions.ngramsFromTokens(col("__t"), 2)),
        tag(3, TextFunctions.ngramsFromTokens(col("__t"), 3)),
        tag(0, TextFunctions.chunksFromTokens(col("__t"), chunkTokens))))
        .as("e"))
      .select(col("id"), col("e.n").as("n"), col("e.g").as("g"))
    val frac = (a: Column, b: Column) => a.cast("double") / b.cast("double")
    val st = tagged
      .groupBy(col("id"), col("n"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"), col("n"))
      .agg(sum(col("cnt")).as("total"), max(col("cnt")).as("top"),
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup"))
    val scored = st.groupBy(col("id"))
      .agg(
        max(when(col("n") === 2, frac(col("top"), col("total"))))
          .as("top_bigram_frac"),
        max(when(col("n") === 3, frac(col("dup"), col("total"))))
          .as("dup_trigram_frac"),
        max(when(col("n") === 0, frac(col("dup"), col("total"))))
          .as("dup_chunk_frac"))
      .select(col("id"), col("top_bigram_frac"), col("dup_trigram_frac"),
        col("dup_chunk_frac"),
        coalesce(col("top_bigram_frac") <= topBigramMax, lit(true))
          .as("r_top_bigram"),
        coalesce(col("dup_trigram_frac") <= dupTrigramMax, lit(true))
          .as("r_dup_trigram"),
        coalesce(col("dup_chunk_frac") <= dupChunkMax, lit(true))
          .as("r_dup_chunk"))
      .withColumn("keep",
        col("r_top_bigram") && col("r_dup_trigram") && col("r_dup_chunk"))
    // Null-text docs produced no grams — re-attach them with the
    // documented no-evidence verdict instead of dropping the row. A
    // cheap union of the tiny filtered subset, not a corpus-wide join:
    // every non-null text yields at least one 10-token chunk, so only
    // the null-text filter above removes documents.
    val kept = docs.filter(col(textCol).isNull)
      .select(col(idCol).as("id"),
        lit(null).cast("double").as("top_bigram_frac"),
        lit(null).cast("double").as("dup_trigram_frac"),
        lit(null).cast("double").as("dup_chunk_frac"),
        lit(true).as("r_top_bigram"), lit(true).as("r_dup_trigram"),
        lit(true).as("r_dup_chunk"), lit(true).as("keep"))
    scored.unionByName(kept)
  }

  private def tag(n: Int, grams: Column): Column =
    transform(grams, g => struct(lit(n).as("n"), g.as("g")))
}
