package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020, "Exploring
  * the Limits of Transfer Learning...", §2.2): repair documents line by
  * line instead of gating them whole. Lines that fail the line rules
  * are CUT and the remainder reassembled; pages that trip a page rule
  * are dropped entirely, with the reason recorded — the drop-accounting
  * shape every gate in this engine uses, so audits and downstream
  * joins never lose rows silently.
  *
  * C4's published constants are the [[Cleaning.C4]] preset: keep only
  * lines ending in terminal punctuation, with >= 3 words, not
  * mentioning "javascript"; drop any page containing "lorem ipsum" or
  * a curly brace; drop pages with too few surviving lines (C4 keys
  * this on sentence count; this operator keys it on surviving lines —
  * the line IS the sentence unit the filter just validated). All rules
  * are data, not code: [[LineRules]] re-parameterizes every cutoff,
  * which is also what makes the operator meaningful on corpora whose
  * "lines" are token chunks rather than newline-delimited sentences
  * (the fixture corpus — [[graft.dedup.Dedup.tokenChunks]]).
  *
  * The cross-corpus counterpart (C4's "three-sentence span occurring
  * more than once in the dataset" rule) is deliberately NOT folded in
  * here: that is exactly [[graft.dedup.Dedup.unitDedup]] /
  * [[graft.dedup.Dedup.removeDuplicatedSpans]], and composing them
  * stays a caller choice (this operator is per-document, embarrassingly
  * parallel; those need a corpus-wide exchange).
  *
  * Scale: the page flags and the total line count are scalar
  * expressions evaluated IN the scan projection — no shuffle, no
  * full-text exchange. Only the SURVIVING lines are exploded and
  * shuffled (keyed on the doc id) for reassembly, and the final join
  * back to the per-doc spine carries ids and flags, never document
  * payloads. At 100 TB that means the heavy exchange is proportional
  * to the kept fraction of the corpus, and a document is never
  * shuffled whole.
  */
object Cleaning {

  /** Line/page rule set; defaults are C4's published constants.
    *
    * @param minWords        keep a line only with at least this many
    *                        non-empty whitespace-separated words
    * @param terminalPunct   keep a line only if it matches this regex
    *                        (C4: ends in . ! ? or a closing quote);
    *                        None disables the rule (corpora without
    *                        sentence punctuation)
    * @param lineBlockWords  drop any line whose lowercase form contains
    *                        one of these
    * @param pageBlockPhrases drop the whole page when its lowercase
    *                        text contains one of these anywhere
    * @param dropBracePages  drop pages containing '{' (C4's code filter)
    * @param minLinesKept    drop pages with fewer surviving lines
    */
  final case class LineRules(
      minWords: Int = 3,
      terminalPunct: Option[String] = Some("[.!?\"]$"),
      lineBlockWords: Seq[String] = Seq("javascript"),
      pageBlockPhrases: Seq[String] = Seq("lorem ipsum"),
      dropBracePages: Boolean = true,
      minLinesKept: Int = 3) {
    require(minWords >= 0, s"minWords must be >= 0: $minWords")
    require(minLinesKept >= 0, s"minLinesKept must be >= 0: $minLinesKept")
  }

  /** The published C4 rule set. */
  val C4: LineRules = LineRules()

  /** Per-line keep predicate for `rules` — exposed for tests. */
  private[graft] def lineOk(line: Column, rules: LineRules): Column = {
    val words = size(filter(split(line, " "), t => length(t) > 0))
    val punct = rules.terminalPunct.map(line.rlike).getOrElse(lit(true))
    val blocked = rules.lineBlockWords
      .map(w => lower(line).contains(lit(w)))
      .reduceOption(_ || _).getOrElse(lit(false))
    words >= rules.minWords && punct && !blocked
  }

  /** Clean `df`'s `textCol` line by line. `linesFn` splits a document
    * into its line units (newline corpora: `split(t, "\n")`;
    * unstructured corpora: [[graft.dedup.Dedup.tokenChunks]]); `joiner`
    * reassembles the survivors. One output row PER INPUT DOCUMENT:
    * (id, n_lines, n_lines_kept, keep, drop_reason, text_clean) —
    * text_clean and a null drop_reason for kept pages, a named reason
    * ('no_text' | 'page_blocklist' | 'brace' | 'too_few_lines', first
    * match wins in that order) and null text_clean for dropped ones. */
  def lineClean(df: DataFrame, textCol: String, idCol: String,
      linesFn: Column => Column, joiner: String = "\n",
      rules: LineRules = C4): DataFrame = {
    val text = col(textCol)
    val pageBlocked = rules.pageBlockPhrases
      .map(p => lower(text).contains(lit(p)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val braced =
      if (rules.dropBracePages) text.contains(lit("{")) else lit(false)
    // Unsplittable-input spread (r14, guide §2.5): both the per-doc
    // line count and the survivors' explode + per-line rule predicates
    // run below their first exchange; single-task otherwise.
    val spread = graft.util.Spread.spreadInput(df, col(idCol))
    val perDoc = spread.select(col(idCol).as("id"),
      when(text.isNotNull, size(linesFn(text)).cast("long"))
        .otherwise(lit(0L)).as("n_lines"),
      text.isNull.as("__nt"),
      coalesce(pageBlocked, lit(false)).as("__pb"),
      coalesce(braced, lit(false)).as("__br"))
    val survivors = spread.filter(text.isNotNull)
      .select(col(idCol).as("id"),
        posexplode(linesFn(text)).as(Seq("pos", "line")))
      .filter(lineOk(col("line"), rules))
    val agg = survivors.groupBy(col("id"))
      .agg(graft.dedup.Dedup.joinInOrder("pos", "line", joiner).as("__tc"),
        count(lit(1)).as("__nk"))
    val flagged = perDoc.join(agg, Seq("id"), "left")
      .withColumn("n_lines_kept", coalesce(col("__nk"), lit(0L)))
      .withColumn("drop_reason",
        when(col("__nt"), "no_text")
          .when(col("__pb"), "page_blocklist")
          .when(col("__br"), "brace")
          .when(col("n_lines_kept") < rules.minLinesKept, "too_few_lines"))
    flagged.select(col("id"),
      col("n_lines"), col("n_lines_kept"),
      col("drop_reason").isNull.as("keep"),
      col("drop_reason"),
      when(col("drop_reason").isNull, col("__tc")).as("text_clean"))
  }
}
