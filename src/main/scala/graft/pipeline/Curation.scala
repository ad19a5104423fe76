package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.ops.Sampling

/** End-to-end corpus curation: the composed pretraining-data pipeline —
  * quality filter → exact dedup → near-dup removal → benchmark
  * decontamination → reproducible split — built ENTIRELY from the
  * engine's oracled operators ([[graft.functions.TextFunctions]],
  * [[graft.dedup.Dedup]], [[graft.ops.Sampling]]).
  *
  * Design: each stage TAGS rather than drops — the result carries one
  * audit column per stage plus the split assignment, and [[kept]]
  * applies the conjunction. Tagging costs one boolean column per stage
  * but preserves WHY every dropped document was dropped, which is what a
  * 100 TB curation run needs for filter-rate monitoring (a silent 30%
  * quality-drop regression is invisible in a drop-as-you-go pipeline).
  *
  * Scale shape: stages stay lazy on one lineage; the near-dup and
  * decontamination stages join back on the id (never on text), so the
  * document payload column is shuffled at most once (the exact-dedup
  * fingerprint exchange).
  */
object Curation {

  /** Quality gate tuned for the fixture corpus's signal ranges; every
    * threshold is a parameter because real corpora tune these per
    * source. */
  final case class QualityThresholds(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minStopwordRatio: Double = 0.05,
      maxMeanTokenLength: Double = 12.0)

  /** Audit-tagged curation result over `docs(idCol, textCol)`.
    *
    * Output columns = input columns ++
    *  - `passed_quality`: length/stopword/token-shape gate
    *  - `is_exact_dup`:   a lower-id doc has the same fingerprint
    *  - `is_near_dup`:    MinHash-LSH candidate verified ≥ `jaccard`,
    *                      and not the cluster's canonical (kept) doc
    *  - `is_contaminated`: shingle overlap with `bench` ≥ `contamination`
    *  - `split`:          deterministic hash split (train/val/test),
    *                      LEAKAGE-REPAIRED: every near-dup cluster lands
    *                      whole in its canonical member's split
    *  - `split_moved`:    the row's split changed under the repair
    */
  def curate(docs: DataFrame, bench: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      quality: QualityThresholds = QualityThresholds(),
      shingleN: Int = 3, jaccard: Double = 0.8,
      contamination: Double = 0.8, salt: String = "curation-v1",
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      family: Dedup.MinHashFamily = Dedup.xxFamily): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // Stage 1: quality — pure projection, no shuffle.
    val q = qualityPredicate(text, quality)

    // Stage 2: exact dedup — keep the minimum-id doc per fingerprint
    // (one window exchange on the fingerprint).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextFunctions.fingerprint(text)).orderBy(id)
    val tagged = docs
      .withColumn("passed_quality", q)
      .withColumn("is_exact_dup",
        text.isNotNull && row_number().over(w) =!= 1)

    // Stage 3: near-dup — LSH candidates verified by exact Jaccard;
    // ONE cluster solve feeds both the loser tags and the split-leakage
    // repair (stage 6), joined back by id only.
    // `family` defaults to the xxhash64 production path; the oracle-gated
    // pipeline_curation query passes md5AffineFamily so the whole MinHash
    // stage is DuckDB-replayable (the dedup_minhash_pairs convention).
    // minhashClusters (r9) = clusterPairs∘minhashPairs with the exact-
    // collapse prestage (law-pinned equal in DedupSpec): a boilerplate
    // document duplicated onto 20% of the corpus — the adversarial
    // CommonCrawl shape — is ONE representative here instead of a
    // quadratic LSH bucket self-join.
    val canon = Dedup.minhashClusters(docs, textCol, idCol, shingleN,
      jaccard, family = family)
      .withColumnRenamed("id", idCol)

    // Stage 4: decontamination — benchmark shingle overlap (bench
    // vocabulary broadcasts; corpus text never reshuffles).
    val contaminated = Dedup.contaminationRatio(docs, bench, textCol, idCol,
      shingleN)
      .filter(col("contamination") >= contamination)
      .select(col("id").as(idCol)).withColumn("__cont", lit(true))

    // No broadcast hints here: loser/contaminated id sets are tiny on a
    // healthy corpus (AQE broadcasts them) but duplicate-proportional,
    // and an adversarial corpus can make them a large fraction of the
    // input — the hint would force an executor-memory blowup exactly
    // when the data is worst.
    tagged
      .join(canon, Seq(idCol), "left")
      .join(contaminated, Seq(idCol), "left")
      .withColumn("is_near_dup",
        col("canonical_id").isNotNull && col("canonical_id") =!= id)
      .withColumn("is_contaminated", coalesce(col("__cont"), lit(false)))
      // Stage 5+6: reproducible split WITH leakage repair — every
      // near-dup cluster lands whole in its canonical member's split
      // (a test doc whose near-dup sits in train is memorized, not held
      // out). Because the split is a pure hash of the id, the
      // canonical's split needs NO extra join: it is recomputed from
      // canonical_id directly. The repair matters precisely because
      // this pipeline TAGS rather than drops — a consumer who keeps
      // tagged near-dups still gets straddle-free splits, and one who
      // drops them loses nothing (survivors keep their own split).
      // `split_moved` is the per-row audit of the repair.
      .withColumn("split",
        Sampling.splitColumn(coalesce(col("canonical_id"), id), salt, splits))
      .withColumn("split_moved",
        col("canonical_id").isNotNull &&
          Sampling.splitColumn(id, salt, splits) =!= col("split"))
      .drop("__cont", "canonical_id")
  }

  /** [[curate]] extended with the round-8 curation operators — the
    * full modern pretraining gate, still tag-don't-drop:
    *
    *  - `passed_repetition`: the Gopher within-document repetition
    *    rules ([[graft.ops.Repetition.repetitionStats]] keep flag;
    *    no-evidence docs keep — the total policy);
    *  - `lang_pred` / `lang_agrees`: the LEARNED char-bigram langid
    *    ([[graft.functions.LangModel.selfClassify]]); `lang_agrees`
    *    gates on prediction-vs-metadata consistency, with the
    *    no-evidence 'und' prediction keeping the doc (no evidence is
    *    not evidence of mislabeling);
    *  - `n_span_tokens_removed`: the exact-substring REPAIR signal
    *    ([[graft.dedup.Dedup.removeDuplicatedSpans]]) — how many of
    *    the doc's tokens sit in non-first duplicated 10-token spans
    *    (0 for clean docs and for null-text docs, which have no
    *    tokens).
    *
    * Scale shape: all three additions join back on the id only — the
    * document payload never re-shuffles beyond each stage's own
    * internal exchanges. */
  def curateV2(docs: DataFrame, bench: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang",
      quality: QualityThresholds = QualityThresholds(),
      shingleN: Int = 3, jaccard: Double = 0.8,
      contamination: Double = 0.8, salt: String = "curation-v1",
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      family: Dedup.MinHashFamily = Dedup.xxFamily,
      spanWindowTokens: Int = 10): DataFrame = {
    val v1 = curate(docs, bench, idCol, textCol, quality, shingleN, jaccard,
      contamination, salt, splits, family)
    val rep = graft.ops.Repetition.repetitionStats(docs, textCol, idCol)
      .select(col("id").as(idCol), col("keep").as("__rep_keep"))
    val lid = graft.functions.LangModel
      .selfClassify(docs, textCol, langCol, idCol)
      .select(col("id").as(idCol), col("lang_pred"))
    val srem = Dedup.removeDuplicatedSpans(docs, textCol, idCol,
        spanWindowTokens)
      .select(col("id").as(idCol),
        col("n_tokens_removed").as("__n_removed"))
    v1
      .join(rep, Seq(idCol), "left")
      .join(lid, Seq(idCol), "left")
      .join(srem, Seq(idCol), "left")
      .withColumn("passed_repetition", coalesce(col("__rep_keep"), lit(true)))
      .withColumn("lang_agrees",
        col(langCol).isNull || col("lang_pred") === "und" ||
          col("lang_pred") === col(langCol))
      .withColumn("n_span_tokens_removed", coalesce(col("__n_removed"), lit(0L)))
      .drop("__rep_keep", "__n_removed")
  }

  /** The documents a V2 curation run keeps: [[kept]]'s conjunction plus
    * the repetition and langid gates. Span removal REPAIRS rather than
    * drops, so it never excludes a document. */
  def keptV2(curated: DataFrame): DataFrame =
    kept(curated).filter(col("passed_repetition") && col("lang_agrees"))

  /** [[auditCounts]] for the V2 pipeline — the extended filter-rate
    * monitoring row. */
  def auditCountsV2(curated: DataFrame): DataFrame =
    curated.select(
      count(lit(1)).as("n_docs"),
      count(when(!col("passed_quality"), 1)).as("n_low_quality"),
      count(when(col("is_exact_dup"), 1)).as("n_exact_dup"),
      count(when(col("is_near_dup"), 1)).as("n_near_dup"),
      count(when(col("is_contaminated"), 1)).as("n_contaminated"),
      count(when(!col("passed_repetition"), 1)).as("n_repetitive"),
      count(when(!col("lang_agrees"), 1)).as("n_lang_mismatch"),
      count(when(col("n_span_tokens_removed") > 0, 1)).as("n_span_repaired"),
      count(when(col("split_moved"), 1)).as("n_split_moved"),
      count(when(col("passed_quality") && !col("is_exact_dup") &&
        !col("is_near_dup") && !col("is_contaminated") &&
        col("passed_repetition") && col("lang_agrees"), 1)).as("n_kept"))

  /** The quality gate as a reusable predicate column. */
  def qualityPredicate(text: Column, t: QualityThresholds): Column = {
    val n = TextFunctions.tokenCount(text)
    text.isNotNull &&
      n >= t.minTokens && n <= t.maxTokens &&
      TextFunctions.stopwordRatio(text) >= t.minStopwordRatio &&
      TextFunctions.meanTokenLength(text) <= t.maxMeanTokenLength
  }

  /** The documents a curation run keeps: quality-passing, non-duplicate,
    * uncontaminated. */
  def kept(curated: DataFrame): DataFrame =
    curated.filter(col("passed_quality") &&
      !col("is_exact_dup") && !col("is_near_dup") &&
      !col("is_contaminated"))

  /** Per-stage drop accounting (the filter-rate monitoring table): one
    * row per (stage, dropped) with counts — the first thing a corpus
    * run dashboards. */
  def auditCounts(curated: DataFrame): DataFrame =
    curated.select(
      count(lit(1)).as("n_docs"),
      count(when(!col("passed_quality"), 1)).as("n_low_quality"),
      count(when(col("is_exact_dup"), 1)).as("n_exact_dup"),
      count(when(col("is_near_dup"), 1)).as("n_near_dup"),
      count(when(col("is_contaminated"), 1)).as("n_contaminated"),
      count(when(col("split_moved"), 1)).as("n_split_moved"),
      count(when(col("passed_quality") && !col("is_exact_dup") &&
        !col("is_near_dup") && !col("is_contaminated"), 1)).as("n_kept"))
}
