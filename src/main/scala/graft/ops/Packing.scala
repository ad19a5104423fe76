package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-sequence packing: assign documents to fixed-capacity token
  * chunks (SURVEY §2.7 extension; the "concat-then-chunk" step of an LLM
  * pretraining pipeline — docs are laid end-to-end in a deterministic
  * order and the stream is cut every `chunkTokens` tokens, so one doc may
  * span several chunks and one chunk may hold several docs).
  *
  * This is the distributable formulation: a doc's placement is a pure
  * function of the PREFIX SUM of token counts in doc order — not the
  * sequential first-fit bin-packing loop, which has no partition-parallel
  * form (every placement depends on all prior bins). Chunk membership
  * comes out as arithmetic on the prefix sum: a doc spanning tokens
  * [start, end) lands in chunks start/C .. (end-1)/C, exploded into one
  * row per (doc, chunk) with the doc-local token span each chunk takes.
  *
  * The prefix sum itself is the textbook two-level scan, expressed as one
  * lazy plan: range-partition by id (so partition p holds ids strictly
  * below partition p+1), take per-partition running sums with a window
  * PARTITIONED by `spark_partition_id()`, and add each partition's
  * exclusive offset — the cumulative of the per-partition subtotals, a
  * #partitions-row table that broadcasts. A bare `Window.orderBy(id)`
  * would instead drag the whole corpus into ONE task (Spark's unpartitioned
  * window), which is exactly what dies first at 100 TB.
  *
  * Both window/aggregate branches consume the SAME range exchange, which
  * Catalyst de-duplicates (ReusedExchange — asserted in PackingSpec), so
  * the sampled range boundaries — and therefore `spark_partition_id()` —
  * are consistent across the two consumers. */
object Packing {

  /** One row per (doc, chunk) the doc occupies: (idCol, chunk_id,
    * tok_from, tok_to, n_toks) with [tok_from, tok_to) the doc-local
    * half-open token span placed in that chunk. Docs are packed in
    * ascending `idCol` order; token counts use the engine's whitespace
    * tokenizer ([[TextFunctions.tokenCount]]). Null-text docs carry no
    * tokens and produce no rows. */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val c = lit(chunkTokens.toLong)
    val counted = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokenCount(col(textCol))
        .cast("long").as("__n"))
      // Enforce "no tokens → no rows" here rather than relying on the
      // tokenizer never returning 0: a zero-token doc would make the
      // sequence() below DESCEND (Spark auto-steps -1 when stop < start)
      // and emit spurious zero-width chunk rows.
      .filter(col("__n") > 0)
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
    // Exclusive cross-partition offsets: cumsum over the (tiny)
    // per-partition subtotal table — #partitions rows, not the corpus.
    // partitionBy(pmod(__pid, 1)) — constant 0 — runs it single-partition
    // BY DECLARATION: execution is identical to an unpartitioned window
    // (this table is broadcast-sized by design), but the explicit spec
    // keeps WindowExec's "No Partition Defined" warning — a real scale
    // alarm elsewhere — out of the bench/verify tail for a site where it
    // is a false positive. A bare lit(0) would NOT survive to execution:
    // Spark 4's EliminateWindowPartitions optimizer rule strips foldable
    // partition expressions, restoring the empty spec and the warning.
    val offsets = counted.groupBy(col("__pid"))
      .agg(sum(col("__n")).as("__tot"))
      .withColumn("__off", coalesce(
        sum(col("__tot")).over(Window.partitionBy(pmod(col("__pid"), lit(1)))
          .orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__end", col("__off") + sum(col("__n")).over(w))
      .withColumn("__start", col("__end") - col("__n"))
      // expr: DIV is exact integer division (non-negative here); a
      // double `/` would round above 2^53 total tokens.
      .withColumn("chunk_id",
        explode(sequence(expr(s"__start DIV $chunkTokens"),
          expr(s"(__end - 1) DIV $chunkTokens"))))
      .select(col(idCol), col("chunk_id"),
        greatest(col("chunk_id") * c - col("__start"), lit(0L)).as("tok_from"),
        least((col("chunk_id") + 1) * c - col("__start"), col("__n"))
          .as("tok_to"))
      .withColumn("n_toks", col("tok_to") - col("tok_from"))
  }

  /** Overlapping fixed-size chunking (the RAG/embedding-index serving
    * shape, stride < chunk ⇒ consecutive chunks share chunk−stride
    * tokens): chunk i covers tokens [i·stride, i·stride+chunkTokens) and
    * the last chunk is the first one whose window reaches the end of the
    * doc — so every token is covered and no start position beyond the
    * text is emitted. Returns one row per (doc, chunk):
    * (idCol, chunk_idx, chunk_text, n_toks), the ragged tail shorter
    * than chunkTokens. Null-text docs emit nothing; an empty-string doc
    * is one single-token chunk of "" (Spark and DuckDB agree a
    * whitespace split of "" is [""]).
    *
    * Unlike [[packChunks]] (which cuts a GLOBAL token stream and needs
    * the distributed prefix sum), chunk placement here is doc-local
    * arithmetic: a pure projection + explode, no shuffle at any corpus
    * size. The start count uses exact integer ceil-div — no doubles in
    * the row-count decision. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"stride must be in [1, chunkTokens]: $strideTokens")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // Index of the last chunk start: ceil((n - chunk) / stride) when the
    // doc overflows one chunk, else 0. (a + s - 1) div s on ints; the
    // double `/` is exact here (token counts ≪ 2^53) and floor makes the
    // integer intent explicit.
    val nChunks = when(n > chunkTokens,
      floor((n - lit(chunkTokens) + lit(strideTokens - 1)) /
        lit(strideTokens.toDouble)).cast("long"))
      .otherwise(lit(0L))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), nChunks),
          i => array_join(slice(toks, (i * strideTokens + 1).cast("int"),
            lit(chunkTokens)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_toks", size(split(col("chunk_text"), " ")))
  }

  /** Shard manifest for a training export: assign each packed sequence
    * to one of `shards` output shards by key hash and summarize every
    * shard as (shard_id, n_seqs, n_tokens, checksum) — the audit
    * artifact a training job checks BEFORE reading a single shard file,
    * and the integrity receipt a 1000-writer export job publishes so a
    * re-run (or a second cluster) can verify its output without a
    * row-level diff. Pairs with [[packChunks]]: pack cuts the token
    * stream into sequences, this fixes where each sequence lives.
    *
    * Assignment is `hash52(keyCols joined ':', salt) mod shards` — the
    * engine's one oracle-replayed hash family
    * ([[graft.functions.Sketches.hash52]]), so the placement is a pure
    * function of the data: any engine, any partitioning, any run
    * reproduces it (re-salting rebalances). The checksum is the sum of
    * the member rows' 52-bit key hashes mod 2^52 — ORDER-INVARIANT
    * (addition commutes, so it is stable under any scan/merge order) and
    * exact (a decimal(38,0) sum of 52-bit terms cannot overflow below
    * ~10^22 rows/shard).
    *
    * Scale shape: one projection computes (shard, hash) per row, then a
    * `shards`-key groupBy — partial aggregation collapses each input
    * partition to ≤`shards` rows map-side, so the exchange carries
    * #partitions×shards tiny rows no matter the corpus size. The
    * payload-moving counterpart (actually writing the shards) is
    * `df.repartition(shards, keyExpr).write` riding the same expression;
    * the manifest itself never shuffles a sequence. */
  def shardManifest(seqs: DataFrame, keyCols: Seq[String], nToksCol: String,
      shards: Int, salt: String): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    // Key contract (the snapshotDiff discipline): keyCols must be
    // non-null and ':'-free — (doc_id, chunk_id) machine keys by
    // construction. The ':'-joined encoding is what the oracle hashes;
    // plain concat NULL-PROPAGATES (a null component nulls the hash on
    // BOTH engines) instead of concat_ws's silent component skip, which
    // would alias (null, 5) with (5).
    val key = keyCols.map(c => col(c).cast("string"))
      .reduce((a, b) => concat(a, lit(":"), b))
    val h = graft.functions.Sketches.hash52(key, salt)
    seqs
      .select(pmod(h, lit(shards.toLong)).as("shard_id"),
        h.cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__h"),
        col(nToksCol).cast("long").as("__n"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("__n")).as("n_tokens"),
        pmod(sum(col("__h")),
          lit(graft.functions.Sketches.HashSpace).cast(
            org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("checksum"))
  }
}
