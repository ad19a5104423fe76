package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.dedup.Dedup
import graft.pipeline.SendoPipeline

/** Streaming corpus ingestion: readStream → per-micro-batch incremental
  * dedup → staged MERGE into the parquet warehouse, via foreachBatch —
  * the end-to-end streaming form of the daily pipeline (SURVEY §2.7
  * "streaming ingest" + §2.4 loads in one path).
  *
  * Unlike [[Dedup.exactDedupStream]] (state inside the streaming state
  * store, bounded by a watermark), this variant keeps dedup state in the
  * WAREHOUSE itself: a persisted one-column fingerprint-index table,
  * merged forward with each batch. State survives query restarts and
  * checkpoint loss, is queryable as a plain table, and is unbounded —
  * the right trade for corpus ingestion, where "the same document a year
  * later" is still a duplicate.
  *
  * Per micro-batch (all idempotent, so foreachBatch's at-least-once
  * replay after a failure converges to the same tables):
  *   1. dedupe the batch internally and against the index (O(batch) —
  *      the corpus is never rescanned),
  *   2. MERGE survivors into the docs table by PK,
  *   3. MERGE the survivors' fingerprints into the index table.
  */
object StreamingIngest {

  private val fpSchema = StructType(Seq(StructField("fp", StringType)))

  private def indexTable(table: String): String = s"${table}_fpindex"

  /** One micro-batch (or one daily batch — the logic is identical and
    * batch ≡ stream by construction). Public for direct batch use and
    * replay testing. */
  def ingestBatch(batch: DataFrame, warehouseDir: String, table: String,
      textCol: String, pk: String): Unit = {
    val spark = batch.sparkSession
    val idx = SendoPipeline.readTable(spark, warehouseDir,
      indexTable(table), fpSchema)
    // Resolve intra-batch PK duplicates BEFORE fingerprint dedup: the
    // downstream MERGE stores one row per PK, and indexing fingerprints
    // of rows the merge then discards would poison the index — a later
    // document with the discarded row's text would be dropped as
    // "already in corpus" despite the warehouse never storing it. After
    // this line, kept rows and stored rows coincide exactly.
    val kept = Dedup.incrementalDedup(batch.dropDuplicates(pk), idx,
      textCol, pk)
    // The two merges read `kept` twice; persist so the dedup window +
    // anti join run once per batch, not per merge.
    kept.persist()
    try {
      if (!kept.isEmpty) {
        SendoPipeline.mergeTable(spark, warehouseDir, table,
          batch.schema, kept, pk)
        SendoPipeline.mergeTable(spark, warehouseDir, indexTable(table),
          fpSchema, Dedup.fingerprintIndex(kept, textCol), "fp")
      }
    } finally kept.unpersist()
  }

  /** Start the streaming ingestion query over a streaming `docs` frame.
    * Checkpointed; restarts resume from the last committed batch, and a
    * replayed batch re-merges to the identical warehouse state. */
  def start(docs: DataFrame, warehouseDir: String, table: String,
      textCol: String, pk: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) =>
        ingestBatch(batch, warehouseDir, table, textCol, pk))
      .start()
}
