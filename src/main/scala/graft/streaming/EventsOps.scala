package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Windowed event aggregations (SURVEY §2.7 streaming extension). Each
  * function is a pure DataFrame transform, so the SAME plan runs in batch
  * (for the oracle gate) and under `readStream` with a watermark (see
  * EventsStreamingSpec) — Structured Streaming's batch/stream unification.
  */
object EventsOps {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Tumbling window aggregate per event type. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding window aggregate (width, slide). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session windows per user: events closer than `gap` merge into one
    * session (Spark session_window; equivalent to gaps-and-islands SQL). */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** The streaming form of [[tumbling]]: watermarked for state eviction.
    * Late data beyond the watermark is dropped — the explicit policy
    * (SURVEY §7 risk note). */
  def tumblingStream(events: DataFrame, width: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
}
