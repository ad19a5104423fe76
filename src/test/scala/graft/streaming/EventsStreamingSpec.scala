package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.Tables

/** The streaming plan must agree with the batch plan on the same data —
  * Structured Streaming's unification property, and our gate that the
  * windowed operators are genuinely streamable (SURVEY §2.7). */
class EventsStreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("tumblingStream over file stream equals batch tumbling") {
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(events.schema)
      .parquet(dir)
    val agg = EventsOps.tumblingStream(stream, "1 hour", "1 minute")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("tumbling_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n", "total_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      val batch = EventsOps.tumbling(events, "1 hour")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("sliding and session windows also run under readStream") {
    val events = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("events_stream2").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)

    val sq = EventsOps.sliding(stream.withWatermark("ts", "1 minute"),
        "1 hour", "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sliding_out").start()
    val ssq = EventsOps.sessions(stream.withWatermark("ts", "1 minute"),
        "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      sq.processAllAvailable(); ssq.processAllAvailable()
      // Append mode emits only watermark-closed windows; on a finite
      // file-stream batch the final windows stay open, so compare against
      // the batch results as a superset check plus non-emptiness.
      val slidingBatch = EventsOps.sliding(events, "1 hour", "30 minutes")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val slidingStreamed = spark.table("sliding_out")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(slidingStreamed.nonEmpty && slidingStreamed.subsetOf(slidingBatch))

      val sessionsBatch = EventsOps.sessions(events, "10 minutes")
        .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
      val sessionsStreamed = spark.table("sessions_out")
        .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
      assert(sessionsStreamed.nonEmpty && sessionsStreamed.subsetOf(sessionsBatch))
    } finally { sq.stop(); ssq.stop() }
  }

  test("session late-data policy: dropped past the watermark, absorbed within it") {
    // The allowed-lateness matrix (r10): the SAME event sequence, split
    // across micro-batches with one row arriving late, lands in the
    // session or on the floor purely by the watermark delay — the two
    // documented policies of the streaming session operator. Append
    // mode both times; Spark rejects update mode for session windows
    // (next test), so drop-vs-absorb IS the whole policy space.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    def run(watermark: String): Map[(Long, Timestamp), (Long, Double)] = {
      val in = MemoryStream[(Long, Timestamp, Double)]
      val q = EventsOps.sessionsStream(
          in.toDS().toDF("user_id", "ts", "value"), "10 minutes", watermark)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_late_out").start()
      try {
        in.addData((1L, t("2024-01-01 00:00:00"), 1.0),
                   (1L, t("2024-01-01 00:05:00"), 1.0),
                   (9L, t("2024-01-01 01:00:00"), 1.0))
        q.processAllAvailable()
        // The LATE row: 00:07 extends user 1's session, but arrives
        // after batch 1 pushed the watermark to 01:00 − delay.
        in.addData((1L, t("2024-01-01 00:07:00"), 1.0),
                   (9L, t("2024-01-01 06:00:00"), 1.0))
        q.processAllAvailable()
        in.addData((9L, t("2024-01-01 12:00:00"), 1.0))
        q.processAllAvailable()
        assert(q.exception.isEmpty)
        spark.table("sess_late_out")
          .select($"user_id", $"session_start", $"n_events", $"total_value")
          .as[(Long, Timestamp, Long, Double)].collect()
          .map { case (u, s0, n, v) => (u, s0) -> (n, v) }.toMap
      } finally { q.stop(); spark.catalog.dropTempView("sess_late_out") }
    }
    // TIGHT lateness (1 minute): batch 1 leaves the watermark at 00:59,
    // past user 1's whole open session — the 00:07 arrival is DROPPED
    // and the session emits with its original two events.
    assert(run("1 minute")((1L, t("2024-01-01 00:00:00"))) == ((2L, 2.0)))
    // GENEROUS lateness (2 hours): batch 1's watermark sits below the
    // session, the 00:07 arrival is ABSORBED into live state, and the
    // session emits merged (three events, extended end).
    assert(run("2 hours")((1L, t("2024-01-01 00:00:00"))) == ((3L, 3.0)))
  }

  test("session windows reject update output mode at analysis (Spark boundary)") {
    // Spark's session-window aggregation supports append/complete only;
    // the policy matrix above is therefore complete. Pin the boundary so
    // a future Spark that lifts it surfaces as a test change, not a
    // silent semantic shift.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      EventsOps.sessionsStream(in.toDS().toDF("user_id", "ts", "value"),
          "10 minutes", "1 minute")
        .writeStream.outputMode("update")
        .format("memory").queryName("sess_update_out").start()
    }
    assert(e.getMessage.toLowerCase.contains("session"))
  }

  test("gapFillHourly counts null-typed events instead of zero-filling them") {
    import java.sql.Timestamp
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 10:15:00"), "click"),
      (Timestamp.valueOf("2024-01-01 10:20:00"), null: String),
      (Timestamp.valueOf("2024-01-01 12:05:00"), "click"))
      .toDF("ts", "event_type")
    val got = EventsOps.gapFillHourly(ev)
      .as[(Timestamp, String, Long)].collect()
      .map { case (h, t, n) => (h.toString, Option(t), n) }.toSet
    // 3 hours × 2 types; the null type's 10:00 bucket must carry its
    // real count (an equi-join would zero it out).
    assert(got == Set(
      ("2024-01-01 10:00:00.0", Some("click"), 1L),
      ("2024-01-01 10:00:00.0", None, 1L),
      ("2024-01-01 11:00:00.0", Some("click"), 0L),
      ("2024-01-01 11:00:00.0", None, 0L),
      ("2024-01-01 12:00:00.0", Some("click"), 1L),
      ("2024-01-01 12:00:00.0", None, 0L)))
  }

  test("sessions merge events within the gap and split beyond it") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:05:00"),
      (1L, "2024-01-01 00:30:00"),
      (2L, "2024-01-01 10:00:00"),
    ).toDF("user_id", "s")
      .select($"user_id", $"s".cast("timestamp").as("ts"),
        lit("view").as("event_type"), lit(1.0).as("value"))
    val got = EventsOps.sessions(df, "10 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }
}
