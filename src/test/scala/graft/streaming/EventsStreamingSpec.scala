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
