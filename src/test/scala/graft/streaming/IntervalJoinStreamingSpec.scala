package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The interval join must run as a genuine stream-stream join: both sides
  * watermarked, matches across micro-batches, state bounded by the
  * interval condition. */
class IntervalJoinStreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join matches across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val v = views.toDF().toDF("user_id", "view_id", "view_ts")
      .withWatermark("view_ts", "30 minutes")
    val c = clicks.toDF().toDF("user_id", "click_id", "click_ts")
      .withWatermark("click_ts", "30 minutes")
    val joined = EventsOps.intervalJoin(v, c, "user_id",
      "view_ts", "click_ts", "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try {
      // batch 1: two views, no clicks yet
      views.addData((1L, 100L, ts("2024-01-01 10:00:00")),
        (2L, 200L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ssjoin_out").count() == 0)
      // batch 2: one click in-window for user 1, one too late for user 2,
      // one for an unknown user
      clicks.addData((1L, 900L, ts("2024-01-01 10:05:00")),
        (2L, 901L, ts("2024-01-01 10:20:00")),
        (9L, 902L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val got = spark.table("ssjoin_out")
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 100L, 900L)))
    } finally q.stop()
  }

  test("streaming result equals the batch transform on the same data") {
    val viewRows = Seq((1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 10:04:00")),
      (2L, 200L, ts("2024-01-01 11:00:00")))
    val clickRows = Seq((1L, 900L, ts("2024-01-01 10:05:00")),
      (2L, 901L, ts("2024-01-01 11:30:00")))
    val batch = EventsOps.intervalJoin(
      viewRows.toDF("user_id", "view_id", "view_ts"),
      clickRows.toDF("user_id", "click_id", "click_ts"),
      "user_id", "view_ts", "click_ts", "10 minutes")
      .select("user_id", "view_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == Set((1L, 100L, 900L), (1L, 101L, 900L)))

    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventsOps.intervalJoin(
      views.toDF().toDF("user_id", "view_id", "view_ts")
        .withWatermark("view_ts", "1 hour"),
      clicks.toDF().toDF("user_id", "click_id", "click_ts")
        .withWatermark("click_ts", "1 hour"),
      "user_id", "view_ts", "click_ts", "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_eq_out").start()
    try {
      views.addData(viewRows: _*)
      clicks.addData(clickRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_eq_out")
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("malformed maxDelay fails eagerly") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "view_ts")
    val df2 = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "click_ts")
    intercept[IllegalArgumentException] {
      EventsOps.intervalJoin(df, df2, "user_id", "view_ts", "click_ts", "banana")
    }
  }

  test("overlapping non-key columns are rejected") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      EventsOps.intervalJoin(df, df, "user_id", "ts", "ts", "10 minutes")
    }
  }
}
