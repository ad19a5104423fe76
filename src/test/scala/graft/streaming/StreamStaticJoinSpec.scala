package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamStaticJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val dim = Seq(
    (1L, "gold"), (2L, "silver")).toDF("user_id", "tier")

  test("enrichStream joins each micro-batch against the static dimension") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val events = input.toDS().toDF("event_id", "user_id", "ts")
    val q = EventsOps.enrichStream(events, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      input.addData((10L, 1L, ts(0)), (11L, 3L, ts(1)))
      q.processAllAvailable()
      input.addData((12L, 2L, ts(2)))
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select($"event_id", $"tier").as[(Long, Option[String])]
        .collect().toMap
      assert(out == Map(
        10L -> Some("gold"),
        11L -> None, // unmatched key passes through (left join)
        12L -> Some("silver")))
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("batch form produces the same enrichment (batch ≡ stream)") {
    val batch = Seq((10L, 1L), (11L, 3L), (12L, 2L))
      .toDF("event_id", "user_id")
    val out = EventsOps.enrichStream(batch, dim, "user_id")
      .select($"event_id", $"tier").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(10L -> Some("gold"), 11L -> None, 12L -> Some("silver")))
  }

  test("overlapping non-key columns are rejected eagerly") {
    val batch = Seq((10L, 1L, "x")).toDF("event_id", "user_id", "tier")
    val e = intercept[IllegalArgumentException] {
      EventsOps.enrichStream(batch, dim, "user_id")
    }
    assert(e.getMessage.contains("tier"))
  }

  test("oversized dimension is rejected eagerly with a shuffled-variant pointer") {
    // Size contract (r9 verdict): broadcasting an unbounded dimension is
    // a driver OOM at 100 TB, so the guard must fail BEFORE the stream
    // starts, and the shuffled variant must handle the same inputs.
    val batch = Seq((10L, 1L), (11L, 3L)).toDF("event_id", "user_id")
    val e = intercept[IllegalArgumentException] {
      EventsOps.enrichStream(batch, dim, "user_id", maxDimRows = 1L)
    }
    assert(e.getMessage.contains("enrichStreamShuffled"))
    val out = EventsOps.enrichStreamShuffled(batch, dim, "user_id")
      .select($"event_id", $"tier").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(10L -> Some("gold"), 11L -> None))
  }

  test("shuffled variant streams and matches enrichStream output") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val events = input.toDS().toDF("event_id", "user_id", "ts")
    val q = EventsOps.enrichStreamShuffled(events, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_shuf_out").start()
    try {
      input.addData((10L, 1L, ts(0)), (11L, 3L, ts(1)))
      q.processAllAvailable()
      val out = spark.table("enrich_shuf_out")
        .select($"event_id", $"tier").as[(Long, Option[String])]
        .collect().toMap
      assert(out == Map(10L -> Some("gold"), 11L -> None))
      assert(q.exception.isEmpty)
    } finally {
      q.stop()
      spark.catalog.dropTempView("enrich_shuf_out")
    }
  }
}
