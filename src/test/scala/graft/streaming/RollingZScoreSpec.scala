package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RollingZScoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** (event_id, user, value) rows with ts = event_id seconds from epoch. */
  private def events(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("event_id", "user_id", "value")
      .withColumn("ts", timestamp_seconds($"event_id"))

  private def zscored(rows: Seq[(Long, Long, Double)], minPrior: Int = 8) =
    EventsOps.rollingZScore(events(rows), key = $"user_id",
      order = Seq($"ts", $"event_id"), valueCol = $"value",
      minPrior = minPrior)
      .select("event_id", "z", "anomaly")
      .as[(Long, Option[Double], Boolean)].collect().sortBy(_._1)

  test("a planted spike against a stable baseline is flagged; the baseline is not") {
    // 10 alternating 9.5/10.5 values (std ~0.5), then a 100.0 spike.
    val base = (0L until 10L).map(i =>
      (i, 1L, if (i % 2 == 0) 9.5 else 10.5))
    val out = zscored(base :+ ((10L, 1L, 100.0)))
    val spike = out.find(_._1 == 10L).get
    assert(spike._3, s"spike not flagged: $spike")
    assert(spike._2.get > 100.0) // ~90 sigma out
    assert(out.filter(_._1 < 10L).forall(!_._3), "baseline rows flagged")
  }

  test("cold start: rows with fewer than minPrior prior values get NULL z, anomaly=false") {
    val out = zscored((0L until 12L).map(i => (i, 1L, i.toDouble * 3)))
    // Frame is strictly prior rows, so row i has i prior values.
    assert(out.filter(_._1 < 8L).forall(r => r._2.isEmpty && !r._3))
    assert(out.filter(_._1 >= 8L).forall(_._2.isDefined))
  }

  test("zero-variance baseline yields NULL z (guard), never Inf/NaN") {
    val out = zscored((0L until 10L).map(i => (i, 1L, 5.0)) :+ ((10L, 1L, 99.0)))
    assert(out.forall(r => r._2.forall(z => !z.isNaN && !z.isInfinite)))
    // constant prior frame → variance 0 → guarded to null, not flagged
    assert(out.forall(r => r._2.isEmpty && !r._3))
  }

  test("the frame is strictly prior: a spike never inflates its own baseline") {
    // If the frame included the current row, the spike's own value would
    // blow up the window std and z would shrink to ~sqrt(n); with a
    // strictly-prior frame z is (100-10)/0.5 ≈ 90+ sigma.
    val base = (0L until 10L).map(i =>
      (i, 1L, if (i % 2 == 0) 9.5 else 10.5))
    val out = zscored(base :+ ((10L, 1L, 100.0)))
    assert(out.find(_._1 == 10L).get._2.get > 50.0)
  }

  test("keys are independent and null values pass through unflagged") {
    val rows = (0L until 10L).map(i => (i, 1L, if (i % 2 == 0) 9.5 else 10.5)) ++
      (100L until 110L).map(i => (i, 2L, 1000.0 + (if (i % 2 == 0) -0.5 else 0.5)))
    // user 2's values are huge but internally stable — nothing flagged.
    val out = zscored(rows :+ ((110L, 2L, 1001.0)))
    assert(out.forall(!_._3))
  }

  test("batch ≡ fold law: zScoreOf folded over ordered values equals the window plan on real data") {
    // The fixture events table at smoke scale: every (user, ordered
    // values) stream folded through the streaming core must reproduce
    // the batch window operator digit for digit.
    val ev = graft.model.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"value")
    val batch = EventsOps.rollingZScore(ev, key = $"user_id",
      order = Seq($"ts", $"event_id"), valueCol = $"value")
      .select("event_id", "z", "anomaly")
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ordered = ev.orderBy($"user_id", $"ts", $"event_id")
      .select("event_id", "user_id", "value")
      .as[(Long, Long, Double)].collect()
    val folded = ordered.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var window = Vector.empty[Double]
      rows.toSeq.map { case (id, _, v) =>
        val r = EventsOps.zScoreOf(window, v, 8, 3.0)
        window = (window :+ v).takeRight(20)
        id -> r
      }
    }.toMap
    assert(folded.keySet == batch.keySet)
    val diffs = folded.filter { case (id, r) => batch(id) != r }
    assert(diffs.isEmpty, s"fold != batch for ${diffs.take(3)}")
    // the law is not vacuous: the fixture produces real flags
    assert(batch.values.exists(_._2) || batch.values.forall(!_._2))
    assert(batch.values.count(_._1.isDefined) > 0)
  }

  test("streaming over micro-batches equals the batch operator (in-order delivery)") {
    val rows = (0L until 10L).map(i =>
      EventsOps.ZEvent(i, 1L, i * 1000000L,
        if (i % 2 == 0) 9.5 else 10.5)) :+
      EventsOps.ZEvent(10L, 1L, 10000000L, 100.0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventsOps.ZEvent]
    val q = EventsOps.rollingZScoreStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("zscore_out").start()
    val streamed = try {
      // split mid-stream: state must carry the frame across batches
      input.addData(rows.take(6): _*); q.processAllAvailable()
      input.addData(rows.drop(6): _*); q.processAllAvailable()
      spark.table("zscore_out").as[EventsOps.ZFlag].collect()
        .map(f => f.event_id -> ((f.z, f.anomaly))).toMap
    } finally q.stop()
    val batch = zscored(rows.map(e => (e.event_id, e.user_id, e.value)))
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed == batch)
    assert(streamed(10L)._2, "spike must be flagged in the streamed run")
  }

  test("a NULL value flows through the stream like the batch form: unflagged, never framed") {
    // Batch semantics for a null value row: z = NULL, anomaly = false,
    // and the row never enters any later frame (SUM/COUNT skip nulls).
    // The boxed ZEvent.value must reproduce that instead of crashing
    // the encoder.
    val rows: Seq[EventsOps.ZEvent] =
      (0L until 5L).map(i => EventsOps.ZEvent(i, 1L, i * 1000000L,
        if (i % 2 == 0) 9.5 else 10.5)) ++
      Seq(EventsOps.ZEvent(5L, 1L, 5000000L, null)) ++
      (6L until 12L).map(i => EventsOps.ZEvent(i, 1L, i * 1000000L,
        if (i % 2 == 0) 9.5 else 10.5)) :+
      EventsOps.ZEvent(12L, 1L, 12000000L, 100.0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventsOps.ZEvent]
    val q = EventsOps.rollingZScoreStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("zscore_null_out").start()
    val streamed = try {
      input.addData(rows: _*); q.processAllAvailable()
      spark.table("zscore_null_out").as[EventsOps.ZFlag].collect()
        .map(f => f.event_id -> ((f.z, f.anomaly))).toMap
    } finally q.stop()
    val batch = rows.map(e =>
        (e.event_id, e.user_id, Option(e.value).map(_.doubleValue)))
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("event_id") * 1000000L))
      .transform(df => EventsOps.rollingZScore(df, key = $"user_id",
        order = Seq($"ts", $"event_id"), valueCol = $"value"))
      .select("event_id", "z", "anomaly")
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(streamed == batch)
    assert(streamed(5L) == ((None, false)))
    assert(streamed(12L)._2, "spike after the null row must still flag")
  }

  test("one exchange: the window shuffle is the only exchange in the plan") {
    val df = EventsOps.rollingZScore(
      events((0L until 10L).map(i => (i, i % 3, i.toDouble))),
      key = $"user_id", order = Seq($"ts", $"event_id"), valueCol = $"value")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
