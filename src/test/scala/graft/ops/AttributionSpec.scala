package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AttributionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    Attribution.touchAttribution(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
      "user_id", "ts", "event_id", "event_type", "value",
      conversionType = "purchase", touchTypes = Seq("click", "view"))
      .as[(String, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("first and last preceding touch get the credit; self is excluded") {
    val got = run(Seq(
      (1L, ts(1), 7L, "view", 0.0),
      (2L, ts(2), 7L, "click", 0.0),
      (3L, ts(3), 7L, "purchase", 10.0), // first=view, last=click
      (4L, ts(4), 7L, "purchase", 5.0),  // touches unchanged
    ))
    assert(got("view") === ((2L, 15.0, 0L, 0.0)))
    assert(got("click") === ((0L, 0.0, 2L, 15.0)))
  }

  test("conversions without a preceding touch land in 'none'") {
    val got = run(Seq(
      (1L, ts(1), 7L, "purchase", 3.0),  // nothing precedes
      (2L, ts(2), 8L, "error", 0.0),     // not a touch type
      (3L, ts(3), 8L, "purchase", 4.0),
    ))
    assert(got("none") === ((2L, 7.0, 2L, 7.0)))
  }

  test("both models account for every conversion; users are independent") {
    val rows = (1 to 40).map { i =>
      val user = (i % 5).toLong
      val kind = i % 4 match {
        case 0 => "purchase"
        case 1 => "click"
        case 2 => "view"
        case _ => "error"
      }
      (i.toLong, ts(i), user, kind, i.toDouble)
    }
    val got = run(rows)
    val purchases = rows.count(_._4 == "purchase")
    val total = rows.filter(_._4 == "purchase").map(_._5).sum
    assert(got.values.map(_._1).sum === purchases)
    assert(got.values.map(_._3).sum === purchases)
    assert(math.abs(got.values.map(_._2).sum - total) < 1e-9)
    assert(math.abs(got.values.map(_._4).sum - total) < 1e-9)
  }

  test("ties on ts break by event id; bad config rejected") {
    val t = ts(1)
    val got = run(Seq(
      (1L, t, 7L, "view", 0.0), (2L, t, 7L, "click", 0.0),
      (3L, ts(2), 7L, "purchase", 1.0),
    ))
    assert(got("view")._1 === 1L && got("click")._3 === 1L)
    intercept[IllegalArgumentException] {
      Attribution.touchAttribution(
        Seq((1L, t, 1L, "a", 0.0)).toDF("event_id", "ts", "user_id",
          "event_type", "value"),
        "user_id", "ts", "event_id", "event_type", "value", "a", Seq("a"))
    }
  }
}
