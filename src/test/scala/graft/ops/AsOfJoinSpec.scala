package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left row, per key") {
    val left = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L),
      (101L, ts("2024-01-01 12:00:00"), 1L),
      (102L, ts("2024-01-01 09:00:00"), 2L), // before any right row
    ).toDF("event_id", "t", "user_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0, 900L),
      (1L, ts("2024-01-01 11:00:00"), 20.0, 901L),
      (2L, ts("2024-01-01 09:30:00"), 30.0, 902L),
    ).toDF("user_id", "t", "v", "rid")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "rid",
      Map("v" -> "last_v", "rid" -> "last_rid"))
      .select("event_id", "last_v", "last_rid")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) == ((Some(10.0), Some(900L))))
    assert(got(101L) == ((Some(20.0), Some(901L))))
    assert(got(102L) == ((None, None)), "left row before any right row gets nulls")
  }

  test("a right row at exactly the left timestamp matches (right-before-left ties)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 7L)).toDF("event_id", "t", "user_id")
    val right = Seq((7L, ts("2024-01-01 10:00:00"), 5.0)).toDF("user_id", "t", "v")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
      Map("v" -> "last_v")).select("last_v").as[Option[Double]].head()
    assert(got.contains(5.0))
  }

  test("forward direction picks the earliest right row at or after") {
    val left = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L),
      (101L, ts("2024-01-01 12:30:00"), 1L), // after every right row
    ).toDF("event_id", "t", "user_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 5.0),  // in the past: invisible
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 12:00:00"), 30.0),
    ).toDF("user_id", "t", "v")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
      Map("v" -> "next_v"), direction = "forward")
      .select("event_id", "next_v").as[(Long, Option[Double])].collect().toMap
    assert(got(100L).contains(20.0))
    assert(got(101L).isEmpty, "no right row after the last left row")
  }

  test("tolerance nulls out matches farther than the interval") {
    val left = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L), // last view 09:55 — in range
      (101L, ts("2024-01-01 12:00:00"), 1L), // last view 10:05 — too old
    ).toDF("event_id", "t", "user_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:55:00"), 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2.0),
    ).toDF("user_id", "t", "v")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
      Map("v" -> "last_v"), tolerance = Some("15 minutes"))
      .select("event_id", "last_v").as[(Long, Option[Double])].collect().toMap
    assert(got(100L).contains(1.0))
    assert(got(101L).isEmpty, "match beyond tolerance resolves to null")
  }

  test("malformed tolerance fails eagerly with a clear message") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("event_id", "t", "user_id")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("user_id", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
        Map("v" -> "last_v"), tolerance = Some("15 minutes); DROP TABLE x"))
    }
    assert(e.getMessage.contains("not a valid interval literal"))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
        Map("v" -> "last_v"), tolerance = Some("banana"))
    }
  }

  test("keys never cross: a right row of another user is invisible") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("event_id", "t", "user_id")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 99.0)).toDF("user_id", "t", "v")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
      Map("v" -> "last_v")).select("last_v").collect()(0)
    assert(got.isNullAt(0))
  }

  test("a matched right row's null value stays null (no stitching from older rows)") {
    // r2 is the match (latest <= left.t) but carries a null v: the output
    // must be (v=null, rid=20) from ONE row — not v from r1 with rid
    // from r2.
    val left = Seq((100L, ts("2024-01-01 12:00:00"), 1L))
      .toDF("event_id", "t", "user_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(5.0), 10L),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double], 20L),
    ).toDF("user_id", "t", "v", "rid")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "rid",
      Map("v" -> "last_v", "rid" -> "last_rid"))
      .select("last_v", "last_rid")
      .as[(Option[Double], Option[Long])].head()
    assert(got == ((None, Some(20L))))
  }

  test("tolerance applies to the row the values came from, not a stitched one") {
    // The match (11:59, null v) is in tolerance; the only non-null v is
    // far outside it. Nothing outside tolerance may surface.
    val left = Seq((100L, ts("2024-01-01 12:00:00"), 1L))
      .toDF("event_id", "t", "user_id")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Option(5.0), 10L),
      (1L, ts("2024-01-01 11:59:00"), Option.empty[Double], 20L),
    ).toDF("user_id", "t", "v", "rid")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "rid",
      Map("v" -> "last_v", "rid" -> "last_rid"),
      tolerance = Some("15 minutes"))
      .select("last_v", "last_rid")
      .as[(Option[Double], Option[Long])].head()
    assert(got == ((None, Some(20L))))
  }

  test("null keys and null timestamps never match (merge_asof policy)") {
    val left = Seq(
      (100L, Option(ts("2024-01-01 12:00:00")), Option(1L)),
      (101L, Option(ts("2024-01-01 12:00:00")), Option.empty[Long]), // null key
      (102L, Option.empty[java.sql.Timestamp], Option(1L)),          // null ts
    ).toDF("event_id", "t", "user_id")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), 5.0),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00")), 66.0), // null key
      (Option(1L), Option.empty[java.sql.Timestamp], 77.0),          // null ts
    ).toDF("user_id", "t", "v")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
      Map("v" -> "last_v"))
      .select("event_id", "last_v").as[(Long, Option[Double])].collect().toMap
    assert(got(100L).contains(5.0), "real rows still match")
    assert(got(101L).isEmpty, "null-key left row is kept, unenriched")
    assert(got(102L).isEmpty, "null-ts left row is kept, unenriched")
    assert(got.size == 3)
  }
}
