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

  test("keys never cross: a right row of another user is invisible") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("event_id", "t", "user_id")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 99.0)).toDF("user_id", "t", "v")
    val got = AsOfJoin.asOf(left, right, "user_id", "t", "event_id", "v",
      Map("v" -> "last_v")).select("last_v").collect()(0)
    assert(got.isNullAt(0))
  }
}
