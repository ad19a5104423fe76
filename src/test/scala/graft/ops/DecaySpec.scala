package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DecaySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("an event one half-life old contributes half its value") {
    val events = Seq(
      (1L, ts("2024-01-02 00:00:00"), 10.0),  // horizon event
      (1L, ts("2024-01-01 00:00:00"), 8.0),   // 24h old: contributes 4
      (2L, ts("2024-01-01 12:00:00"), 4.0)    // 12h old: 4/sqrt(2)
    ).toDF("user_id", "ts", "value")
    val got = Decay.decayedSum(events, "user_id", "ts", "value", 24.0)
      .select($"user_id", $"n_events", $"decayed_sum")
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(got(1L)._1 == 2 && math.abs(got(1L)._2 - 14.0) < 1e-9)
    assert(got(2L)._1 == 1 &&
      math.abs(got(2L)._2 - 4.0 / math.sqrt(2.0)) < 1e-4)
  }

  test("null values decay to nothing but still count as events") {
    val events = Seq(
      (1L, ts("2024-01-02 00:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 00:00:00"), None)
    ).toDF("user_id", "ts", "value")
    val got = Decay.decayedSum(events, "user_id", "ts", "value", 24.0)
      .select($"n_events", $"decayed_sum").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 5.0)))
  }

  test("decay is anchored at the corpus horizon, not wall clock") {
    // Shifting every timestamp by the same delta must not change scores.
    val base = Seq(
      (1L, ts("2024-01-02 00:00:00"), 10.0),
      (1L, ts("2024-01-01 06:30:00"), 8.0)
    ).toDF("user_id", "ts", "value")
    val shifted = base.withColumn("ts",
      org.apache.spark.sql.functions.expr("ts + INTERVAL 400 DAYS"))
    val a = Decay.decayedSum(base, "user_id", "ts", "value", 24.0)
      .select($"decayed_sum").as[Double].collect()(0)
    val b = Decay.decayedSum(shifted, "user_id", "ts", "value", 24.0)
      .select($"decayed_sum").as[Double].collect()(0)
    assert(a == b)
  }
}
