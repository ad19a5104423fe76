package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventsOps.{UserEvent, UserTotals}

class StatefulStreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("flatMapGroupsWithState accumulates per-user totals across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventsOps.runningTotals(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("running_out").start()
    try {
      input.addData(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0))
      q.processAllAvailable()
      val afterB1 = spark.table("running_out").as[UserTotals]
        .collect().map(u => u.user_id -> ((u.n_events, u.total_value))).toMap
      assert(afterB1(1L) == ((2L, 15.0)) && afterB1(2L) == ((1L, 1.0)))

      input.addData(UserEvent(1, 2.5))
      q.processAllAvailable()
      // Update mode appends the refreshed totals; the latest row for user
      // 1 must carry state accumulated across BOTH batches.
      val rows = spark.table("running_out").as[UserTotals].collect()
      val latestU1 = rows.filter(_.user_id == 1L).maxBy(_.n_events)
      assert(latestU1.n_events == 3L && latestU1.total_value == 17.5)
    } finally q.stop()
  }
}
