package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.dedup.Dedup

class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("exactDedupStream drops cross-batch duplicates within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val q = Dedup.exactDedupStream(docs, "text", "ts", "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream_out").start()
    try {
      input.addData((1L, "the quick brown fox", ts(0)),
        (2L, "The  Quick   Brown Fox", ts(1)), // same fingerprint as 1
        (3L, "something else entirely", ts(2)))
      q.processAllAvailable()
      input.addData((4L, "the quick brown fox", ts(5)), // dup of batch 1
        (5L, "fresh document text", ts(6)))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream_out")
        .select("doc_id").as[Long].collect().toSet
      // One survivor per fingerprint, across batch boundaries.
      assert(kept.intersect(Set(1L, 2L, 4L)).size == 1)
      assert(kept.contains(3L) && kept.contains(5L))
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("batch form drops the same duplicates (stream ≡ batch semantics)") {
    val batch = Seq((1L, "the quick brown fox"),
      (2L, "The  Quick   Brown Fox"), (3L, "something else entirely"),
      (4L, "the quick brown fox"), (5L, "fresh document text"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactDedup(batch, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }
}
