package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guard for the events.ts loader contract (round-4 postmortem: a testdata
  * regeneration flipped ts from TIMESTAMP(NANOS) to timestamp[us] and the
  * then-unconditional nanos→µs conversion broke 12 queries at once).
  *
  * [[Tables.read]] must normalize EVERY fixture generation of events.ts to
  * the same microsecond TimestampType:
  *   - nanos-since-epoch LONG (legacy TIMESTAMP(NANOS) under
  *     spark.sql.legacy.parquet.nanosAsLong=true),
  *   - TIMESTAMP_NTZ (current timestamp[us] with no timezone),
  *   - TIMESTAMP (timestamp[us] tagged UTC) passes through.
  */
class TablesSchemaSpec extends AnyFunSuite with SparkTestBase {

  private def writeFixture(dir: java.nio.file.Path, tsCol: org.apache.spark.sql.Column,
      tsType: DataType): String = {
    import spark.implicits._
    val base = Seq(
      (1L, "u1", "click", 1704067200000000L),  // 2024-01-01T00:00:00Z in µs
      (2L, "u2", "view",  1704067260500000L)
    ).toDF("event_id", "user_id", "kind", "us")
    val df = base.withColumn("ts", tsCol).drop("us")
    assert(df.schema("ts").dataType == tsType, s"fixture setup expected $tsType")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private val expected = Seq(
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")),
    java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:01:00.500Z")))

  private def loadedTs(dir: String): (DataType, Seq[java.sql.Timestamp]) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType,
      df.orderBy("event_id").select("ts").collect().toSeq.map(_.getTimestamp(0)))
  }

  test("legacy nanos-long fixture loads as µs TimestampType with exact instants") {
    val dir = java.nio.file.Files.createTempDirectory("events_nanos")
    // A raw LONG column is what nanosAsLong=true yields for TIMESTAMP(NANOS).
    writeFixture(dir, (col("us") * 1000L).cast(LongType), LongType)
    val (dt, vals) = loadedTs(dir.toString)
    assert(dt == TimestampType)
    assert(vals == expected)
  }

  test("timestamp[us] NTZ fixture loads as µs TimestampType with exact instants") {
    val dir = java.nio.file.Files.createTempDirectory("events_ntz")
    writeFixture(dir, timestamp_micros(col("us")).cast(TimestampNTZType), TimestampNTZType)
    val (dt, vals) = loadedTs(dir.toString)
    assert(dt == TimestampType)
    assert(vals == expected)
  }

  test("timestamp[us] UTC fixture passes through as TimestampType") {
    val dir = java.nio.file.Files.createTempDirectory("events_utc")
    writeFixture(dir, timestamp_micros(col("us")), TimestampType)
    val (dt, vals) = loadedTs(dir.toString)
    assert(dt == TimestampType)
    assert(vals == expected)
  }

  test("driver testdata loads events.ts as TimestampType at every sf") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType, s"at $d")
      assert(df.limit(1).count() == 1)
    }
  }
}
