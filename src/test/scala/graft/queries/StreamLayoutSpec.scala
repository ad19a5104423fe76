package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Regression pin for the silent-empty streaming source (r7): the file
  * streaming source was fed the fixture dir with a pathGlobFilter that
  * matches only a single-FILE `events.parquet` — under a DIRECTORY
  * table (part files inside `events.parquet/`, the layout every
  * `df.write.parquet` produces) the glob matched nothing and the
  * stream processed zero rows without any error. The 10× scale probe
  * caught it as a 0.29 s "result"; this spec keeps it caught at test
  * speed. */
class StreamLayoutSpec extends AnyFunSuite with SparkTestBase {

  test("streaming queries process directory-shaped event tables, not silently nothing") {
    val dir = Files.createTempDirectory("graft_dirtbl").toString
    val events = graft.model.Tables.events(spark, sf)
    events.write.parquet(s"$dir/events.parquet")
    val expected = events.count()
    assert(expected > 0)
    val anomalies = graft.SparkEntry.queries("stream_anomaly")(spark, dir)
    assert(anomalies.count() == expected,
      "every event must flow through the stream under the directory layout")
    val decayed = graft.SparkEntry.queries("stream_decay")(spark, dir)
    assert(decayed.count() ==
      events.select("user_id").distinct().count())
  }
}
