package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.Tables

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("binary payload pipeline: documents -> media rows -> features") {
    val media = MultimodalOps.documentsAsMedia(spark, Tables.documents(spark, sf))
    val feats = MultimodalOps.extractFeatures(media, dim = 8).cache()
    val rows = feats.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.n_bytes > 0))
    // Deterministic: a second pass yields identical features.
    val again = MultimodalOps.extractFeatures(media, dim = 8).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall {
      case (a, b) => a.feature.sameElements(b.feature)
    })
    feats.unpersist()
  }

  test("resizeStub hits the byte budget deterministically") {
    val big = (0 until 1000).map(_.toByte).toArray
    val small = MultimodalOps.resizeStub(big, 64)
    assert(small.length == 64)
    assert(small.sameElements(MultimodalOps.resizeStub(big, 64)))
    val tiny = Array[Byte](1, 2)
    assert(MultimodalOps.resizeStub(tiny, 64).sameElements(tiny))
  }

  test("extractFrames fans one media row out to sampled frames") {
    val media = MultimodalOps.documentsAsMedia(spark, Tables.documents(spark, sf))
      .limit(10)
    val frames = MultimodalOps.extractFrames(media, frameSize = 32, every = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length <= 32))
    // Every kept frame index is even in the source frame numbering, i.e.
    // sampling dropped every other frame: count matches the stub.
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (_, fs) =>
      assert(fs.map(_.frame_no).sorted.toSeq == (0 until fs.length))
    }
  }

  test("typed extractFrames matches the declarative multimodal_frames query") {
    import org.apache.spark.sql.functions._
    // The oracled query samples every 3rd 32-byte frame (stride 96); the
    // typed path must produce byte-identical frames so a user can move
    // between the declarative and mapPartitions forms freely.
    val docs = Tables.documents(spark, sf).limit(50).cache()
    val media = MultimodalOps.documentsAsMedia(spark, docs)
    val typed = MultimodalOps.extractFrames(media, frameSize = 32, every = 3)
      .collect()
      .map(f => (f.media_id, f.frame_no.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(f.frame)
          .map("%02x".format(_)).mkString))
      .toSet
    val declarative = docs
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ((col("n") + 95) / 96).cast("int") - 1)).as("frame_no"))
      .select(col("doc_id"), col("frame_no").cast("long"),
        md5(col("text").substr(col("frame_no") * 96 + 1, lit(32))
          .cast("binary")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(typed == declarative)
    docs.unpersist()
  }

  test("decodeStub is a pure function of the bytes") {
    val a = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    val b = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    val c = MultimodalOps.decodeStub("hellp".getBytes("UTF-8"))
    assert(a.sameElements(b) && !a.sameElements(c))
  }
}
