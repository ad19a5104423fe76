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

  test("decodeStub is a pure function of the bytes") {
    val a = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    val b = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    val c = MultimodalOps.decodeStub("hellp".getBytes("UTF-8"))
    assert(a.sameElements(b) && !a.sameElements(c))
  }
}
