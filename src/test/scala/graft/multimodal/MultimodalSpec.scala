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

  test("decodeStub is a pure function of the bytes") {
    val a = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    val b = MultimodalOps.decodeStub("hello".getBytes("UTF-8"))
    val c = MultimodalOps.decodeStub("hellp".getBytes("UTF-8"))
    assert(a.sameElements(b) && !a.sameElements(c))
  }
}
