package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.Curation

class QualityModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def fixtureLabel =
    Curation.qualityPredicate(col("text"),
      Curation.QualityThresholds()).cast("double")

  test("training is deterministic and partitioning-invariant") {
    val docs = graft.model.Tables.documents(spark, sf)
    val a = QualityModel.train(docs, "text", "n_chars", fixtureLabel)
    val b = QualityModel.train(docs.repartition(7), "text", "n_chars",
      fixtureLabel)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 5)
    assert(a.exists(_ != 0.0), "eight GD steps must move the weights")
  }

  test("the distilled model separates the classes it was trained to mimic") {
    val docs = graft.model.Tables.documents(spark, sf)
      .filter($"text".isNotNull)
    val w = QualityModel.train(docs, "text", "n_chars", fixtureLabel)
    val scored = docs.select(fixtureLabel.as("y"),
      QualityModel.score("text", "n_chars", w).as("s"))
      .as[(Double, Double)].collect()
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty,
      "fixture must exercise both label classes")
    assert(scored.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
    val meanPos = pos.sum / pos.length
    val meanNeg = neg.sum / neg.length
    assert(meanPos > meanNeg,
      f"no separation: mean(pos)=$meanPos%.4f <= mean(neg)=$meanNeg%.4f")
  }

  test("a linearly separable synthetic corpus is classified correctly") {
    // Long stopword-rich texts labeled by the rule gate vs short junk:
    // after training, the soft scores must rank every positive above
    // every negative (perfect AUC on a separable problem).
    val good = (0 until 20).map(i =>
      (i.toLong, Seq.fill(30)("the quick fox of it").mkString(" ")))
    val bad = (100 until 120).map(i => (i.toLong, "zzz qqq"))
    val docs = (good ++ bad).toDF("doc_id", "text")
      .withColumn("n_chars", length($"text"))
    val w = QualityModel.train(docs, "text", "n_chars", fixtureLabel)
    val scored = docs.select($"doc_id",
      QualityModel.score("text", "n_chars", w).as("s"))
      .as[(Long, Double)].collect().toMap
    val worstGood = good.map(g => scored(g._1)).min
    val bestBad = bad.map(b => scored(b._1)).max
    assert(worstGood > bestBad,
      s"not separated: worst good $worstGood <= best bad $bestBad")
  }

  test("null text is excluded from training and scores to null") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it for a while and more"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .withColumn("n_chars", coalesce(length($"text"), lit(0)))
    val w = QualityModel.train(docs, "text", "n_chars", fixtureLabel)
    val s2 = docs.select($"doc_id",
      QualityModel.score("text", "n_chars", w).as("s"))
      .as[(Long, Option[Double])].collect().toMap
    assert(s2(1L).isDefined)
    assert(s2(2L).isEmpty, "null text must score null, not a default")
  }

  test("calibrate sweeps confusion counts with monotone curve laws") {
    // scores 0.1..1.0 with truth = score > 0.5 (perfectly separable)
    val scored = (1 to 10).map(i => (i / 10.0, i > 5)).toDF("score", "y")
    val got = QualityModel.calibrate(scored, "score", "y",
      Seq(0.25, 0.55, 0.85))
      .orderBy($"threshold")
      .as[(Double, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      (0.25, 8L, 5L, 3L, 0L, Some(5.0 / 8), Some(1.0)),
      (0.55, 5L, 5L, 0L, 0L, Some(1.0), Some(1.0)),
      (0.85, 2L, 2L, 0L, 3L, Some(1.0), Some(2.0 / 5))))
    // laws: n_kept and recall non-increasing in threshold; tp+fn = P
    assert(got.map(_._2) === got.map(_._2).sorted.reverse)
    assert(got.map(r => r._3 + r._5).distinct === Seq(5L))
    // a threshold keeping nothing has null precision, not a crash
    val none = QualityModel.calibrate(scored, "score", "y", Seq(2.0))
      .select($"n_kept", $"precision")
      .as[(Long, Option[Double])].collect().head
    assert(none === ((0L, None)))
  }
}
