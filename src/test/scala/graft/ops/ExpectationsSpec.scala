package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ExpectationsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val E = Expectations

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  test("row checks: one aggregate pass, null never passes a contract") {
    val df = Seq(
      (Some(1L), Some("O"), Some(10.0)),
      (Some(2L), Some("X"), Some(-5.0)),   // bad status, bad range
      (None, None, None),                   // nulls violate all three
      (Some(3L), Some("F"), Some(99.0)),
    ).toDF("k", "status", "price")
    val got = report(E.rowChecks(df, Seq(
      E.notNull("k"),
      E.acceptedValues("status", Seq("O", "F")),
      E.inRange("price", 0.0, 100.0),
      E.predicate("k_positive", $"k" > 0L))))
    assert(got("not_null(k)") === ((1L, false)))
    assert(got("accepted_values(status in O|F)") === ((2L, false)))
    assert(got("range(price in [0.0,100.0])") === ((2L, false)))
    assert(got("k_positive") === ((1L, false)))
    // exactly one aggregate over the input: a single scan in the plan
    val plan = E.rowChecks(df, Seq(E.notNull("k"), E.inRange("price", 0, 1)))
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation|LogicalRDD".r.findAllIn(plan).size <= 2, plan)
  }

  test("unique counts excess rows and null keys; clean keys pass") {
    val df = Seq(Some(1L), Some(2L), Some(2L), Some(2L), None)
      .toDF("k")
    val got = report(E.unique(df, Seq("k")))
    // 2 excess copies of key 2 + 1 null key
    assert(got("unique(k)") === ((3L, false)))
    val clean = report(E.unique(Seq(1L, 2L, 3L).toDF("k"), Seq("k")))
    assert(clean("unique(k)") === ((0L, true)))
  }

  test("foreignKey counts orphans, exempts null child keys") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = report(E.foreignKey(child, Seq("ck"), parent, Seq("pk")))
    assert(got("foreign_key(ck)") === ((1L, false))) // only the 9
  }

  test("foldReports over any partition equals the whole-table row checks") {
    val df = Seq(
      (Some(1L), Some("O")), (Some(2L), Some("X")), (None, None),
      (Some(3L), Some("F")), (Some(4L), Some("Y")),
    ).toDF("k", "status")
    val checks = Seq(E.notNull("k"), E.acceptedValues("status", Seq("O", "F")))
    val whole = report(E.rowChecks(df, checks))
    val folded = report(E.foldReports(Seq(
      E.rowChecks(df.filter($"k".isNull || $"k" % 2 === 0), checks),
      E.rowChecks(df.filter($"k".isNotNull && $"k" % 2 === 1), checks))))
    assert(folded === whole)
    intercept[IllegalArgumentException](E.foldReports(Nil))
  }

  test("foldReports rejects cross-row kinds loudly instead of summing them") {
    // unique/foreignKey reports share the row-check schema, but their
    // counts are NOT additive across batches — folding them must fail
    // at execution, not produce a silently-wrong total.
    val df = Seq(1L, 1L, 2L).toDF("k")
    val bad = E.foldReports(Seq(E.unique(df, Seq("k")),
      E.unique(df, Seq("k"))))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("non-additive check kind"), e.getMessage)
  }

  test("composite unique keys and multi-column foreign keys") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a")).toDF("k1", "k2")
    assert(report(E.unique(df, Seq("k1", "k2")))("unique(k1,k2)")
      === ((1L, false)))
    val parent = Seq((1L, "a")).toDF("p1", "p2")
    // only (1,b) is an orphan; the duplicated (1,a) rows both match
    assert(report(E.foreignKey(df, Seq("k1", "k2"), parent,
      Seq("p1", "p2")))("foreign_key(k1,k2)") === ((1L, false)))
  }
}
