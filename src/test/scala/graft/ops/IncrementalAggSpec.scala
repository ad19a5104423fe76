package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IncrementalAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("a", Some(1L), 10.0), ("a", Some(2L), 20.0), ("b", None, 5.0),
    ("b", Some(4L), 2.5), ("c", None, 0.0), ("a", Some(3L), 1.0),
  ).toDF("k", "v", "x")

  private def agg(df: DataFrame): DataFrame = df.groupBy($"k")
    .agg(count(lit(1)).as("cnt"), sum($"v").as("sv"),
      sum($"x".cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("sx"))

  private def collect(df: DataFrame) =
    df.as[(String, Long, Option[Long], java.math.BigDecimal)]
      .collect().toSet

  test("merge(agg(b1), agg(b2)) == agg(b1 union b2)") {
    val b1 = rows.filter($"x" > 2.0)
    val b2 = rows.filter($"x" <= 2.0)
    val merged = IncrementalAgg.mergeSums(agg(b1), agg(b2), Seq("k"))
    assert(collect(merged) == collect(agg(rows)))
  }

  test("merging is associative over three batches") {
    val parts = Seq(rows.filter($"v".isNull),
      rows.filter($"v" <= 2), rows.filter($"v" > 2))
    val merged = parts.map(agg).reduce(
      (a, b) => IncrementalAgg.mergeSums(a, b, Seq("k")))
    assert(collect(merged) == collect(agg(rows)))
  }

  test("a key present in only one batch survives with its values") {
    val merged = IncrementalAgg.mergeSums(
      agg(rows.filter($"k" === "a")), agg(rows.filter($"k" === "b")),
      Seq("k"))
    assert(collect(merged) ==
      collect(agg(rows.filter($"k" =!= "c"))))
  }

  test("mismatched schemas are rejected, not silently null-joined") {
    val bad = agg(rows).withColumnRenamed("sv", "other")
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeSums(agg(rows), bad, Seq("k"))
    }
  }
}
