package graft.model

import java.math.{BigDecimal => JBigDecimal}
import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DecimalType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TypedSpec extends AnyFunSuite with SparkTestBase {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)

  private val shopRow = Row(
    "s1", "Shop One", new JBigDecimal("97.50"), new JBigDecimal("4.80"),
    "c1", "<PHONE>", new JBigDecimal("4.70"), 120, "fast", 45,
    "yes", "2d", "south")

  test("shopInfo round-trips values through the typed surface") {
    val ds = Typed.shopInfo(df(Schemas.shopInfo, shopRow))
    val s = ds.head()
    assert(s.shop_id == "s1")
    assert(s.good_review_percent == new JBigDecimal("97.50"))
    assert(s.rating_count.contains(120))
    assert(s.warehourse_region_name == "south")
  }

  test("typed lambdas work and nullable ints surface as None") {
    val nullish = Row("s2", null, null, null, null, null, null, null,
      null, null, null, null, null)
    val ds = Typed.shopInfo(df(Schemas.shopInfo, shopRow, nullish))
    val kept = ds.filter(_.rating_count.exists(_ > 100)).collect()
    assert(kept.map(_.shop_id).toSeq == Seq("s1"))
    assert(ds.filter(_.shop_id == "s2").head().rating_count.isEmpty)
  }

  test("rating carries DATE and DECIMAL(15,2) through") {
    val r = Row("r1", "s1", "addr", 5, "good", "ok",
      Date.valueOf("2024-05-17"), "c1", "u1", "p", "/p",
      new JBigDecimal("150000.00"))
    val ds = Typed.rating(df(Schemas.rating, r))
    val row = ds.head()
    assert(row.update_time == Date.valueOf("2024-05-17"))
    assert(row.price == new JBigDecimal("150000.00"))
  }

  test("extra columns are dropped, missing columns fail fast") {
    import org.apache.spark.sql.functions.lit
    val withExtra = df(Schemas.productDetail, Row(
      "p1", "n", "/c", new JBigDecimal("1.00"), new JBigDecimal("2.00"),
      new JBigDecimal("1.00"), new JBigDecimal("2.00"), "s1", "c", "sc"))
      .withColumn("surplus", lit(1))
    assert(Typed.productDetail(withExtra).columns.toSeq ==
      Schemas.productDetail.fieldNames.toSeq)
    val broken = withExtra.drop("price", "surplus")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Typed.productDetail(broken)
    }
  }

  test("typed surface keeps the DDL decimal precision, not encoder default") {
    val ds = Typed.shopInfo(df(Schemas.shopInfo, shopRow))
    val dt = ds.schema("good_review_percent").dataType
    assert(dt == DecimalType(10, 2))
  }

  test("typed surface re-pins decimals the input frame has drifted wider") {
    import org.apache.spark.sql.functions.{col, lit}
    // Arithmetic widens DECIMAL(10,2); the typed boundary must cast back
    // to the DDL type, not inherit the drift.
    val drifted = df(Schemas.shopInfo, shopRow)
      .withColumn("score", col("score") * lit(1))
    assert(drifted.schema("score").dataType != DecimalType(10, 2))
    val ds = Typed.shopInfo(drifted)
    assert(ds.schema("score").dataType == DecimalType(10, 2))
    assert(ds.collect().head.score == new JBigDecimal("4.80"))
  }
}
