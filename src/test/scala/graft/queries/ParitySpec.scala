package graft.queries

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the cross-engine float-parity helpers — above all the exact-
  * integer HALF_UP mean, whose whole point is behavior ON the `.00005`
  * tie where `round(double, 4)` splits Spark and DuckDB (the r8 sf0.1
  * postmortem in SCALING.md). */
class ParitySpec extends AnyFunSuite with SparkTestBase {

  private def mean4(s: String, n: Long): Double = {
    import spark.implicits._
    Seq((s, n)).toDF("s", "n")
      .select(Parity.exactMeanRound4(
        col("s").cast(DecimalType(22, 8)), col("n")).as("m"))
      .as[Double].collect().head
  }

  test("exactMeanRound4 matches plain round(s/n, 4) away from ties") {
    assert(mean4("10.00000000", 3) == 3.3333)   // 3.3333... rounds down
    assert(mean4("-10.00000000", 3) == -3.3333)
    assert(mean4("1.00000000", 8) == 0.125)     // exact quotient
    assert(mean4("0.00000000", 7) == 0.0)
  }

  test("exactMeanRound4 resolves exact .00005 ties HALF_UP away from zero") {
    // s/n = 4.90585 exactly — the doc-4750 shape from the postmortem.
    assert(mean4("98.11700000", 20) == 4.9059)
    assert(mean4("-98.11700000", 20) == -4.9059)
    // One ulp of decimal below/above the tie stays on its own side.
    assert(mean4("98.11699902", 20) == 4.9058)
    assert(mean4("-98.11699902", 20) == -4.9058)
    assert(mean4("98.11700020", 20) == 4.9059)
  }

  test("exactMeanRound4 handles a non-power-of-ten divisor tie") {
    // s/n = 0.00015 with n = 3: s = 0.00045.
    assert(mean4("0.00045000", 3) == 0.0002)
    assert(mean4("-0.00045000", 3) == -0.0002)
  }

  test("exactMeanRound4Sql is the same function (spot values via DuckDB-shaped eval)") {
    // The SQL mirror must agree with the Column form on the same
    // inputs; evaluate it through Spark SQL (integer // becomes DIV).
    val sql = Parity.exactMeanRound4Sql("CAST(98.11700000 AS DECIMAL(22,8))", "20")
      .replace("//", " DIV ")
    val v = spark.sql(s"SELECT $sql AS m").collect().head.getDouble(0)
    assert(v == 4.9059)
  }
}
