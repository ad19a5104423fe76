package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** Relational-core query set over the driver fixtures (SURVEY §7 step 6).
  *
  * The reference delegates all declarative query processing to MySQL
  * (SURVEY §3.2); this engine owns it via Catalyst. Each entry here is a
  * lazy DataFrame plan; the paired DuckDB oracle SQL lives in [[oracles]].
  *
  * Float-parity rule: any SUM/AVG over double columns is computed in exact
  * DECIMAL arithmetic (order-independent, engine-independent) and cast to
  * double on output, so the driver's hash compare cannot be broken by
  * partial-aggregation ordering differences between Spark and DuckDB.
  */
object CoreQueries extends graft.QueryModule {

  /** Exact decimal sum of a double column, surfaced as double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(($"l_extendedprice".cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(18, 4)) - $"l_discount".cast(DecimalType(18, 4)))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
