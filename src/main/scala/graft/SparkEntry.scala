package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, ExtensionQueries, RefQueries, SourceQueries, TpchQueries}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * `queries` is the engine's declared operator inventory: one entry per
  * implemented operator from SURVEY §2, each runnable on a testdata sf dir.
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * correctness gate; entries without an oracle get a weaker rows-only check.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(CoreQueries, RefQueries, ExtensionQueries, AnalyticsQueries,
      SourceQueries, TpchQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // lazy val, not def: Bench resolves queries(name) INSIDE its timed
  // region — a def would rebuild and re-merge all six module maps per
  // measurement.
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  lazy val oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}

/** A named bundle of queries + their DuckDB oracles. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
