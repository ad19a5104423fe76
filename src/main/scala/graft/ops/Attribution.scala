package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Parity

/** Touch attribution: credit each conversion event to the user's first
  * and last preceding touch — the two classic single-touch marketing
  * attribution models, and (the same computation under another name)
  * the provenance question "which upstream signal preceded this
  * outcome" any event pipeline answers. One row per channel:
  * (channel, n_first, value_first, n_last, value_last); conversions
  * with no preceding touch land in the 'none' channel, so the two
  * models each account for every conversion (their n/value totals are
  * equal by construction — spec-pinned).
  *
  * Scale shape: ONE window exchange, partitioned by the
  * (high-cardinality) user, ordered by the tie-free (ts, event id)
  * pair; first/last touch are `first/last(..., ignoreNulls)` over the
  * preceding-rows frame, so no self-join and no second shuffle.
  * Conversion values aggregate with the engine's decimal-sum parity
  * discipline ([[Parity.dsum]]). */
object Attribution {

  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      conversionType: String, touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty, "at least one touch type")
    require(!touchTypes.contains(conversionType),
      "a conversion cannot be its own touch")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(lit): _*), col(typeCol))
    val conversions = events
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(coalesce(col("__first"), lit("none")).as("__fc"),
        coalesce(col("__last"), lit("none")).as("__lc"),
        col(valueCol).as("__v"))
    def byModel(channel: Column, n: String, v: String) =
      conversions.groupBy(channel.as("channel"))
        .agg(count(lit(1)).as(n), Parity.dsum(col("__v")).as(v))
    byModel(col("__fc"), "n_first", "value_first")
      .join(byModel(col("__lc"), "n_last", "value_last"), Seq("channel"),
        "full_outer")
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("value_first"), lit(0.0)).as("value_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("value_last"), lit(0.0)).as("value_last"))
  }
}
