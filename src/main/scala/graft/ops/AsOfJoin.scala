package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `right.ts <= left.ts` in the same key group (the time-series
  * enrichment operator Spark lacks; SURVEY §2.6 notes its absence in the
  * reference too).
  *
  * Implementation is the union-merge technique, not a range join: tag
  * both sides, union, and take a running "last right value" window over
  * (ts, side) per key. One shuffle on the key, one sort — cost
  * O((|L|+|R|) log) per key group, versus the |L|×|R| blowup of the naive
  * inequality join. Ties (equal ts) resolve right-before-left (a right
  * row at exactly left.ts matches), then by the explicit `tiebreak`
  * column — fully deterministic.
  */
object AsOfJoin {

  /** @param left          rows to enrich
    * @param right         timeline providing the as-of values
    * @param key           equality key column (both sides)
    * @param ts            event-time column (both sides)
    * @param leftTiebreak  disambiguates equal-ts rows on the left
    * @param rightTiebreak disambiguates equal-ts rows on the right
    * @param rightCols     right columns to carry (renamed as given) */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftTiebreak: String, rightTiebreak: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.toSeq.sortBy(_._2)
    // Side 0 = right (sorts before left on equal ts, so a same-instant
    // right row is visible to the left row).
    val r = right.select(
      Seq(col(key), col(ts), col(rightTiebreak).as("__tb"), lit(0).as("__side")) ++
        carried.map { case (src, dst) => col(src).as(s"__r_$dst") }: _*)
    val l = left.select(
      Seq(col(key), col(ts), col(leftTiebreak).as("__tb"), lit(1).as("__side")) ++
        carried.map { case (_, dst) => lit(null).as(s"__r_$dst") } ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = carried.foldLeft(unioned) { case (df, (_, dst)) =>
      df.withColumn(s"__f_$dst",
        last(col(s"__r_$dst"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carried.map { case (_, dst) => col(s"__f_$dst").as(dst) }: _*)
  }
}
