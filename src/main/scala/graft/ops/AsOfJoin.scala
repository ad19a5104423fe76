package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared eager validation for operator parameters that are spliced into
  * INTERVAL literal syntax: a malformed value must fail at the call site
  * with a clear message, not as an obscure parse error deep in plan
  * analysis (and the parameter must not accept arbitrary expression
  * text). */
object Intervals {
  def validate(param: String, s: String): Unit = {
    val parsed = org.apache.spark.sql.catalyst.util.IntervalUtils
      .safeStringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"interval $s"))
    if (parsed == null) throw new IllegalArgumentException(
      s"$param is not a valid interval literal: '$s' " +
        "(expected e.g. \"15 minutes\", \"1 hour 30 minutes\")")
  }
}

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
    * @param rightCols     right columns to carry (renamed as given)
    * @param direction     "backward" (most recent right.ts <= left.ts,
    *                      the default) or "forward" (earliest right.ts >=
    *                      left.ts); both inclusive at equal ts
    * @param tolerance     optional max |left.ts - right.ts| as an SQL
    *                      interval string (e.g. "15 minutes"); matches
    *                      farther away resolve to NULL, the left row is
    *                      kept (pandas merge_asof semantics). Requires a
    *                      timestamp `ts` column.
    *
    * Null policy (merge_asof's: null keys/times never match): right rows
    * with a null key or null ts are dropped from the timeline; left rows
    * with a null key or null ts are kept but enriched with all-null
    * values. All carried right columns come from ONE matched right row —
    * the fill carries a single struct, so a null inside a matched right
    * row stays null rather than being stitched from an older row. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftTiebreak: String, rightTiebreak: String,
      rightCols: Map[String, String], direction: String = "backward",
      tolerance: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // "__rts" rides along so tolerance can compare the matched row's ts.
    val carried = (rightCols.toSeq ++ Seq(ts -> "__rts")).sortBy(_._2)
    require(!rightCols.values.exists(_ == "__rts"),
      "rightCols must not target the reserved name __rts")
    // The matched right row travels as ONE struct: per-column
    // last(ignoreNulls) fills would stitch values from DIFFERENT right
    // rows whenever a carried column is null in the matched row (and
    // break the tolerance gate, which must apply to the row the values
    // actually came from).
    val rStructType = org.apache.spark.sql.types.StructType(
      carried.map { case (src, dst) =>
        org.apache.spark.sql.types.StructField(dst,
          right.schema(src).dataType, nullable = true)
      })
    // Side 0 = right (sorts before left on equal ts, so a same-instant
    // right row is visible to the left row in either direction). Null
    // key/ts right rows can never legitimately match — drop them here
    // (asc NULLS FIRST would otherwise make a null-ts right row the
    // "most recent" match for early left rows).
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(
        Seq(col(key), col(ts), col(rightTiebreak).as("__tb"),
          lit(0).as("__side"),
          struct(carried.map { case (src, dst) => col(src).as(dst) }: _*)
            .as("__r")): _*)
    val l = left.select(
      Seq(col(key), col(ts), col(leftTiebreak).as("__tb"),
        lit(1).as("__side"), lit(null).cast(rStructType).as("__r")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val order = direction match {
      case "backward" => Seq(col(ts).asc, col("__side").asc, col("__tb").asc)
      // Scan from the future toward the past: "last right seen" is the
      // EARLIEST right row at/after the left row. Equal-ts right rows
      // resolve to the smallest tiebreak (mirror of backward's largest).
      case "forward" => Seq(col(ts).desc, col("__side").asc, col("__tb").desc)
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward, got '$other'")
    }
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__f",
      last(col("__r"), ignoreNulls = true).over(w))
    val inTolerance: Column = tolerance match {
      case None => lit(true)
      case Some(t) =>
        Intervals.validate("asOf tolerance", t)
        val iv = expr(s"INTERVAL $t")
        if (direction == "backward") col("__f").getField("__rts") >= col(ts) - iv
        else col("__f").getField("__rts") <= col(ts) + iv
    }
    // Left rows with a null key/ts keep their columns but match nothing
    // (the explicit gate also covers forward's desc NULLS LAST frame,
    // where a null-ts left row would otherwise see the whole partition).
    val matched = col(key).isNotNull && col(ts).isNotNull && inTolerance
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.toSeq.sortBy(_._2).map { case (_, dst) =>
          when(matched, col("__f").getField(dst)).otherwise(lit(null)).as(dst)
        }: _*)
  }
}
