package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: declarative contract checks over a table
  * (the dbt-tests / Deequ-shaped surface), evaluated into ONE report
  * frame — (check, kind, n_violations, passed) — that a load pipeline
  * gates on before publishing. The reference's warehouse declares its
  * contracts in DDL (PKs/FKs, dwh.sql:2,18,28,32,44) and discovers
  * violations at load time; this operator makes the same contracts a
  * queryable pre-load step.
  *
  * Scale shape: all ROW-LEVEL checks (non-null, accepted values, range,
  * arbitrary predicate) fold into ONE conditional-count aggregate over
  * a single column-pruned scan — adding a row check never adds a scan.
  * `unique` is one groupBy on the key (the one exchange a uniqueness
  * proof fundamentally needs); `foreignKey` is one left-anti join whose
  * parent side is a distinct key projection (broadcastable when the
  * dimension is small — Catalyst decides from stats). Each check emits
  * exactly one row, so the report is constant-size no matter the table.
  */
object Expectations {

  /** A named row-level predicate: a row VIOLATES the check when
    * `holds` is false or null (null never passes a contract). */
  final case class RowCheck(name: String, kind: String, holds: Column)

  def notNull(c: String): RowCheck =
    RowCheck(s"not_null($c)", "not_null", col(c).isNotNull)

  // Check names encode their PARAMETERS, not just the column: two
  // different contracts on the same column must stay distinguishable,
  // or foldReports' groupBy would silently merge their counts.
  def acceptedValues(c: String, values: Seq[String]): RowCheck =
    RowCheck(s"accepted_values($c in ${values.mkString("|")})",
      "accepted_values", col(c).isin(values.map(lit): _*))

  def inRange(c: String, lo: Double, hi: Double): RowCheck =
    RowCheck(s"range($c in [$lo,$hi])", "range",
      col(c) >= lo && col(c) <= hi)

  def predicate(name: String, holds: Column): RowCheck =
    RowCheck(name, "predicate", holds)

  /** All row checks in one aggregate pass; one output row per check. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one row check")
    val counted = df.agg(
      count(when(!coalesce(checks.head.holds, lit(false)), 1))
        .as("__v0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        count(when(!coalesce(c.holds, lit(false)), 1)).as(s"__v${i + 1}")
      }: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val names = checks.zipWithIndex
      .map { case (c, i) => (i, c.name, c.kind) }
      .toDF("__i", "check", "kind")
    // unpivot the 1×N count row against the N-row name table: stack the
    // counts into (idx, n_violations) and join — both sides are
    // broadcast-sized (one row / |checks| rows).
    val stacked = counted.select(
      explode(array(checks.indices.map(i =>
        struct(lit(i).as("__i"), col(s"__v$i").as("n_violations"))): _*))
        .as("s")).select(col("s.__i"), col("s.n_violations"))
    names.join(stacked, Seq("__i"))
      .select(col("check"), col("kind"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** Fold per-batch [[rowChecks]] reports into one: violation counts
    * are plain sums (a row check inspects one row, so counts are
    * additive across any partition of the table into batches) and
    * `passed` is recomputed from the folded total. The incremental-DQ
    * form: a daily load checks only its batch and folds into the
    * running report — O(batch) work per day, and the fold provably
    * equals the whole-table report (driver-gated). NOT applicable to
    * [[unique]]/[[foreignKey]], whose evidence is cross-row — those
    * reports share this schema, so folding them would silently sum
    * non-additive counts; the fold therefore REJECTS them at execution
    * time (raise_error on any non-row-level kind) instead of producing
    * a wrong total. */
  def foldReports(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "at least one report")
    val rowKinds = Seq("not_null", "accepted_values", "range", "predicate")
    reports.reduce(_ unionByName _)
      .withColumn("kind",
        when(col("kind").isin(rowKinds.map(lit): _*), col("kind"))
          .otherwise(raise_error(concat(
            lit("foldReports: non-additive check kind: "), col("kind")))))
      .groupBy(col("check"), col("kind"))
      .agg(sum(col("n_violations")).as("n_violations"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Key-uniqueness check: n_violations = rows in excess of one per
    * key (the number of rows a dedup would remove). Null keys count as
    * violations of the key contract, not as a group. */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "key columns required")
    val name = s"unique(${keyCols.mkString(",")})"
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val dupes = df.filter(!anyNull)
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("__dups"))
    val nulls = df.agg(count(when(anyNull, 1)).as("__nulls"))
    dupes.crossJoin(nulls).select(
      lit(name).as("check"), lit("unique").as("kind"),
      (col("__dups") + col("__nulls")).as("n_violations"),
      (col("__dups") + col("__nulls") === 0L).as("passed"))
  }

  /** Referential-integrity check: child rows whose (non-null) key has
    * no match in the parent's key set. Null child keys are exempt (SQL
    * FK semantics); declare a separate [[notNull]] to forbid them. */
  def foreignKey(child: DataFrame, childCols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    require(childCols.nonEmpty && childCols.size == parentCols.size,
      "child/parent key arity must match")
    val name = s"foreign_key(${childCols.mkString(",")})"
    val p = parent.select(parentCols.zip(childCols)
      .map { case (pc, cc) => col(pc).as(cc) }: _*).distinct()
    val violations = child
      .filter(childCols.map(col(_).isNotNull).reduce(_ && _))
      .select(childCols.map(col): _*)
      .join(p, childCols, "left_anti")
    violations.agg(count(lit(1)).as("n_violations")).select(
      lit(name).as("check"), lit("foreign_key").as("kind"),
      col("n_violations"),
      (col("n_violations") === 0L).as("passed"))
  }
}
