package graft.sink

import org.apache.spark.sql.{DataFrame, Row}

/** SQL generation for pushing the staged-MERGE load into a JDBC
  * warehouse — the literal load path of the reference (staging table +
  * chunked multi-row INSERT + merge + drop, dags/etl.py:178-199 with
  * `chunksize=1000, method="multi"`), re-expressed as statement
  * generation so the engine stays dependency-free: callers hand the
  * statements to any JDBC connection (per PARTITION on executors — the
  * driver never materializes the table; each partition streams its own
  * chunked inserts, which is the distributed form of the reference's
  * single-process load).
  *
  * Three merge dialects:
  *  - mysql:    INSERT ... SELECT ... ON DUPLICATE KEY UPDATE col=VALUES(col)
  *  - postgres: INSERT ... SELECT ... ON CONFLICT (pk) DO UPDATE SET
  *              col = EXCLUDED.col
  *  - ansi:     SQL-standard MERGE INTO ... WHEN MATCHED THEN UPDATE /
  *              WHEN NOT MATCHED THEN INSERT (Derby, DB2, Oracle, SQL
  *              Server, H2) — this is the dialect DerbyRoundTripSpec
  *              executes end-to-end over a real embedded-JDBC connection.
  * All implement the same semantics as [[Upsert.upsert]]: insert absent
  * PKs, overwrite every non-PK column for present ones, never delete.
  */
object MergeSql {

  // microsecond precision (DATETIME(6) / timestamptz both accept it)
  private val utcFormatter = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  private def q(ident: String): String = {
    require(ident.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe identifier: $ident")
    // Validated AND quoted: the regex blocks injection, but a reserved
    // word (order, group, desc — all regex-legal) still breaks the
    // statement unquoted. Double quotes are the SQL-standard identifier
    // quoting; mysql accepts them under ANSI_QUOTES, which the load
    // session must set (the reference's pandas to_sql quotes the same
    // way).
    "\"" + ident + "\""
  }

  /** CREATE the staging table with the target's shape. Dialects diverge:
    * mysql is `LIKE target`, postgres requires the parenthesized
    * column-list form `(LIKE target)`. */
  def createStaging(staging: String, target: String,
      dialect: String = "mysql"): String = dialect match {
    case "mysql" => s"CREATE TABLE ${q(staging)} LIKE ${q(target)}"
    case "postgres" => s"CREATE TABLE ${q(staging)} (LIKE ${q(target)})"
    // Standard CTAS-with-no-data (Derby/DB2 syntax); constraints are not
    // copied, which is exactly right for a staging table.
    case "ansi" =>
      s"CREATE TABLE ${q(staging)} AS SELECT * FROM ${q(target)} WITH NO DATA"
    case other => throw new IllegalArgumentException(
      s"unknown dialect '$other' (mysql|postgres|ansi)")
  }

  /** One chunked multi-row INSERT into staging (the reference's
    * `method="multi"`); values are SQL-escaped literals using the
    * dialect's string rules — mysql interprets backslash escapes by
    * default, postgres (standard_conforming_strings) treats backslash
    * literally and needs only quote doubling. */
  def insertChunk(staging: String, columns: Seq[String],
      rows: Seq[Seq[Any]], dialect: String = "mysql"): String = {
    require(rows.nonEmpty, "empty chunk")
    val cols = columns.map(q).mkString(", ")
    val values = rows.map(_.map(v => sqlLiteral(v, dialect))
      .mkString("(", ", ", ")")).mkString(",\n")
    s"INSERT INTO ${q(staging)} ($cols) VALUES\n$values"
  }

  /** The MERGE from staging into the target. */
  def merge(dialect: String, target: String, staging: String,
      pk: Seq[String], columns: Seq[String]): String = {
    val nonPk = columns.filterNot(pk.contains)
    require(pk.nonEmpty && nonPk.nonEmpty, "need pk and non-pk columns")
    val cols = columns.map(q).mkString(", ")
    dialect match {
      case "mysql" =>
        val updates = nonPk.map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")
        s"""INSERT INTO ${q(target)} ($cols)
           |SELECT $cols FROM ${q(staging)}
           |ON DUPLICATE KEY UPDATE $updates""".stripMargin
      case "postgres" =>
        val updates = nonPk.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
        val keys = pk.map(q).mkString(", ")
        s"""INSERT INTO ${q(target)} ($cols)
           |SELECT $cols FROM ${q(staging)}
           |ON CONFLICT ($keys) DO UPDATE SET $updates""".stripMargin
      case "ansi" =>
        val on = pk.map(c => s"t.${q(c)} = s.${q(c)}").mkString(" AND ")
        val updates = nonPk.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
        val insertVals = columns.map(c => s"s.${q(c)}").mkString(", ")
        s"""MERGE INTO ${q(target)} t
           |USING ${q(staging)} s
           |ON $on
           |WHEN MATCHED THEN UPDATE SET $updates
           |WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($insertVals)""".stripMargin
      case other => throw new IllegalArgumentException(
        s"unknown dialect '$other' (mysql|postgres|ansi)")
    }
  }

  def dropStaging(staging: String): String = s"DROP TABLE ${q(staging)}"

  /** The full statement sequence for one load of `df`, chunked like the
    * reference (1000 rows/statement). Returns per-partition iterators of
    * INSERT statements via `mapPartitions` shape — exposed here as a
    * DataFrame of statements so tests (and JDBC-less environments) can
    * inspect the exact SQL; a production sink would execute each
    * partition's statements over its own connection. */
  def loadPlan(df: DataFrame, dialect: String, target: String,
      staging: String, pk: Seq[String],
      chunkSize: Int = 1000): LoadPlan = {
    val columns = df.columns.toSeq
    import df.sparkSession.implicits._
    val inserts = df.mapPartitions { rows =>
      rows.grouped(chunkSize).map { chunk =>
        insertChunk(staging, columns,
          chunk.map((r: Row) => r.toSeq), dialect)
      }
    }.toDF("statement")
    LoadPlan(
      createStaging(staging, target, dialect),
      inserts,
      merge(dialect, target, staging, pk, columns),
      dropStaging(staging))
  }

  final case class LoadPlan(create: String, inserts: DataFrame,
      merge: String, drop: String)

  private[sink] def sqlLiteral(v: Any, dialect: String = "mysql"): String =
    v match {
      case null => "NULL"
      case s: String =>
        // mysql's default sql_mode interprets backslash escapes inside
        // string literals, so backslashes must double; postgres with
        // standard_conforming_strings (default since 9.1) takes them
        // literally — doubling there would corrupt the stored data.
        val body = if (dialect == "mysql")
          s.replace("\\", "\\\\").replace("'", "''")
        else s.replace("'", "''")
        "'" + body + "'"
      // Timestamp.toString renders in the JVM default timezone — the
      // generated literal would shift whenever executor TZ differs from
      // the warehouse session TZ. Format the instant explicitly in UTC
      // (warehouse sessions are expected to run with time_zone='+00:00').
      case t: java.sql.Timestamp => "'" + utcFormatter.format(t.toInstant) + "'"
      case t: java.time.Instant => "'" + utcFormatter.format(t) + "'"
      case d: java.sql.Date => s"'$d'"
      case d: java.time.LocalDate => s"'$d'"
      // NaN/Infinity have no SQL literal form (Number.toString emits bare
      // NaN/Infinity tokens that fail only at execution on the warehouse)
      // and neither mysql DOUBLE nor standard SQL can store them — NULL is
      // the only representable value.
      case n: java.lang.Double if n.isNaN || n.isInfinite => "NULL"
      case n: java.lang.Float if n.isNaN || n.isInfinite => "NULL"
      case n: java.lang.Number => n.toString
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case other => throw new IllegalArgumentException(
        s"unsupported literal type: ${other.getClass.getName}")
    }
}
