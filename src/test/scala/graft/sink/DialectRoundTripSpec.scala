package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pushes the mysql/postgres dialect surfaces as close to live execution
  * as this environment allows. The zero-egress image ships exactly one
  * embeddable JDBC engine — Derby, from the Spark classpath; there is no
  * H2 jar (which could emulate MySQL/PostgreSQL compat modes in-JVM), so
  * the two non-ANSI merge statements cannot execute against a real
  * engine here. What CAN be proven live, is:
  *
  *  1. the POSTGRES-dialect INSERT chunks — where all the literal-
  *     escaping risk concentrates — are ANSI-conforming by construction
  *     (quote doubling only, backslashes literal), so they execute
  *     unchanged on Derby; the staged load they feed converges to
  *     [[Upsert.upsert]], replay included;
  *  2. the three dialects' merge statements are column-ISOMORPHIC: same
  *     conflict keys, same updated-column set (every non-PK column),
  *     same inserted-column set. Combined with DerbyRoundTripSpec's
  *     live proof that the ANSI merge ≡ Upsert.upsert, the residual
  *     mysql/postgres risk is pure engine syntax, which only a real
  *     MySQL/PostgreSQL can witness — documented environmental gap,
  *     not a semantic one.
  */
class DialectRoundTripSpec extends AnyFunSuite with SparkTestBase {

  private val url = "jdbc:derby:memory:graftdialect;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def exec(conn: java.sql.Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def readBack(table: String) = spark.read
    .format("jdbc").option("url", url)
    .option("dbtable", "\"" + table + "\"").load()

  test("postgres-dialect INSERT chunks execute on Derby and converge to Upsert.upsert") {
    import spark.implicits._
    withConn { conn =>
      exec(conn, """CREATE TABLE "gadgets" (
        "gid" INT NOT NULL PRIMARY KEY,
        "name" VARCHAR(64),
        "price" DOUBLE)""")
      exec(conn, """INSERT INTO "gadgets" VALUES
        (1, 'cable', 3.50), (2, 'plug', 1.25)""")
    }
    val target = readBack("gadgets")

    // Backslash + quote in one value: postgres escaping must store the
    // backslash SINGLE (standard_conforming_strings), unlike mysql's
    // doubled form — Derby follows the same standard, so a wrong
    // escaping choice fails loudly right here.
    val batch = Seq(
      (2, raw"o'brien \ plug", 1.99),
      (3, "adapter", 7.00)
    ).toDF("gid", "name", "price")

    // ANSI staging DDL (Derby has no bare LIKE), postgres-dialect
    // inserts, ANSI merge: the postgres-specific statement under test is
    // the INSERT chunk — the one statement class generated per data row.
    withConn { conn =>
      exec(conn, MergeSql.createStaging("gadgets_stage", "gadgets", "ansi"))
      MergeSql.loadPlan(batch, "postgres", "gadgets", "gadgets_stage",
          pk = Seq("gid"), chunkSize = 1)
        .inserts.collect().foreach(r => exec(conn, r.getString(0)))
      exec(conn, MergeSql.merge("ansi", "gadgets", "gadgets_stage",
        Seq("gid"), batch.columns.toSeq))
      exec(conn, MergeSql.dropStaging("gadgets_stage"))
    }

    val got = readBack("gadgets").orderBy($"gid")
      .as[(Int, String, Double)].collect().toSeq
    val want = Upsert.upsert(target, batch, Seq("gid")).orderBy($"gid")
      .as[(Int, String, Double)].collect().toSeq
    assert(got == want)
    assert(got.exists(_._2 == raw"o'brien \ plug"),
      s"backslash must land single under standard escaping: $got")

    // Replay the same load: at-least-once delivery must converge.
    withConn { conn =>
      exec(conn, MergeSql.createStaging("gadgets_stage", "gadgets", "ansi"))
      MergeSql.loadPlan(batch, "postgres", "gadgets", "gadgets_stage",
          pk = Seq("gid"), chunkSize = 1)
        .inserts.collect().foreach(r => exec(conn, r.getString(0)))
      exec(conn, MergeSql.merge("ansi", "gadgets", "gadgets_stage",
        Seq("gid"), batch.columns.toSeq))
      exec(conn, MergeSql.dropStaging("gadgets_stage"))
    }
    val replayed = readBack("gadgets").orderBy($"gid")
      .as[(Int, String, Double)].collect().toSeq
    assert(replayed == want, "replay must be idempotent")
  }

  test("the three dialect merges are column-isomorphic (same keys, updates, inserts)") {
    val pk = Seq("pid", "shard")
    val cols = Seq("pid", "shard", "name", "price", "updated")
    val nonPk = cols.filterNot(pk.contains)

    def updatedCols(merge: String): Set[String] =
      """"([A-Za-z_]+)" = """.r.findAllMatchIn(merge).map(_.group(1)).toSet
    def insertedCols(merge: String): Seq[String] =
      """INSERT INTO "\w+" \(([^)]+)\)|NOT MATCHED THEN INSERT \(([^)]+)\)""".r
        .findFirstMatchIn(merge)
        .map(m => Option(m.group(1)).getOrElse(m.group(2)))
        .get.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq

    val mysql = MergeSql.merge("mysql", "t", "s", pk, cols)
    val postgres = MergeSql.merge("postgres", "t", "s", pk, cols)
    val ansi = MergeSql.merge("ansi", "t", "s", pk, cols)

    // Every dialect updates exactly the non-PK columns...
    assert(updatedCols(mysql) == nonPk.toSet, mysql)
    assert(updatedCols(postgres) == nonPk.toSet, postgres)
    // (ansi's ON clause also matches the `= ` pattern; subtract the keys)
    assert(updatedCols(ansi) -- pk == nonPk.toSet, ansi)
    // ...inserts exactly the full column list, in order...
    assert(insertedCols(mysql) == cols, mysql)
    assert(insertedCols(postgres) == cols, postgres)
    assert(insertedCols(ansi) == cols, ansi)
    // ...and keys the conflict on the PK alone.
    assert(postgres.contains("""ON CONFLICT ("pid", "shard")"""), postgres)
    assert(ansi.contains("""t."pid" = s."pid" AND t."shard" = s."shard""""), ansi)
    // mysql's conflict target is the table's PRIMARY KEY itself (no
    // column list in the statement) — the isomorphism there is that no
    // PK column appears in the update set, asserted above.
    assert(!updatedCols(mysql).exists(pk.contains), mysql)
  }
}
