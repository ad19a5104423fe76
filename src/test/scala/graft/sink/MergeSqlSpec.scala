package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MergeSqlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("mysql merge mirrors the reference's ON DUPLICATE KEY UPDATE") {
    val sql = MergeSql.merge("mysql", "rating", "rating_stage",
      Seq("rating_id"), Seq("rating_id", "score", "content"))
    assert(sql ==
      """INSERT INTO "rating" ("rating_id", "score", "content")
        |SELECT "rating_id", "score", "content" FROM "rating_stage"
        |ON DUPLICATE KEY UPDATE "score" = VALUES("score"), "content" = VALUES("content")""".stripMargin)
  }

  test("postgres merge uses ON CONFLICT DO UPDATE with EXCLUDED") {
    val sql = MergeSql.merge("postgres", "t", "s", Seq("id"), Seq("id", "v"))
    assert(sql ==
      """INSERT INTO "t" ("id", "v")
        |SELECT "id", "v" FROM "s"
        |ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"""".stripMargin)
  }

  test("insertChunk renders escaped multi-row VALUES") {
    val sql = MergeSql.insertChunk("s", Seq("id", "name"),
      Seq(Seq(1L, "it's"), Seq(2L, null)))
    assert(sql ==
      """INSERT INTO "s" ("id", "name") VALUES
        |(1, 'it''s'),
        |(2, NULL)""".stripMargin)
  }

  test("string escaping is dialect-aware (backslash doubling is mysql-only)") {
    assert(MergeSql.sqlLiteral("""C:\tmp""", "mysql") == """'C:\\tmp'""")
    assert(MergeSql.sqlLiteral("""C:\tmp""", "postgres") == """'C:\tmp'""")
    assert(MergeSql.sqlLiteral("it's", "postgres") == "'it''s'")
  }

  test("non-finite doubles render as NULL, not invalid NaN/Infinity tokens") {
    assert(MergeSql.sqlLiteral(Double.NaN) == "NULL")
    assert(MergeSql.sqlLiteral(Double.PositiveInfinity) == "NULL")
    assert(MergeSql.sqlLiteral(Float.NegativeInfinity) == "NULL")
    assert(MergeSql.sqlLiteral(1.5d) == "1.5")
  }

  test("timestamps render in UTC regardless of JVM default timezone") {
    val instant = java.time.Instant.parse("2024-01-02T03:04:05.123456Z")
    val expected = "'2024-01-02 03:04:05.123456'"
    val prev = java.util.TimeZone.getDefault
    try {
      for (tz <- Seq("America/New_York", "Asia/Ho_Chi_Minh")) {
        java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone(tz))
        assert(MergeSql.sqlLiteral(java.sql.Timestamp.from(instant)) == expected)
        assert(MergeSql.sqlLiteral(instant) == expected)
      }
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("staging DDL is dialect-aware (postgres needs the parenthesized LIKE)") {
    assert(MergeSql.createStaging("s", "t") == """CREATE TABLE "s" LIKE "t"""")
    assert(MergeSql.createStaging("s", "t", "postgres") ==
      """CREATE TABLE "s" (LIKE "t")""")
  }

  test("reserved-word column names are quoted, not emitted bare") {
    val sql = MergeSql.merge("postgres", "t", "s",
      Seq("id"), Seq("id", "order", "group"))
    assert(sql.contains("\"order\" = EXCLUDED.\"order\""))
    assert(!sql.matches("(?s).*[ (]order[,)].*"),
      "no unquoted reserved word may appear")
  }

  test("identifiers are validated against injection") {
    intercept[IllegalArgumentException] {
      MergeSql.merge("mysql", "t; DROP TABLE x", "s", Seq("id"), Seq("id", "v"))
    }
  }

  test("loadPlan chunks rows like the reference (1000/statement) and stays distributed") {
    val df = (1 to 2500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1) // single partition => chunk count is deterministic
    val plan = MergeSql.loadPlan(df, "mysql", "t", "t_stage", Seq("id"))
    val stmts = plan.inserts.as[String].collect()
    assert(stmts.length == 3) // 1000 + 1000 + 500
    assert(stmts.forall(
      _.startsWith("""INSERT INTO "t_stage" ("id", "v") VALUES""")))
    assert(plan.create == """CREATE TABLE "t_stage" LIKE "t"""")
    assert(plan.drop == """DROP TABLE "t_stage"""")
    // Values survive the round trip in order within a chunk.
    assert(stmts(2).linesIterator.toSeq(1) == "(2001, 'v2001'),")
  }
}
