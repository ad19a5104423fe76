package graft.sink

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Executes the generated staged-MERGE load against a REAL JDBC database —
  * embedded Derby, in-memory, from the Spark classpath — closing the gap
  * between "the SQL strings look right" (MergeSqlSpec) and "the SQL
  * actually runs" (reference dags/etl.py:178-199 runs its MERGE on live
  * MySQL). The `ansi` dialect is standard MERGE INTO, so what executes
  * here is the same statement shape DB2/Oracle/SQL Server/H2 accept.
  *
  * The full loop: seed target over JDBC → loadPlan(create staging,
  * chunked inserts, merge, drop) executed statement-by-statement →
  * read back via spark.read.jdbc → must equal Upsert.upsert computed
  * purely in Spark. That last equality is the load-path law: the JDBC
  * sink and the DataFrame upsert are the same operator.
  */
class DerbyRoundTripSpec extends AnyFunSuite with SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def exec(conn: java.sql.Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql) finally st.close()
  }

  private def readBack() = spark.read
    .format("jdbc")
    .option("url", url)
    .option("dbtable", "\"products\"")
    .load()

  test("ansi loadPlan executes on embedded Derby and equals Upsert.upsert") {
    import spark.implicits._

    withConn { conn =>
      exec(conn, """CREATE TABLE "products" (
        "pid" INT NOT NULL PRIMARY KEY,
        "name" VARCHAR(64),
        "price" DOUBLE,
        "updated" TIMESTAMP)""")
      exec(conn, """INSERT INTO "products" VALUES
        (1, 'keyboard', 19.99, TIMESTAMP('2024-01-01 00:00:00')),
        (2, 'mouse', 9.50, TIMESTAMP('2024-01-01 00:00:00')),
        (3, 'monitor', 199.00, TIMESTAMP('2024-01-01 00:00:00'))""")
    }
    val target = readBack()

    val t0 = java.sql.Timestamp.valueOf("2024-06-15 12:30:45.123456")
    val batch = Seq(
      // overwrite pid 2 — name exercises quote doubling in sqlLiteral
      (2, "o'brien's mouse", 11.00, t0),
      // overwrite pid 3 with a NULL price
      (3, "monitor", Double.NaN, t0), // NaN must land as SQL NULL
      (4, "webcam", 45.25, t0),
      (5, "hub \\ dock", 30.00, t0)   // backslash stays literal in ansi
    ).toDF("pid", "name", "price", "updated")

    val plan = MergeSql.loadPlan(batch, "ansi", "products",
      "products_stage", pk = Seq("pid"), chunkSize = 2)
    withConn { conn =>
      exec(conn, plan.create)
      plan.inserts.collect().foreach(r => exec(conn, r.getString(0)))
      exec(conn, plan.merge)
      exec(conn, plan.drop)
    }

    // NaN is not representable in SQL, so the expected table carries NULL
    // where the batch carried NaN — the same transform sqlLiteral applies.
    val batchSqlVisible = batch.withColumn("price",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.isnan($"price"), null)
        .otherwise($"price"))
    val expected = Upsert.upsert(target, batchSqlVisible, Seq("pid"))

    val got = readBack()
    assert(got.count() == 5)
    val gotSet = got.collect().map(Row.unapplySeq(_).get).toSet
    val expSet = expected.collect().map(Row.unapplySeq(_).get).toSet
    assert(gotSet == expSet)

    // Idempotency (the reference's safe daily re-run): replaying the same
    // batch through a fresh staging table changes nothing.
    val again = MergeSql.loadPlan(batch, "ansi", "products",
      "products_stage2", pk = Seq("pid"), chunkSize = 2)
    withConn { conn =>
      exec(conn, again.create)
      again.inserts.collect().foreach(r => exec(conn, r.getString(0)))
      exec(conn, again.merge)
      exec(conn, again.drop)
    }
    val replay = readBack().collect().map(Row.unapplySeq(_).get).toSet
    assert(replay == expSet)
  }
}
