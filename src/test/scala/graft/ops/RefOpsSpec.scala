package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RefOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("project keeps exactly the named columns, in order") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    assert(RefOps.project(Seq("z", "x"))(df).columns.toSeq == Seq("z", "x"))
  }

  test("project fails fast on a missing column (pandas KeyError contract)") {
    val df = Seq((1, "a")).toDF("x", "y")
    intercept[Exception] { RefOps.project(Seq("x", "nope"))(df).collect() }
  }

  test("stripHtmlSuffix strips only a trailing .html") {
    val df = Seq("dam-nu-abc-10001.html", "a.html.b", "plain").toDF("s")
    val got = df.select(RefOps.stripHtmlSuffix($"s")).as[String].collect()
    assert(got.toSeq == Seq("dam-nu-abc-10001", "a.html.b", "plain"))
  }

  test("parseVnDate is day-first: 03/04/2025 is April 3rd") {
    val got = Seq("03/04/2025").toDF("s")
      .select(RefOps.parseVnDate($"s")).as[java.sql.Date].head()
    assert(got.toString == "2025-04-03")
  }

  test("parseVnDate raises on an invalid date (strictness preserved)") {
    intercept[Exception] {
      Seq("31/02/2025").toDF("s")
        .select(RefOps.parseVnDate($"s")).collect()
    }
  }

  test("tryParseVnDate yields null on an invalid date") {
    val got = Seq("31/02/2025", "01/12/2024").toDF("s")
      .select(RefOps.tryParseVnDate($"s").as("d")).collect()
    assert(got(0).isNullAt(0) && got(1).getDate(0).toString == "2024-12-01")
  }

  test("riFilter keeps only rows whose key exists in the valid set") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val valid = Seq(1, 3, 99).toDF("k")
    val got = RefOps.riFilter(valid, "k")(df).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (3, "c")))
  }

  test("unionAll concatenates by name, tolerating column-order drift") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(("y", 2)).toDF("v", "k")
    val got = RefOps.unionAll(Seq(a, b)).as[(Int, String)].collect().toSet
    assert(got == Set((1, "x"), (2, "y")))
  }

  test("dedupByKeyFirst keeps the first row per key under the given order") {
    val df = Seq((1, 10, "late"), (1, 5, "early"), (2, 7, "only"))
      .toDF("k", "ord", "v")
    val got = RefOps.dedupByKeyFirst(Seq("k"), Seq($"ord"))(df)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(got == Set((1, "early"), (2, "only")))
  }

  test("splitEven is lossless and balanced (fixes the reference's len%5 loss)") {
    // 13 rows / 5 parts: the reference would drop 13 % 5 = 3 rows.
    val df = (1 to 13).toDF("k")
    val parts = RefOps.splitEven(5, Seq($"k"))(df)
    assert(parts.count() == 13)
    val sizes = parts.groupBy("part_id").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.keySet == Set(1, 2, 3, 4, 5))
    assert(sizes.values.forall(n => n == 2 || n == 3))
    assert(sizes.values.sum == 13)
  }
}
