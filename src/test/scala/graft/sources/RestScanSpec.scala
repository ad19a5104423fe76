package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RestScanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("paginated fetches per key until the terminator, excluding it") {
    val t = new FakeTransport(Map(
      "u/a/1" -> """{"data": [1]}""", "u/a/2" -> """{"data": [2]}""",
      "u/a/3" -> """{"data": null}""",
      "u/b/1" -> """{"data": null}"""))
    val got = RestScan.paginated(Seq("a", "b").toDS(),
        (k, p) => s"u/$k/$p", t, RestScan.productLastPage)
      .collect().toSet
    assert(got == Set(("a", 1, """{"data": [1]}"""), ("a", 2, """{"data": [2]}""")))
  }

  test("hitting maxPages without a terminator fails loudly (no silent truncation)") {
    val t = new FakeTransport(Map(
      "u/a/1" -> """{"data": [1]}""", "u/a/2" -> """{"data": [2]}""",
      "u/a/3" -> """{"data": [3]}"""))
    val ex = intercept[org.apache.spark.SparkException] {
      RestScan.paginated(Seq("a").toDS(), (k, p) => s"u/$k/$p", t,
        RestScan.productLastPage, maxPages = 3).collect()
    }
    assert(ex.getMessage.contains("maxPages") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxPages")))
  }

  test("rating terminator fires on empty array, not on a populated one") {
    assert(RestScan.ratingLastPage("""{"data": {"ratings": []}}"""))
    assert(!RestScan.ratingLastPage("""{"data": {"ratings": [{"x": 1}]}}"""))
  }

  test("product terminator fires on JSON null data only") {
    assert(RestScan.productLastPage("""{"data": null}"""))
    assert(!RestScan.productLastPage("""{"data": []}"""))
    assert(!RestScan.productLastPage("""{"data": [{"x": 1}]}"""))
  }

  test("perKey fetches exactly once per key") {
    val t = new FakeTransport(Map("d/x" -> "bx", "d/y" -> "by"))
    val got = RestScan.perKey(Seq("x", "y").toDS(), k => s"d/$k", t)
      .collect().toSet
    assert(got == Set(("x", "bx"), ("y", "by")))
  }

  test("unknown URL fails loudly (fixture drift guard)") {
    val t = new FakeTransport(Map.empty)
    intercept[org.apache.spark.SparkException] {
      RestScan.perKey(Seq("x").toDS(), k => s"d/$k", t).collect()
    }
  }
}
