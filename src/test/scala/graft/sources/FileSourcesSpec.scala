package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FileSourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_filesources_spec_$name"

  // Adversarial content: embedded delimiter, quote, newline, empty
  // string, null, negative/subnormal-ish doubles, micro-precision ts.
  private def tricky = Seq(
    (1L, "plain", Some(1.5), Some(Timestamp.valueOf("2024-03-01 10:11:12.123456"))),
    (2L, "comma, inside", Some(-0.1), Some(Timestamp.valueOf("1999-12-31 23:59:59.999999"))),
    (3L, "quote \" and 'single'", Some(1.0e-300), None),
    (4L, "line\nbreak", None, Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (5L, "", Some(123456789.123456789), Some(Timestamp.valueOf("2024-06-15 06:07:08.000001"))),
    (6L, null.asInstanceOf[String], Some(2.0), None),
  ).toDF("id", "s", "d", "ts")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // File reads are always nullable in Spark regardless of the declared
  // schema — compare names and types, not nullability.
  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq

  test("csv round trip preserves every value exactly") {
    val back = FileSources.csvRoundTrip(tricky, tmp("csv"))
    assert(shape(back) == shape(tricky))
    assert(canon(back) == canon(tricky))
  }

  test("json round trip preserves every value exactly") {
    val back = FileSources.jsonRoundTrip(tricky, tmp("json"))
    assert(shape(back) == shape(tricky))
    assert(canon(back) == canon(tricky))
  }

  test("orc round trip preserves every value exactly") {
    val back = FileSources.orcRoundTrip(tricky, tmp("orc"))
    assert(shape(back) == shape(tricky))
    assert(canon(back) == canon(tricky))
  }

  test("csv read is schema-explicit: no inference pass, types as declared") {
    val back = FileSources.csvRoundTrip(tricky, tmp("csv2"))
    assert(back.schema("d").dataType.typeName == "double")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    assert(back.schema("id").dataType.typeName == "long")
  }
}
