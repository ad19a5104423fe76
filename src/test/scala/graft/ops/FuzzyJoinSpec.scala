package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def brute(l: DataFrame, r: DataFrame, k: Int): Set[(String, String, Int)] =
    l.select(col("a")).distinct().where(col("a").isNotNull)
      .crossJoin(r.select(col("b")).distinct().where(col("b").isNotNull))
      .select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("d"))
      .where(col("d") <= k)
      .as[(String, String, Int)].collect().toSet

  private def blocked(l: DataFrame, r: DataFrame, k: Int, q: Int = 2) =
    FuzzyJoin.editDistancePairs(l, "a", r, "b", k, q)
      .as[(String, String, Int)].collect().toSet

  test("blocked join returns exactly the brute-force pairs (k=1 and k=2)") {
    val left = Seq("kitten", "sitting", "flaw", "lawn", "saturday",
      "sunday", "graft", "craft", "spark", "sparc", "NATION_7").toDF("a")
    val right = Seq("mitten", "fitting", "flaws", "dawn", "sundays",
      "graft", "shark", "sparks", "NAION_7", "NATION_7").toDF("b")
    for (k <- Seq(1, 2))
      assert(blocked(left, right, k) == brute(left, right, k), s"k=$k")
  }

  test("short strings below the gram threshold still pair exactly") {
    // len < q·(k+1) = 4: no survivor-gram guarantee — the short tier
    // must catch these.
    val left = Seq("ab", "a", "xyz", "abc").toDF("a")
    val right = Seq("b", "ax", "xy", "abcd", "zzz").toDF("b")
    assert(blocked(left, right, 1) == brute(left, right, 1))
  }

  test("duplicate and null inputs collapse to distinct non-null pairs") {
    val left = Seq(Some("aaa"), Some("aaa"), None).toDF("a")
    val right = Seq(Some("aab"), Some("aab"), None).toDF("b")
    val got = blocked(left, right, 1)
    assert(got == Set(("aaa", "aab", 1)))
  }

  test("maxDist 0 degenerates to exact equality of distinct values") {
    val left = Seq("x1", "x2", "y1").toDF("a")
    val right = Seq("x1", "y1", "z9").toDF("b")
    assert(blocked(left, right, 0) ==
      Set(("x1", "x1", 0), ("y1", "y1", 0)))
  }
}
