package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 3)
      : Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Double)].collect().toMap

  test("a symmetric 2-cycle is a fixed point at 1/2 each") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"))
    assert(r == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("a hub with two spokes ranks above them; mass is conserved") {
    val r = ranks(Seq("a" -> "b", "a" -> "c", "b" -> "a", "c" -> "a"))
    assert(r("a") > r("b") && r("b") == r("c"))
    // No dangling nodes → ranks sum to 1 up to the per-iteration round.
    assert(math.abs(r.values.sum - 1.0) < 1e-8, r)
  }

  test("dangling nodes leak mass (documented simplified formulation)") {
    val r = ranks(Seq("a" -> "b"))
    assert(r("b") > r("a"))
    assert(r.values.sum < 1.0, r)
  }

  test("parallel edges act as weights") {
    // a splits 2/3 of its mass to b, 1/3 to c; b and c both dangle.
    val r = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c"), iters = 1)
    assert(r("b") > r("c") && r("c") > r("a"))
    val n = 3.0
    val teleport = (1.0 - 0.85) / n
    assert(r("c") == BigDecimal(teleport + 0.85 * ((1.0 / n) / 3.0))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("result is partitioning-invariant (exact decimal contribution sums)") {
    val edges = (0 until 400).map(i =>
      (s"h${i % 13}", s"h${(i * 7 + 3) % 13}"))
    val base = ranks(edges)
    val repart = Graph.pageRank(
      edges.toDF("src", "dst").repartition(17), "src", "dst", 3)
      .as[(String, Double)].collect().toMap
    assert(base == repart)
  }

  test("connectedComponents labels each node with its component minimum") {
    val edges = Seq("b" -> "c", "c" -> "d", "x" -> "y").toDF("src", "dst")
    val r = Graph.connectedComponents(edges, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(r == Map("b" -> "b", "c" -> "b", "d" -> "b", "x" -> "x", "y" -> "x"))
  }

  test("connectedComponents treats direction as irrelevant") {
    // d→a merges {a,b} and {c,d} even though no edge leaves a or c.
    val edges = Seq("a" -> "b", "c" -> "d", "d" -> "a").toDF("src", "dst")
    val r = Graph.connectedComponents(edges, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(r.values.toSet == Set("a") && r.keySet == Set("a", "b", "c", "d"))
  }

  test("degrees counts parallel edges and zero-fills missing directions") {
    val edges = Seq("a" -> "b", "a" -> "b", "b" -> "a", "a" -> "c")
      .toDF("src", "dst")
    val r = Graph.degrees(edges, "src", "dst")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r == Map("a" -> ((3L, 1L)), "b" -> ((1L, 2L)), "c" -> ((0L, 1L))))
  }

  test("null endpoints are dropped, not ranked") {
    val df = Seq((Some("a"), Some("b")), (Some("b"), Some("a")),
      (None, Some("a")), (Some("b"), None)).toDF("src", "dst")
    val r = Graph.pageRank(df, "src", "dst", 2)
      .as[(String, Double)].collect().toMap
    assert(r.keySet == Set("a", "b"))
  }
}
