package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Every declared query must run and return rows at smoke scale, and every
  * oracle key must reference a declared query. */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("driver entry point returns rows (the t1 smoke contract)") {
    // Exercises SparkEntry.entry LITERALLY — including its hardcoded
    // sf0.001 path and the flagship-query map lookup, either of which
    // could break with no other local signal (the per-query smoke tests
    // below call the map directly).
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Legitimately empty at smoke scale: every sf0.001 customer has an
    * order and every part ships, so the anti-join shapes return nothing. */
  private val mayBeEmpty = Set("q_except", "q_not_exists_anti")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0)
    }
  }
}
