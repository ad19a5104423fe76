package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for Bench's pure calibration logic (r13): the
  * contract-line parser's brace bound (r12 ADVICE — trailing template
  * fields must never parse as queries) and the degraded-session
  * guard's median flagship ratio. No SparkSession needed. */
class BenchSpec extends AnyFunSuite {

  test("parseQueriesMap stops at the queries object's closing brace") {
    val line = """{"metric":"total","value":259.281,"unit":"sec",""" +
      """"n_queries":2,"queries":{"q1_agg":0.702,"q3_join_agg":1.524},""" +
      """"n_failed":1,"failed":["qx"],"drift_ratio":1.450,""" +
      """"sf":"/root/testdata/sf0.1"}"""
    // drift_ratio is a decimal field AFTER the queries object — the
    // exact shape the r12 ADVICE warned would leak into the map under
    // an unbounded scan (n_failed alone doesn't trip the regex: it is
    // integral).
    assert(Bench.parseQueriesMap(line) ==
      Map("q1_agg" -> 0.702, "q3_join_agg" -> 1.524))
    assert(Bench.parseQueriesMap("no queries marker here") == Map.empty)
    // Unterminated object (truncated tail capture): parse what's there.
    assert(Bench.parseQueriesMap("""{"queries":{"a":1.5,"b":2.0""") ==
      Map("a" -> 1.5, "b" -> 2.0))
  }

  test("medianFlagshipRatio: overlap, sub-0.3s exclusion, empty baseline") {
    val flags = Seq("a", "b", "c", "d")
    // No baseline → 1.0 (no verdict, sidecar is written).
    assert(Bench.medianFlagshipRatio(Map("a" -> 1.0), Map.empty, flags)
      == 1.0)
    // Healthy session: median of {1.0, 1.1, 0.9} = 1.0.
    val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    val curOk = Map("a" -> 1.0, "b" -> 2.2, "c" -> 3.6)
    assert(Bench.medianFlagshipRatio(curOk, prev, flags) == 1.0)
    // Degraded session (the r12 signature — everything ~1.45×).
    val curBad = Map("a" -> 1.45, "b" -> 2.9, "c" -> 5.8)
    assert(Bench.medianFlagshipRatio(curBad, prev, flags) > 1.2)
    // Sub-0.3 s baseline rows are excluded: a 10× swing on a 0.1 s
    // query must not flip the verdict.
    val prevTiny = Map("a" -> 0.1, "b" -> 2.0, "c" -> 4.0)
    val curTiny = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    assert(Bench.medianFlagshipRatio(curTiny, prevTiny, flags) == 1.0)
  }
}
