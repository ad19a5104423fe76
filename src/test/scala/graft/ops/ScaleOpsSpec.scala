package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ScaleOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain inner join on skewed data") {
    // 90% of big rows share one hot key.
    val big = ((1 to 900).map(i => (42, s"b$i")) ++
      (1 to 100).map(i => (i % 20, s"t$i"))).toDF("k", "v")
    val small = (0 to 50).map(i => (i, s"s$i")).toDF("k", "w")
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "w").as[(Int, String, String)].collect().sorted.toSeq
    val salted = ScaleOps.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "v", "w").as[(Int, String, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 42) == 900)
  }

  test("bloomSemiJoin equals the plain left-semi join (no false negatives)") {
    val big = graft.model.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val small = graft.model.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val plain = big.join(small.distinct(), Seq("l_orderkey"), "left_semi")
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Int)].collect().sorted.toSeq
    val bloomed = ScaleOps.bloomSemiJoin(big, small, "l_orderkey", m = 4096)
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("bloomSemiJoin with a tiny saturated filter still returns exact results") {
    // m=64 over ~500 keys saturates the filter (most probes pass) — the
    // prune degrades to a no-op but the trailing semi join keeps the
    // result exact, which is the safety property that matters.
    val big = graft.model.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber")
    val small = graft.model.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val plain = big.join(small.distinct(), Seq("l_orderkey"), "left_semi")
      .as[(Long, Int)].collect().sorted.toSeq
    val bloomed = ScaleOps.bloomSemiJoin(big, small, "l_orderkey", m = 64)
      .as[(Long, Int)].collect().sorted.toSeq
    assert(bloomed == plain)
  }

  test("bloomSemiJoin tolerates caller columns named like its internals") {
    // The probe frame is arbitrary caller data: a column literally named
    // "positions" must not collide with the broadcast filter's array.
    val big = graft.model.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber",
        org.apache.spark.sql.functions.array($"l_linenumber").as("positions"))
    val small = graft.model.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val plain = big.join(small.distinct(), Seq("l_orderkey"), "left_semi")
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Int)].collect().sorted.toSeq
    val bloomed = ScaleOps.bloomSemiJoin(big, small, "l_orderkey", m = 4096)
      .select($"l_orderkey", $"l_linenumber")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(bloomed == plain)
    assert(bloomed.nonEmpty)
  }

  test("bucketed tables join with no exchange (shuffle paid at write time)") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity")
    val ord = graft.model.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
    ScaleOps.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    ScaleOps.writeBucketed(
      ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free, got:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    // One hot key carrying ~100× the median partition's bytes, with the
    // skew thresholds lowered so the fixture-scale skew qualifies. The
    // assertion is on the ADAPTIVE plan AFTER execution: AQE must have
    // replanned the sort-merge join with skew splitting — the runtime
    // half of the engine's skew story (ScaleOps.saltedJoin is the
    // static half for keys known hot in advance).
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val big = ((1 to 60000).map(i => (42, s"hot-payload-$i")) ++
        (1 to 6000).map(i => (i % 200, s"tail-$i"))).toDF("k", "v")
      val right = (0 to 200).flatMap(k => (1 to 5).map(j => (k, s"r$j")))
        .toDF("k", "w")
      val joined = big.join(right, Seq("k"))
      // Execute through THIS QueryExecution (count()/write would build a
      // fresh one and the adaptive re-plan would happen there): the
      // final adaptive plan only exists after an action on this tree.
      assert(joined.collect().length === 60000 * 5 + 6000 * 5)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan, got:\n$plan")
    }
  }

  test("withGlobalIndex assigns contiguous order-respecting positions") {
    val df = Seq(30, 10, 20, 50, 40).toDF("v")
    val (indexed, total) = ScaleOps.withGlobalIndex(df, Seq($"v"), "pos")
    assert(total == 5)
    val r = indexed.as[(Int, Long)].collect().sortBy(_._2)
    assert(r.map(_._1).toSeq == Seq(10, 20, 30, 40, 50))
    assert(r.map(_._2).toSeq == (0L until 5L))
    // Layout must not change any position.
    val (again, _) = ScaleOps.withGlobalIndex(df.repartition(7), Seq($"v"), "pos")
    assert(again.as[(Int, Long)].collect().toSet == r.toSet)
    // No single-partition window stage in the plan.
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("coPartition aligns both sides on the key partitioning") {
    val (a, b) = ScaleOps.coPartition(
      Seq((1, "a")).toDF("k", "v"), Seq((1, "b")).toDF("k", "w"), "k", 4)
    assert(a.rdd.getNumPartitions == 4 && b.rdd.getNumPartitions == 4)
    // Joining co-partitioned sides must not add a new shuffle on top of
    // the explicit repartitions.
    val plan = a.join(b, Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
  }
}
