package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.Tables

class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("kmv returns the exact count for groups smaller than k") {
    val df = (1 to 50).map(i => ("g", i.toLong)).toDF("g", "k")
    val got = Sketches.kmvDistinct(df, $"g", $"k", k = 256)
      .select("n_kept", "est_distinct").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((50L, 50L)))
  }

  test("hashQuantiles is exact for groups smaller than the sample size") {
    val df = (1 to 101).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val got = Sketches.hashQuantiles(df, $"g", $"id", $"v",
        Seq(0.0, 0.5, 1.0), k = 1024)
      .orderBy($"q").select("value").as[Double].collect()
    assert(got.toSeq == Seq(1.0, 51.0, 101.0))
  }

  test("hashQuantiles is partitioning-invariant (bottom-k sample wins anywhere)") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag", concat($"l_orderkey", lit("_"), $"l_linenumber")
        .as("id"), $"l_extendedprice")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hashQuantiles(df, $"l_returnflag", $"id", $"l_extendedprice",
          Seq(0.25, 0.5, 0.75), k = 256)
        .collect().map(_.toSeq).toSet
    assert(run(li.repartition(1)) == run(li.repartition(13)))
  }

  test("hashQuantiles median tracks the exact median on the fixture") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    val est = Sketches.hashQuantiles(li, $"l_returnflag",
        concat($"l_orderkey", lit("_"), $"l_linenumber"), $"l_extendedprice",
        Seq(0.5), k = 512)
      .select($"group".as[String], $"value".as[Double])
      .collect().toMap
    exact.foreach { case (flag, m) =>
      val e = est(flag)
      assert(math.abs(e - m) / m < 0.15, s"$flag: est=$e exact=$m")
    }
  }

  test("cms estimate is one-sided: never below the true count") {
    val li = Tables.lineitem(spark, sf)
    val sk = Sketches.countMin(li, $"l_suppkey")
    val probes = spark.range(1, 21).select($"id".as("key"))
    val est = Sketches.cmsLookup(sk, probes)
      .select($"key".as[Long], $"est_count".as[Long]).collect().toMap
    val truth = li.groupBy($"l_suppkey").count()
      .select($"l_suppkey".as[Long], $"count".as[Long]).collect().toMap
    (1L to 20L).foreach { k =>
      assert(est(k) >= truth.getOrElse(k, 0L),
        s"suppkey $k: est=${est(k)} < true=${truth.getOrElse(k, 0L)}")
    }
  }

  test("cms is linear: shard sketches summed == whole-corpus sketch") {
    val li = Tables.lineitem(spark, sf)
    val whole = Sketches.countMin(li, $"l_suppkey")
    val shards = Sketches.cmsMerge(
      Sketches.countMin(li.filter($"l_orderkey" % 2 === 0), $"l_suppkey")
        .union(Sketches.countMin(li.filter($"l_orderkey" % 2 =!= 0), $"l_suppkey")))
    assert(whole.collect().map(_.toSeq).toSet ==
      shards.collect().map(_.toSeq).toSet)
  }

  test("bloom has no false negatives and merges by position union") {
    val orders = Tables.orders(spark, sf)
    val filt = Sketches.bloomBuild(orders, $"o_custkey")
    val present = orders.select($"o_custkey".as("key")).distinct().limit(50)
    val got = Sketches.bloomContains(filt, present)
      .select($"maybe_member".as[Boolean]).collect()
    assert(got.nonEmpty && got.forall(identity))
    // OR-merge: union of shard filters == whole filter
    val a = Sketches.bloomBuild(orders.filter($"o_orderkey" % 2 === 0), $"o_custkey")
    val b = Sketches.bloomBuild(orders.filter($"o_orderkey" % 2 =!= 0), $"o_custkey")
    val merged = a.union(b)
      .select(explode($"positions").as("pos")).distinct()
      .groupBy().agg(array_sort(collect_list($"pos")).as("positions"))
    assert(merged.as[Seq[Long]].head() == filt.as[Seq[Long]].head())
  }

  test("kmv estimate is within 20% of the true distinct count") {
    val orders = Tables.orders(spark, sf).select($"o_orderkey")
    val truth = orders.distinct().count()
    val est = Sketches.kmvDistinct(orders.withColumn("g", lit(1)),
        $"g", $"o_orderkey", k = 256)
      .select("est_distinct").as[Long].head()
    assert(math.abs(est - truth).toDouble / truth < 0.20, s"est=$est truth=$truth")
  }

  test("kmv is partitioning-invariant (same sketch any layout)") {
    val df = Tables.orders(spark, sf).select(lit("g").as("g"), $"o_orderkey")
    val a = Sketches.kmvDistinct(df.repartition(1), $"g", $"o_orderkey")
      .collect().map(_.toSeq).toSet
    val b = Sketches.kmvDistinct(df.repartition(7), $"g", $"o_orderkey")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("kmv sketches merge: shard sketches combine into the whole-corpus sketch") {
    val df = Tables.orders(spark, sf).select(lit("g").as("g"), $"o_orderkey")
    val whole = Sketches.kmvSketch(df, $"g", $"o_orderkey")
      .as[(String, Seq[Long])].collect().toMap
    val shard1 = Sketches.kmvSketch(df.filter($"o_orderkey" % 2 === 0), $"g", $"o_orderkey")
    val shard2 = Sketches.kmvSketch(df.filter($"o_orderkey" % 2 =!= 0), $"g", $"o_orderkey")
    val merged = Sketches.kmvMerge(shard1.unionByName(shard2))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == whole && whole("g").size == 256)
    // and the estimate folded from the merged sketch equals the direct one
    val direct = Sketches.kmvDistinct(df, $"g", $"o_orderkey")
      .collect().map(_.toSeq).toSet
    val folded = Sketches.kmvEstimate(Sketches.kmvMerge(shard1.unionByName(shard2)))
      .collect().map(_.toSeq).toSet
    assert(folded == direct)
  }

  test("hll buckets merge by max: union of shards == whole") {
    val df = Tables.orders(spark, sf).select(lit("g").as("g"), $"o_orderkey")
    val whole = Sketches.hllBuckets(df, $"g", $"o_orderkey")
    val shard1 = Sketches.hllBuckets(df.filter($"o_orderkey" % 2 === 0), $"g", $"o_orderkey")
    val shard2 = Sketches.hllBuckets(df.filter($"o_orderkey" % 2 =!= 0), $"g", $"o_orderkey")
    val merged = shard1.unionByName(shard2)
      .groupBy($"group", $"bucket").agg(max($"max_rho").as("max_rho"))
    assert(merged.collect().map(_.toSeq).toSet ==
      whole.collect().map(_.toSeq).toSet)
  }

  test("hll estimate is within 25% of the true distinct count") {
    val orders = Tables.orders(spark, sf).select(lit("g").as("g"), $"o_orderkey")
    val truth = orders.select("o_orderkey").distinct().count()
    val est = Sketches.hllEstimate(
        Sketches.hllBuckets(orders, $"g", $"o_orderkey"))
      .select("est_distinct").as[Long].head()
    assert(math.abs(est - truth).toDouble / truth < 0.25, s"est=$est truth=$truth")
  }

  test("null keys are absent from sketches, not a poisoned bucket") {
    val df = Seq(Some(1L), Some(2L), None, Some(3L))
      .toDF("key").withColumn("g", lit("g"))
    val clean = df.filter($"key".isNotNull)
    assert(Sketches.kmvDistinct(df, $"g", $"key").collect().map(_.toSeq).toSet ==
      Sketches.kmvDistinct(clean, $"g", $"key").collect().map(_.toSeq).toSet)
    assert(Sketches.hllBuckets(df, $"g", $"key").collect().map(_.toSeq).toSet ==
      Sketches.hllBuckets(clean, $"g", $"key").collect().map(_.toSeq).toSet)
  }

  test("sketches are duplication-invariant (distinct semantics)") {
    val df = Tables.orders(spark, sf).select(lit("g").as("g"), $"o_orderkey")
    val doubled = df.unionByName(df)
    assert(Sketches.kmvDistinct(df, $"g", $"o_orderkey").collect().map(_.toSeq).toSet ==
      Sketches.kmvDistinct(doubled, $"g", $"o_orderkey").collect().map(_.toSeq).toSet)
    assert(Sketches.hllBuckets(df, $"g", $"o_orderkey").collect().map(_.toSeq).toSet ==
      Sketches.hllBuckets(doubled, $"g", $"o_orderkey").collect().map(_.toSeq).toSet)
  }

  test("hllBuckets runs as a streaming aggregation with bounded state") {
    // The bucket table has FIXED size (groups × 2^p rows), so the same
    // transform streams with complete-mode output and constant state —
    // a live distinct-count sketch over an unbounded stream.
    val batch = Tables.orders(spark, sf).select(lit("g").as("g"), $"o_orderkey")
    val dir = java.nio.file.Files.createTempDirectory("hll_stream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = Sketches.hllBuckets(stream, col("g"), col("o_orderkey"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hll_stream_out")
        .collect().map(_.toSeq).toSet
      val direct = Sketches.hllBuckets(batch, col("g"), col("o_orderkey"))
        .collect().map(_.toSeq).toSet
      assert(streamed == direct && streamed.nonEmpty)
    } finally q.stop()
  }

  test("scrubPii redacts emails, urls and digit runs with typed tags") {
    val got = Seq("mail a.b+c@x-corp.io now, see https://x.io/p?q=1 or call 0123456789 ext 12345")
      .toDF("t").select(TextFunctions.scrubPii($"t")).as[String].head()
    assert(got == "mail <EMAIL> now, see <URL> or call <NUM> ext 12345")
  }

  test("scrubPii redacts separator-formatted phones and SSNs") {
    val got = Seq(
      "call (555) 123-4567 or 555.123.4567 or 555-123-4567, ssn 078-05-1120")
      .toDF("t").select(TextFunctions.scrubPii($"t")).as[String].head()
    assert(got == "call <PHONE> or <PHONE> or <PHONE>, ssn <SSN>")
  }

  test("bigramsFromTokens keeps repeats and order") {
    val got = Seq("a b a b").toDF("t")
      .select(TextFunctions.bigramsFromTokens(TextFunctions.tokens($"t")))
      .as[Seq[String]].head()
    assert(got == Seq("a b", "b a", "a b"))
    val one = Seq("solo").toDF("t")
      .select(TextFunctions.bigramsFromTokens(TextFunctions.tokens($"t")))
      .as[Seq[String]].head()
    assert(one.isEmpty)
  }

  test("charEntropy: zero for uniform repeats, log2(n) for all-distinct") {
    val got = Seq(("aaaa", 1), ("abcd", 2), ("aabb", 3)).toDF("t", "id")
      .select($"id", TextFunctions.charEntropy($"t")).as[(Int, Double)]
      .collect().toMap
    assert(math.abs(got(1) - 0.0) < 1e-12)
    assert(math.abs(got(2) - 2.0) < 1e-12)
    assert(math.abs(got(3) - 1.0) < 1e-12)
  }

  test("kmvPairOverlap is exact below k: union, shared, intersection") {
    // A: keys 0..29; B: keys 20..49 (overlap 10); C: keys 100..104 (none)
    val df = ((0 until 30).map(i => ("A", i.toLong)) ++
      (20 until 50).map(i => ("B", i.toLong)) ++
      (100 until 105).map(i => ("C", i.toLong))).toDF("g", "k")
    val sk = Sketches.kmvSketch(df, $"g", $"k", k = 256, salt = "ov")
    val got = Sketches.kmvPairOverlap(sk, k = 256)
      .select($"group_a", $"group_b", $"n_kept", $"n_shared",
        $"est_union", $"est_intersection")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got(("A", "B")) == ((50L, 10L, 50L, 10L)))
    assert(got(("A", "C")) == ((35L, 0L, 35L, 0L)))
    assert(got(("B", "C")) == ((35L, 0L, 35L, 0L)))
  }

  test("kmvPairOverlap estimates track true overlap above k") {
    // A: 0..999; B: 500..1499 — true union 1500, intersection 500.
    val df = ((0 until 1000).map(i => ("A", i.toLong)) ++
      (500 until 1500).map(i => ("B", i.toLong))).toDF("g", "k")
    val sk = Sketches.kmvSketch(df, $"g", $"k", k = 128, salt = "ov2")
    val row = Sketches.kmvPairOverlap(sk, k = 128)
      .select($"est_union", $"est_intersection")
      .as[(Long, Long)].collect().head
    assert(math.abs(row._1 - 1500) < 1500 * 0.30, s"est_union=${row._1}")
    assert(math.abs(row._2 - 500) < 500 * 0.50, s"est_intersection=${row._2}")
  }
}
