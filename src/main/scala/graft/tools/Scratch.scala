package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.Sketches
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: 10x-scale
  * stress of the round-3 operators (sketches, entropy, interval join). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    noop(graft.SparkEntry.queries("q1_agg")(spark, dir)) // warmup

    // 10x lineitem (6M rows): KMV + HLL sketch builds must stay linear
    // and the KMV estimate must not degrade (same distinct universe).
    val li = Tables.lineitem(spark, dir).select($"l_returnflag", $"l_orderkey")
    val li10 = (0 until 10).map(i => li.select($"l_returnflag",
        ($"l_orderkey" + lit(i.toLong * 100000000L)).as("l_orderkey")))
      .reduce(_ unionByName _)
    time("kmv 600k rows")(noop(
      Sketches.kmvDistinct(li, $"l_returnflag", $"l_orderkey")))
    time("kmv 6M rows (10x distinct)")(noop(
      Sketches.kmvDistinct(li10, $"l_returnflag", $"l_orderkey")))
    time("hll 600k rows")(noop(
      Sketches.hllBuckets(li, $"l_returnflag", $"l_orderkey")))
    time("hll 6M rows (10x distinct)")(noop(
      Sketches.hllBuckets(li10, $"l_returnflag", $"l_orderkey")))
    // accuracy at 10x
    val truth = li10.select($"l_orderkey").distinct().count()
    val kEst = Sketches.kmvDistinct(li10.withColumn("g", lit(1)), $"g",
      $"l_orderkey").select("est_distinct").as[Long].head()
    val hEst = Sketches.hllEstimate(Sketches.hllBuckets(
        li10.withColumn("g", lit(1)), $"g", $"l_orderkey"))
      .select("est_distinct").as[Long].head()
    println(f"[scratch] 10x truth=$truth kmv=$kEst (${100.0 * (kEst - truth) / truth}%.1f%%) " +
      f"hll=$hEst (${100.0 * (hEst - truth) / truth}%.1f%%)")

    // PPJoin prefix filter vs naive shingle co-occurrence at 10x corpus:
    // settles the r02 open question of where the prefix pays.
    {
      val docs1 = Tables.documents(spark, dir).select($"doc_id", $"text")
      val big = (0 until 10).map(i => docs1.select(
          ($"doc_id" + lit(i.toLong * 10000000L)).as("doc_id"), $"text"))
        .reduce(_ unionByName _)
      time("jaccard NAIVE 5k")(noop(
        graft.dedup.Dedup.jaccardPairs(docs1, "text", "doc_id", 3, 0.8)))
      time("jaccard PREFIX 5k")(noop(
        graft.dedup.Dedup.jaccardPairsPrefix(docs1, "text", "doc_id", 3, 0.8)))
      time("jaccard NAIVE 50k")(noop(
        graft.dedup.Dedup.jaccardPairs(big, "text", "doc_id", 3, 0.8)))
      time("jaccard PREFIX 50k")(noop(
        graft.dedup.Dedup.jaccardPairsPrefix(big, "text", "doc_id", 3, 0.8)))
    }

    // 10x documents (50k docs): entropy + scrub + bigrams stay linear.
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val docs10 = (0 until 10).map(i => docs.select(
        ($"doc_id" + lit(i.toLong * 10000000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
    def entropy(d: org.apache.spark.sql.DataFrame) = d
      .select($"doc_id", length($"text").as("n"), explode(split($"text", "")).as("ch"))
      .groupBy($"doc_id", $"n", $"ch").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id", $"n")
      .agg(sum($"cnt".cast("double") * log2($"cnt".cast("double"))).as("s"))
      .select($"doc_id", (log2($"n".cast("double")) - $"s" / $"n".cast("double")).as("e"))
    time("entropy 5k docs")(noop(entropy(docs)))
    time("entropy 50k docs")(noop(entropy(docs10)))
    time("scrub 50k docs")(noop(docs10.select($"doc_id",
      graft.functions.TextFunctions.scrubPii($"text").as("s"))))
    time("bigrams top20 50k docs")(noop(
      docs10.select(graft.functions.TextFunctions.tokens($"text").as("t"))
        .select(explode(graft.functions.TextFunctions.bigramsFromTokens($"t")).as("b"))
        .groupBy($"b").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"b").limit(20)))

    spark.stop()
  }
}
