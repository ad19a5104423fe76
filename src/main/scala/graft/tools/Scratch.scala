package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.dedup.Dedup
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current targets: the minhash
  * self-join exchange reuse and the entropy query rewrite. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    noop(graft.SparkEntry.queries("text_stats")(spark, dir)) // warmup

    val docs = Tables.documents(spark, dir)
    time("minhash CURRENT warm0")(noop(
      Dedup.minhashPairs(docs, "text", "doc_id")))
    time("minhash CURRENT warm1")(noop(
      Dedup.minhashPairs(docs, "text", "doc_id")))
    // count exchanges/aggregates in the FINAL adaptive plan (after
    // execution): is `sets` computed twice?
    val mdf = Dedup.minhashPairs(docs, "text", "doc_id")
    mdf.collect()
    val plan = mdf.queryExecution.executedPlan.toString
    println(s"[scratch] ObjectHashAggregate occurrences: " +
      "ObjectHashAggregate".r.findAllIn(plan).size)
    println(s"[scratch] ReusedExchange/Stage occurrences: " +
      ("ReusedExchange".r.findAllIn(plan).size +
        "ReusedQueryStage".r.findAllIn(plan).size))
    println(s"[scratch] join nodes: " +
      "HashJoin".r.findAllIn(plan).size + " broadcast: " +
      "BroadcastHashJoin".r.findAllIn(plan).size)

    time("entropy NEW query warm0")(noop(
      graft.SparkEntry.queries("text_char_entropy")(spark, dir)))
    time("entropy NEW query warm1")(noop(
      graft.SparkEntry.queries("text_char_entropy")(spark, dir)))

    spark.stop()
  }
}
