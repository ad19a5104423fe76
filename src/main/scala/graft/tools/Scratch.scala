package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: global-sort
  * queries whose expensive projection sits BELOW the orderBy — the range
  * partitioner's sampling pass re-executes the sort's child, so every
  * expression under the sort is evaluated twice. A/B: project-then-sort
  * vs sort-then-project. */
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
    noop(graft.SparkEntry.queries("q1_agg")(spark, dir)) // warmup
    noop(graft.SparkEntry.queries("text_stats")(spark, dir)) // warmup docs

    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)

    // --- p8: parse below vs above the sort ---
    val p8Below = li.select(col("l_orderkey"), col("l_linenumber"),
      graft.ops.RefOps.parseVnDate(
        date_format(col("l_shipdate"), "dd/MM/yyyy")).as("ship_day"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    val p8Above = li
      .select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "dd/MM/yyyy").as("__s"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.RefOps.parseVnDate(col("__s")).as("ship_day"))
    time("p8 parse-below-sort w0")(noop(p8Below))
    time("p8 parse-below-sort w1")(noop(p8Below))
    time("p8 parse-above-sort w0")(noop(p8Above))
    time("p8 parse-above-sort w1")(noop(p8Above))
    println(p8Above.queryExecution.optimizedPlan.treeString.take(1200))

    // --- langid: expensive projection below vs above the sort ---
    val langBelow = docs
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))
    val langAbove = docs
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.langId(col("text")).as("lang_pred"))
    time("langid below-sort w0")(noop(langBelow))
    time("langid below-sort w1")(noop(langBelow))
    time("langid above-sort w0")(noop(langAbove))
    time("langid above-sort w1")(noop(langAbove))
    spark.stop()
  }
}
