package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: the
  * ref_p8_date_parse outlier (15.4 s at sf0.1 in the round-3 bench). */
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

    val li = Tables.lineitem(spark, dir)
    time("p8 QUERY warm0")(noop(
      graft.SparkEntry.queries("ref_p8_date_parse")(spark, dir)))
    time("p8 QUERY warm1")(noop(
      graft.SparkEntry.queries("ref_p8_date_parse")(spark, dir)))
    time("p8 no orderBy")(noop(
      li.select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.RefOps.parseVnDate(
          date_format(col("l_shipdate"), "dd/MM/yyyy")).as("ship_day"))))
    time("date_format only")(noop(
      li.select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "dd/MM/yyyy").as("s"))))
    time("orderBy only")(noop(
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))))
    time("make_date split parse")(noop(
      li.select(col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "dd/MM/yyyy").as("s"))
        .select(col("l_orderkey"), col("l_linenumber"),
          make_date(substring(col("s"), 7, 4).cast("int"),
            substring(col("s"), 4, 2).cast("int"),
            substring(col("s"), 1, 2).cast("int")).as("ship_day"))))
    spark.stop()
  }
}
