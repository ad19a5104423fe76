package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.functions.Sketches
import graft.model.Tables

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: the
  * sketch_cms_probe outlier (~7 s at sf0.1 regardless of digest count). */
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
    time("full query w0")(noop(
      graft.SparkEntry.queries("sketch_cms_probe")(spark, dir)))
    time("full query w1")(noop(
      graft.SparkEntry.queries("sketch_cms_probe")(spark, dir)))
    time("countMin only")(noop(Sketches.countMin(li, col("l_suppkey"))))
    time("base28 only")(noop(li.select(col("l_suppkey")).where(col("l_suppkey").isNotNull)
      .select(Sketches.base28(col("l_suppkey"), "cms").as("b"))))
    time("base28+posexplode")(noop(
      li.select(col("l_suppkey")).where(col("l_suppkey").isNotNull)
        .select(Sketches.base28(col("l_suppkey"), "cms").as("__b"))
        .select(posexplode(transform(sequence(lit(0), lit(3)),
          j => pmod(Sketches.affineSlot(col("__b"), j), lit(1024))))
          .as(Seq("row", "col")))))
    val sk = Sketches.countMin(li, col("l_suppkey"))
    val probes = spark.range(1, 21).select(col("id").as("key"))
    time("lookup given built")(noop(Sketches.cmsLookup(sk, probes)))
    spark.stop()
  }
}
