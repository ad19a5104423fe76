package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import scala.util.chaining._

import graft.Sessions
import graft.model.Tables
import graft.queries.Parity

/** Throwaway timing harness for hotspot investigation (not part of the
  * driver contract; kept out of SparkEntry). Current target: the two
  * slowest bench queries, q_window_rank and q_window_range. */
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

    // warmup both fixture families
    noop(graft.SparkEntry.queries("q1_agg")(spark, dir))

    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)

    time("q_window_rank CURRENT")(noop(
      graft.SparkEntry.queries("q_window_rank")(spark, dir)))

    // Rewrite: rank/dense_rank over (priority, status) reduce to group
    // counts; first_value over unbounded-preceding frame is constant per
    // partition = argmin. All three become tiny aggregates broadcast back.
    def rankRewrite() = {
      val base = orders.select($"o_orderpriority", $"o_orderkey",
        $"o_orderstatus", $"o_totalprice")
      val wg = Window.partitionBy($"o_orderpriority").orderBy($"o_orderstatus")
      val grp = base.groupBy($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("__n"))
        .select($"o_orderpriority", $"o_orderstatus",
          (coalesce(sum($"__n").over(
            wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
            .cast("int").as("rnk"),
          row_number().over(wg).as("drnk"))
      val cheapest = base.groupBy($"o_orderpriority")
        .agg(min(struct($"o_totalprice", $"o_orderkey")).as("__m"))
        .select($"o_orderpriority", $"__m.o_orderkey".as("cheapest_key"))
      base.join(broadcast(grp), Seq("o_orderpriority", "o_orderstatus"))
        .join(broadcast(cheapest), Seq("o_orderpriority"))
        .select($"o_orderpriority", $"o_orderkey", $"rnk", $"drnk", $"cheapest_key")
        .orderBy($"o_orderpriority", $"o_orderkey")
    }
    time("q_window_rank REWRITE warm0")(noop(rankRewrite()))
    time("q_window_rank REWRITE warm1")(noop(rankRewrite()))

    // equivalence check vs current
    val cur = graft.SparkEntry.queries("q_window_rank")(spark, dir)
      .collect().map(_.toSeq).toSet
    val rw = rankRewrite().collect().map(_.toSeq).toSet
    println(s"[scratch] rank rewrite equal: ${cur == rw} (${rw.size})")

    time("q_window_range CURRENT")(noop(
      graft.SparkEntry.queries("q_window_range")(spark, dir)))
    // variants to isolate the cost
    val wr = Window.partitionBy($"l_suppkey")
      .orderBy(unix_timestamp($"l_shipdate"))
      .rangeBetween(-7L * 86400L, 0L)
    time("range NO final sort")(noop(
      lineitem.select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        sum($"l_quantity".cast(DecimalType(18, 4))).over(wr)
          .pipe(Parity.roundedDouble).as("qty_7d"))))
    time("range DOUBLE sum no sort")(noop(
      lineitem.select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        sum($"l_quantity").over(wr).as("qty_7d"))))
    time("range LONG sum no sort")(noop(
      lineitem.select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        sum(($"l_quantity" * 100).cast("long")).over(wr).as("qty_7d"))))
    time("running CURRENT")(noop(
      graft.SparkEntry.queries("q_window_running")(spark, dir)))
    time("rank CURRENT again")(noop(
      graft.SparkEntry.queries("q_window_rank")(spark, dir)))

    spark.stop()
  }
}
