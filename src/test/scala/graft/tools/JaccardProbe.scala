package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.model.Tables

/** r11 A/B behind the registered-gate decision for `dedup_jaccard_pairs`
  * (r10 verdict "what's wrong" #4): the naive shingle co-occurrence
  * form (`jaccardPairs`, Σ df² emission) vs the PPJoin prefix-filtered
  * form (`jaccardPairsPrefix`, identical output by law) on an arbitrary
  * corpus dir. Warmed protocol (second run reported).
  *
  * Usage: Test/runMain graft.tools.JaccardProbe <sfDir> [naive|prefix|both]
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "naive" -> (() =>
        Dedup.jaccardPairs(Tables.documents(spark, dir), "text", "doc_id",
          3, 0.8)),
      "prefix" -> (() =>
        Dedup.jaccardPairsPrefix(Tables.documents(spark, dir), "text",
          "doc_id", 3, 0.8)))
    forms.filter(f => which == "both" || which == f._1).foreach {
      case (name, fn) =>
        noop(fn())
        val t0 = System.nanoTime()
        noop(fn())
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"jaccard","form":"$name","dir":"$dir","sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
