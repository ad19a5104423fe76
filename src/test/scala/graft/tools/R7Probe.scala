package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{Bpe, TextFunctions}
import graft.model.Tables

/** Round-7 scale probes (SCALING.md probe 4 + the BPE apply-leg probe).
  *
  * 1. `lsh <sfDir>` — warmed wall time of the LIBRARY-DEFAULT
  *    (auto-bits) embeddingLshPairs at the given corpus. (Historical
  *    note: through r11 the registered dedup_embedding_lsh query pinned
  *    bits = 6 for its DuckDB oracle, so this probe had to call the
  *    library directly; since r12 the gate runs the auto-bits rule too
  *    and the oracle derives B from count(*).)
  * 2. `bpe <sfDir>` — warmed wall time of the BPE APPLY leg over the
  *    corpus word types: chained-HOF at k=20 vs broadcast encoder at
  *    k=20 and k≥1000 (trained on the same corpus with minCount=1).
  *    The claim under test: encoder cost is ~flat in vocabulary size k,
  *    while the chained form's plan grows with k.
  *
  * Warmed protocol matches graft.Bench: each measurement runs twice,
  * the second run is reported.
  */
object R7Probe {
  private def timeWarmed(f: () => Unit): Double = {
    f()
    val t0 = System.nanoTime()
    f()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    mode match {
      case "lsh" =>
        val t = timeWarmed(() => noop(
          Dedup.embeddingLshPairs(Tables.embeddings(spark, dir),
            "vec_id", "embedding", threshold = 0.4, dims = 64)))
        println(f"""{"probe":"lsh_auto_bits","dir":"$dir","sec":$t%.3f}""")

      case "bpe" =>
        // The fixture corpus draws from a ~31-word vocabulary — far too
        // small to exercise a production merge table, so the probe
        // builds its own: 20k distinct random 16-char word types (the
        // word-frequency table IS the apply leg's input at any corpus
        // size — word types, never instances).
        import spark.implicits._
        val rng = new scala.util.Random(7)
        val alpha = "abcdefghijklmnopqrstuvwxyz"
        val types = (0 until 20000)
          .map(_ => (0 until 16).map(_ => alpha(rng.nextInt(26))).mkString)
          .distinct
        val corpus = Seq(types.mkString(" ")).toDF("text")
        val words = types.toDF("w").repartition(32).localCheckpoint()
        val t0 = System.nanoTime()
        val mAll = Bpe.train(corpus, "text", 20000, minCount = 1L)
          .orderBy(col("rank")).select(col("left"), col("right"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        val tTrain = (System.nanoTime() - t0) / 1e9
        def enc(k: Int): Double = timeWarmed(() => noop(
          words.select(Bpe.segmentEncoded(col("w"), mAll.take(k)).as("s"))))
        def chn(k: Int): Double = timeWarmed(() => noop(
          words.select(Bpe.segmentChained(col("w"), mAll.take(k)).as("s"))))
        val (c20, c64) = (chn(20), chn(64))
        val (e20, e1k, e5k, eAll) = (enc(20), enc(1000), enc(5000),
          enc(mAll.size))
        println(f"""{"probe":"bpe_apply","word_types":${types.size},""" +
          f""""k_learned":${mAll.size},"train_sec":$tTrain%.3f,""" +
          f""""chained_k20_sec":$c20%.3f,""" +
          f""""chained_k64_sec":$c64%.3f,"encoded_k20_sec":$e20%.3f,""" +
          f""""encoded_k1000_sec":$e1k%.3f,"encoded_k5000_sec":$e5k%.3f,""" +
          f""""encoded_kall_sec":$eAll%.3f}""")

      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
