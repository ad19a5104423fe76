package graft

/** Benchmark entry (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the `noop` sink — unlike `count()`,
  * which lets Spark skip column evaluation entirely for projection-only
  * plans, noop forces every output row and column to be produced, so the
  * timings measure real work. One warmup query amortizes JVM/codegen
  * startup out of the first measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: JVM + codegen + parquet footer caches, once per fixture
    // family (lineitem-shaped and documents-shaped) — otherwise the
    // alphabetically-first query of each family absorbs several seconds
    // of one-time JIT/footer cost that belongs to no query.
    runOnce("q1_agg")
    runOnce("text_stats")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
