package graft.tools

/** Round-9 skew probe (SCALING.md probe 13): times registered
  * SparkEntry queries against an arbitrary sf-shaped dir — built for the
  * ScaleProbe `skew` corpora (one boilerplate doc duplicated onto 20% of
  * rows + a universal trailing shingle), the adversarial shape every
  * replica-based exponent probe deliberately avoids.
  *
  * Usage: Test/runMain graft.tools.SkewProbe <sfDir> <q1,q2,...>
  * Warmed protocol matches graft.Bench: run twice, report the second.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, qcsv) = args.take(2)
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      def once(): Unit = noop(fn(spark, dir))
      once()
      val t0 = System.nanoTime()
      once()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"skew","query":"$name","dir":"$dir","sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
