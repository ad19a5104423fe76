package graft.tools

/** Dev utility: print the formatted physical plan of one or more declared
  * queries without executing them — the plan-audit loop the project's
  * workflow requires after every operator change.
  *
  * {{{ sbt "Test/runMain graft.tools.Explain dedup_span_stats [sfDir]" }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName>[,name2,...] [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.Sessions.local("8")
    names.foreach { n =>
      println(s"==== $n")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
