package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (guide: one per suite via
  * lazy val; sharing across suites avoids repeated JVM-wide session setup
  * in the forked test JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = Sessions.configure(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_wh_test").toString))
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** sf0.001 fixture dir — the smoke-scale data. */
  val sf: String = "/root/testdata/sf0.001"

  /** Run `f` with the given SQL confs set, restoring prior values after
    * (the session is shared across suites, so leaks would be global). */
  def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    // The set loop lives INSIDE the try: if a later pair's set throws
    // (e.g. a static conf), the earlier pairs must still be restored —
    // otherwise they leak into the shared session for every later suite.
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
