package graft.pipeline

import graft.Sessions

/** Manual drive of the full pipeline against the fixture world:
  * `sbt "Test/runMain graft.pipeline.SendoDemo /tmp/wh"` — prints the
  * three warehouse tables. */
object SendoDemo {
  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("sendo_demo").toString)
    val spark = Sessions.local("4")
    val tables = SendoPipeline.run(spark, SendoFixtures.transport(), wh)
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(s"=== $name (${df.count()} rows) ===")
      df.orderBy(df.columns.head).show(50, truncate = false)
    }
    spark.stop()
  }
}
