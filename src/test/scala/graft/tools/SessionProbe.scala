package graft.tools

import org.apache.spark.sql.functions._

/** r11 receipts for PROBE 17 (r10 shipped the fix without the writeup —
  * r10 verdict "what's wrong" #1): the `stream_session` gate's 100×
  * state OOM under the default HDFS-backed state-store provider, fixed
  * by RocksDB. This probe runs the gate's exact streaming pipeline
  * (file source → watermarked session_window aggregation →
  * Trigger.AvailableNow → memory sink, sentinel flush event included)
  * on an arbitrary sf-shaped dir with the provider chosen by argument,
  * reporting events in, sessions out, and wall seconds — the A/B that
  * documents the provider decision.
  *
  * Usage: Test/runMain graft.tools.SessionProbe <sfDir> <hdfs|rocksdb>
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, provider) = args.take(2)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        String.valueOf(Runtime.getRuntime.availableProcessors())))
    import spark.implicits._
    // RocksDB is the session default since r11 (probe 17) — the hdfs
    // arm must now set the legacy provider explicitly for the A/B.
    if (provider == "hdfs")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming" +
          ".state.HDFSBackedStateStoreProvider")
    else require(provider == "rocksdb", s"unknown provider: $provider")

    val ev = graft.model.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"value")
    val nEvents = ev.count()
    val maxTs = ev.agg(max($"ts")).head.getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 30L * 86400 * 1000)
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft_sessprobe").toString
    ev.unionByName(spark.range(1).select(lit(-1L).as("user_id"),
        lit(flushTs).as("ts"), lit(null).cast("double").as("value")))
      .write.mode("overwrite").parquet(streamDir)

    val t0 = System.nanoTime()
    val src = spark.readStream.schema(ev.schema).parquet(streamDir)
    val q = graft.streaming.EventsOps
      .sessionsStream(src, "10 minutes", "10 seconds")
      .writeStream.format("memory").queryName("sessprobe")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nSessions = spark.table("sessprobe").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"session","provider":"$provider","events":$nEvents,"sessions":$nSessions,"sec":$sec%.3f,"dir":"$dir"}""")
    spark.catalog.dropTempView("sessprobe")
    graft.util.FsUtil.deleteTree(streamDir)
    spark.stop()
  }
}
