package graft.streaming

/** Runnable streaming demo/smoke: drives both continuous queries over a
  * testdata dir to completion and prints their results.
  * `sbt "runMain graft.streaming.StreamDemo [sfDir]"`
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.build(appName = "graft-stream-demo")
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("win").start()
    q.processAllAvailable()
    println(s"[stream-demo] windowed rows=${spark.table("win").count()}")
    spark.table("win").orderBy("window_start", "event_type").show(6, truncate = false)
    q.stop()
    val q2 = EventStream.sessionCountsStream(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    q2.processAllAvailable()
    println(s"[stream-demo] session rows=${spark.table("sess").count()}")
    spark.table("sess").orderBy("user_id").show(5, truncate = false)
    q2.stop()
    spark.stop()
  }
}
