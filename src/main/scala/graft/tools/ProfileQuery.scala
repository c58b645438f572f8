package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job profiler for one declared query (optimization-round
  * instrumentation, guide §1): runs `SPARK_GRAFT_PROFILE_QUERY` through
  * the noop sink exactly as [[graft.Bench]] does and prints every Spark
  * job's callSite + wall duration, grouped by callSite. The callSite of
  * an action names the engine line that triggered it (localCheckpoint /
  * count / parquet write), so the output is a phase profile of the
  * query's orchestration without touching the query code.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("SPARK_GRAFT_PROFILE_QUERY", "d56_ledgered_delete_semantic")
    // same extensions as GraftSession.build (r20 ADVICE #1): profiles
    // must run the engine's own planner surface; configs deliberately
    // mirror Bench's session so per-job numbers match the bench
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))
            .orElse(Option(p.getProperty("spark.job.description")))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.jobId, site, t0, System.nanoTime()))
        }
      }
    })
    // per-ACTION attribution (covers Catalyst optimize + AQE + execute):
    // funcName + a plan fingerprint, so the slow ACTIONS are named even
    // when the jobs under them are all tiny
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def fp(qe: org.apache.spark.sql.execution.QueryExecution): String = {
        val s = qe.analyzed.toString.linesIterator.take(2).mkString(" | ")
        s.substring(0, math.min(s.length, 150))
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.add((funcName + " :: " + fp(qe), durationNs / 1e9))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    // warmup (JIT + codegen) on the smallest SF, like Bench
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    rows.clear(); starts.clear()

    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9

    // settle so late listener events land
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._3)
    val jobSum = all.map(r => (r._4 - r._3) / 1e9).sum
    println(f"== $name: wall ${wall}%.2f s, ${all.size} jobs, job-sum ${jobSum}%.2f s ==")
    // wall-coverage: merge job intervals; uncovered = driver-only time
    var covered = 0L
    var cursor = 0L
    all.sortBy(_._3).foreach { case (_, _, s0, e0) =>
      val s1 = math.max(s0, cursor)
      if (e0 > s1) { covered += e0 - s1; cursor = e0 } else cursor = math.max(cursor, e0)
    }
    println(f"-- job-covered wall ${covered / 1e9}%.2f s; driver-only gap ${wall - covered / 1e9}%.2f s --")
    println("-- top 40 actions (QueryExecutionListener, desc) --")
    actions.asScala.toSeq.sortBy(-_._2).take(40)
      .foreach { case (k, d) => println(f"$d%8.3f s  $k") }
    val acts = actions.asScala.toSeq
    println(f"-- actions: n=${acts.size}, sum ${acts.map(_._2).sum}%.2f s --")
    spark.stop()
  }
}
