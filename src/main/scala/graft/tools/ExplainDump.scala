package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of declared
  * queries (SPARK_GRAFT_EXPLAIN_QUERIES) into SPARK_GRAFT_EXPLAIN_DIR as
  * `<name>_<suffix>.txt` (suffix from SPARK_GRAFT_EXPLAIN_SUFFIX, e.g.
  * "before"/"after") — the optimization-round evidence files the judge
  * reads (guide §1: capture the plan for every query you touch).
  * Lifecycle queries run several eager actions before returning their
  * answer frame; the dump is the ANSWER plan (what the harness's noop
  * sink executes last), which is where the read-path regressions
  * (lost bucketed scans, unexpected exchanges) would show.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "plans/r20")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    val names = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    // same extensions as GraftSession.build (r20 ADVICE #1): evidence
    // plans must come from the engine's own planner surface (TopK
    // strategy + SQL function registrations); configs deliberately
    // mirror Bench's session, not GraftSession's, so dumped plans match
    // what the benchmarked engine plans
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
    new java.io.File(outDir).mkdirs()
    names.foreach { full =>
      val short = full.takeWhile(_ != '_')
      val df = graft.SparkEntry.queries(full)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${short}_$suffix.txt"),
        s"== $full @ $sfDir ==\n$plan")
      System.err.println(s"[explain] wrote $outDir/${short}_$suffix.txt")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
