package graft.tools

/** Reproduces the bench protocol (sf0.001 warm-up pass, then two measured
  * sf0.1 runs per query, unpersist between) with a stderr marker around
  * every execution, so the `CodeGenerator.doCompile` WARN trace that shows
  * up in the bench tail can be attributed to a specific query and run.
  * Markers and log4j output interleave in order on stderr because codegen
  * compilation is synchronous with plan execution.
  *
  * `sbt "runMain graft.tools.CodegenHunt" 2> /tmp/hunt.err`
  */
object CodegenHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mark(s: String): Unit = { System.err.println(s"[hunt] $s"); System.err.flush() }

    def run(name: String, dir: String, tag: String): Unit = {
      mark(s"begin $name $tag")
      try graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => mark(s"FAILED $name $tag: ${e.getMessage}") }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      mark(s"end $name $tag")
    }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach(n => run(n, "/root/testdata/sf0.001", "warmup"))
    names.foreach(n => run(n, sfDir, "run1"))
    names.foreach(n => run(n, sfDir, "run2"))
    spark.stop()
  }
}
