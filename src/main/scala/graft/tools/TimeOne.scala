package graft.tools

/** Focused per-query timer for iteration: runs the named queries through
  * the same noop-sink protocol as [[graft.Bench]] (warm-up + min-of-2)
  * without paying for the whole inventory.
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.TimeOne t06_bigrams"`
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { n =>
      once(n) // warm-up
      val t = math.min(once(n), once(n))
      println(f"[timeone] $n: $t%.3f s")
    }
    spark.stop()
  }
}
