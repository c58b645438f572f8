package graft.tools

/** Plan inspector: prints the formatted physical plan of selected queries
  * so scan pruning (ReadSchema/PushedFilters), join strategy, and
  * whole-stage codegen coverage can be audited.
  * `sbt "runMain graft.tools.ExplainDump q20_pricing_summary ..."`
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.build(appName = "graft-explain")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
