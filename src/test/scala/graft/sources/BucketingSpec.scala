package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mr.TestSession

/** Pins the whole point of bucketing: co-bucketed tables join and
  * aggregate with ZERO shuffle Exchange. This is the write-once/read-many
  * contract SCALING.md §2 relies on for repeated fact-fact joins.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def withSqlConf[A](kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-bucketed join and bucket-key aggregation plan with zero shuffle") {
    val orders = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val lineitem = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)
    try {
      // disable broadcast so only bucketing can remove the exchanges
      withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = Bucketing.readBucketed(spark, "b_lineitem")
          .join(Bucketing.readBucketed(spark, "b_orders"),
            col("l_orderkey") === col("o_orderkey"))
        val jp = joined.queryExecution.executedPlan.toString
        assert(jp.contains("SortMergeJoin") || jp.contains("ShuffledHashJoin"), jp)
        assert(!jp.contains("Exchange"), jp)
        // and the result is the plain-join result
        val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
        assert(joined.count() == expected)

        val agg = Bucketing.readBucketed(spark, "b_lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("q"))
        val ap = agg.queryExecution.executedPlan.toString
        assert(!ap.contains("Exchange"), ap)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
