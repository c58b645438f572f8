package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.mr.TestSession
import graft.Tables

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, sf)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
  }

  private def customTopK(k: Int) =
    TopK.perGroup(
      Tables.orders(spark, sf).select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k)

  test("heap operator equals the window formulation for several k") {
    for (k <- Seq(1, 3, 10, 100)) {
      val expected = windowTopK(k).as[(String, Long, Double)].collect().toSet
      val got = customTopK(k).as[(String, Long, Double)].collect().toSet
      assert(got == expected, s"k=$k: ${got.size} vs ${expected.size}")
    }
  }

  test("physical plan is two-phase (partial below the exchange) with NO sort") {
    val p = customTopK(3).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup ["), p) // exec node prints without the Exec suffix
    assert(p.contains("TopKPerGroupPartial ["), p)
    assert(p.contains("Exchange hashpartitioning(o_orderpriority"), p)
    // partial must sit BELOW the exchange (map side), final above it
    val (iFinal, iEx, iPartial) = (p.indexOf("TopKPerGroup ["),
      p.indexOf("Exchange hashpartitioning"), p.indexOf("TopKPerGroupPartial ["))
    assert(iFinal < iEx && iEx < iPartial, p)
    assert(!p.toLowerCase.contains("sortexec") && !p.contains("\nSort "), p)
  }

  test("partial phase bounds what the exchange carries to groups*k per partition") {
    // 5 order priorities, k=3, over a multi-partition scan: the exchange
    // must carry <= 5*3 rows per input partition, not the full table
    val df = customTopK(3)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def records(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        records(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => records(q.plan)
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      case other => other.children.map(records).sum
    }
    val shuffled = records(plan)
    val nParts = Tables.orders(spark, sf).rdd.getNumPartitions
    assert(shuffled > 0, s"expected an exchange in:\n$plan")
    assert(shuffled <= 5L * 3 * nParts,
      s"exchange carried $shuffled rows; partial phase should bound it to <= ${5 * 3 * nParts}")
  }

  test("a child already clustered by the group key incurs NO extra exchange") {
    // outputPartitioning propagates through both phases, so when the child
    // is hash-partitioned on the key, EnsureRequirements must find the
    // final phase's ClusteredDistribution already satisfied: exactly the
    // ONE exchange from the repartition, none inserted by the operator
    val pre = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .repartition($"o_orderpriority")
    val df = TopK.perGroup(pre, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    df.collect()
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        exchanges(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => exchanges(q.plan)
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        1 + s.children.map(exchanges).sum
      case other => other.children.map(exchanges).sum
    }
    val n = exchanges(df.queryExecution.executedPlan)
    assert(n == 1, s"expected only the repartition exchange, found $n:\n${df.queryExecution.executedPlan}")
  }

  test("rows come out in rank order within each group") {
    val rows = customTopK(5).collect()
    val byGroup = rows.groupBy(_.getString(0))
    byGroup.values.foreach { grp =>
      val prices = grp.map(_.getDouble(2)).toSeq
      assert(prices == prices.sortBy(-(_: Double)), s"not rank-ordered: $prices")
    }
  }

  test("k larger than any group degrades to identity content") {
    val total = Tables.orders(spark, sf).count()
    assert(customTopK(1000000).count() == total)
  }
}
