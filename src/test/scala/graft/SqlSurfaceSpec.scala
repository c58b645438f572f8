package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mr.TestSession

/** Ad-hoc SQL over the registered star schema — the `spark.sql` surface a
  * user gets after `Tables.registerAll`.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("spark.sql runs joins and aggregates over registered views") {
    Tables.registerAll(spark, sf)
    val top = spark.sql(
      """SELECT n_name, COUNT(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin).collect()
    assert(top.length == 3)
    assert(top.forall(_.getLong(1) > 0))
    val evs = spark.sql("SELECT COUNT(*) FROM events WHERE event_type = 'purchase'")
      .head().getLong(0)
    assert(evs > 0)
  }

  test("DESCRIBE FUNCTION documents every registered graft_* expression") {
    graft.functions.GraftFunctions.register(spark)
    val names = graft.functions.GraftFunctions.names
    assert(names.size == 14 && names.forall(_.startsWith("graft_")))
    names.foreach { fn =>
      val rows = spark.sql(s"DESCRIBE FUNCTION $fn").collect().map(_.getString(0))
      val usage = rows.find(_.startsWith("Usage:"))
        .getOrElse(fail(s"$fn: DESCRIBE produced no usage row: ${rows.mkString("; ")}"))
      assert(usage.replace("Usage:", "").trim.length > 20, s"$fn usage too thin: $usage")
      assert(!usage.contains("N/A"), s"$fn usage missing: $usage")
      assert(usage.contains(fn), s"$fn usage should name the function (via _FUNC_): $usage")
    }
  }
}
