package graft.mr

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** The MR core exposed through the driver's verify gate: the same pipelines
  * a gomrjob user would write, run in-engine, with DuckDB oracles.
  */
object MrQueries {

  /** Flagship field-frequency job executed through the [[MrPipeline]] MR
    * path (mapper → LRU combiner → hash+sort shuffle → sorted-run reducer)
    * rather than the DataFrame path of queries.Compositions — both must
    * agree with the same oracle. Keys stay JSON-quoted, as the reference
    * emits them (/root/reference/mrproto/protocol.go:233-239).
    */
  def mrFieldFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.events(s, dir).select(col("props")).as[String]
    val counters = Counters.create(s.sparkContext, s"graft.mr.$dir")
    val out = MrPipeline.run(lines, Seq(new BuiltinSteps.FieldFrequencyStep()), counters)
    MrPipeline.toDataFrame(out, "key", "cnt")
      .select(col("key"), col("cnt").cast("long").as("cnt"))
  }

  val mrFieldFreqSql: String =
    """SELECT '"' || k || '"' AS key, COUNT(*) AS cnt
      |FROM (SELECT UNNEST(json_keys(props)) AS k FROM events)
      |GROUP BY k
      |UNION ALL
      |SELECT '"lines_read"' AS key, COUNT(*) AS cnt FROM events""".stripMargin

  /** Two-step MR pipeline through the verify gate: field-frequency then
    * histogram-of-counts — the reference's `Steps` chaining
    * (/root/reference/runner.go:50,352-356) with no tmp-dir I/O between
    * steps (one lazy DAG).
    */
  def mrMultiStep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.events(s, dir).select(col("props")).as[String]
    val counters = Counters.create(s.sparkContext, s"graft.mr.multistep.$dir")
    val out = MrPipeline.run(lines,
      Seq(new BuiltinSteps.FieldFrequencyStep(), BuiltinSteps.CountHistogramStep), counters)
    MrPipeline.toDataFrame(out, "n_occurrences", "n_keys")
      .select(col("n_occurrences").cast("long").as("n_occurrences"),
        col("n_keys").cast("long").as("n_keys"))
  }

  val mrMultiStepSql: String =
    """WITH keys AS (
      |  SELECT UNNEST(list_append(json_keys(props), 'lines_read')) AS k FROM events),
      |counts AS (SELECT k, COUNT(*) AS c FROM keys GROUP BY k)
      |SELECT c AS n_occurrences, COUNT(*) AS n_keys FROM counts GROUP BY c""".stripMargin

  /** Typed combiner-shaped aggregation — the reference's Combiner contract
    * (/root/reference/map_reduce_step.go:15-17) as a Spark `Aggregator`,
    * whose `merge` IS the combiner law. Buffer is exact BigDecimal so the
    * result is independent of partitioning (and matches the DuckDB oracle
    * bit-for-bit after the final double cast).
    */
  class ExactSumAgg[IN](f: IN => Double)
      extends Aggregator[IN, java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: IN): java.math.BigDecimal =
      b.add(java.math.BigDecimal.valueOf(f(a)))
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    override def finish(r: java.math.BigDecimal): Double = r.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** groupByKey + typed Aggregator: quantity totals per return flag — the
    * `Reducer`-over-`KeyValueGroupedDataset` shape from SURVEY.md §1.3.
    */
  def typedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(new ExactSumAgg[(String, Double)](_._2).toColumn.name("sum_qty"))
      .toDF("l_returnflag", "sum_qty")
  }

  val typedAggSql: String =
    """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Reduce-side join via cogroup — the tag+group-by-key pattern gomrjob
    * users hand-build (SURVEY.md §2 "deliberately absent" list): both
    * inputs shuffle on the key; the reducer sees each key once with both
    * value streams. `KeyValueGroupedDataset.cogroup` IS that contract.
    * Emits for keys present on either side (≡ full outer aggregate join,
    * which is the oracle).
    */
  def cogroupJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select(col("user_id")).as[Long].groupByKey(identity)
    val ord = Tables.orders(s, dir).select(col("o_custkey")).as[Long].groupByKey(identity)
    ev.cogroup(ord) { (k, evs, ords) =>
      Iterator.single((k, evs.size.toLong, ords.size.toLong))
    }.toDF("key_id", "n_events", "n_orders")
  }

  val cogroupJoinSql: String =
    """WITH e AS (SELECT user_id AS key_id, COUNT(*) AS n_events FROM events GROUP BY 1),
      |o AS (SELECT o_custkey AS key_id, COUNT(*) AS n_orders FROM orders GROUP BY 1)
      |SELECT coalesce(e.key_id, o.key_id) AS key_id,
      |  coalesce(n_events, 0) AS n_events,
      |  coalesce(n_orders, 0) AS n_orders
      |FROM e FULL OUTER JOIN o ON e.key_id = o.key_id""".stripMargin

  /** Map-side join via broadcast side data — the reference's distributed-
    * cache pattern (`CacheFiles`/`Files`, /root/reference/runner.go:57-58):
    * a small lookup table is shipped to every task and joined inside the
    * mapper, no shuffle of the fact side. Here the side file is the
    * supplier→nation mapping broadcast to executors; at 100 TB this is THE
    * join strategy for small dims (zero fact-side movement).
    */
  def mapSideJoin(s: SparkSession, dir: String, maxSideRows: Int = 10000000): DataFrame = {
    import s.implicits._
    val side0 = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    // Side data via the named distributed-cache API: the size guard is
    // folded into the single bounded collect job (limit(max+1)) — a side
    // table past the bound fails before broadcasting, with no extra count
    // job over the dim table and nothing read from the fact side.
    val side = graft.runtime.SideData.broadcastMap(side0.as[(Long, Int)], maxSideRows)
    val mapped = Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_quantity"))
      .as[(Long, Double)]
      .mapPartitions { it =>
        val lk = side.value // one deref per partition, like a cached side file
        it.flatMap { case (sk, q) => lk.get(sk).map(nk => (nk, q)) }
      }
      .toDF("nationkey", "qty")
    mapped.groupBy(col("nationkey"))
      .agg(graft.queries.Exact.dsum(col("qty"), 2).as("sum_qty"),
        count(lit(1)).as("n_items"))
  }

  val mapSideJoinSql: String =
    s"""SELECT s_nationkey AS nationkey,
       |${graft.queries.Exact.sqlSum("l_quantity", 2)} AS sum_qty,
       |COUNT(*) AS n_items
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey""".stripMargin
}
