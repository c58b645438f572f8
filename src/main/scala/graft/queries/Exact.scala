package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-exact arithmetic helpers.
  *
  * The driver hash-compares Spark results against DuckDB (see
  * /root/repo/src/main/scala/graft/Verify.scala). Floating-point SUMs are
  * order-dependent, and Spark/DuckDB aggregate in different orders — so any
  * `sum(double)` would differ in the low bits and fail the hash compare.
  *
  * Fix: accumulate in exact decimal arithmetic (associative, order-free)
  * and cast the final value back to double. The matching oracle SQL applies
  * the identical cast chain, so both engines compute bit-identical results.
  * This is also the scale-correct posture: decimal aggregation keeps
  * map-side partial aggregation (combiner semantics,
  * /root/reference/map_reduce_step.go:15-17) exact across any partitioning
  * of a 100 TB input — results don't drift with cluster size.
  */
object Exact {

  /** Exact, order-insensitive sum of a double column: accumulate as
    * decimal(38,`scale`), return double. Oracle mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** Exact mean: decimal sum divided by count, one deterministic IEEE
    * division at the end. Oracle mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double") /
      count(c).cast("double")

  /** SQL fragment mirrors for oracle strings. */
  def sqlSum(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,$scale))) AS DOUBLE)"
  def sqlAvg(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,$scale))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE)"
}
