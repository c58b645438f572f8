package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`) so graft's custom
  * Catalyst expressions can be exposed as user-facing `Column`s. This is
  * the only file outside the `graft` namespace; it contains no logic.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows is private[sql]). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Clamp the size statistics a `localCheckpoint` INHERITS from the plan
    * it truncated (r20 optimization — the d56 profile's smoking gun).
    *
    * `Dataset.checkpoint` copies the optimized plan's `Statistics` into
    * the resulting `LogicalRDD` so downstream planning keeps size
    * information. But `SizeInBytesOnlyStatsPlanVisitor.visitJoin`
    * estimates a join as the PRODUCT of its children's sizes, so a
    * pipeline that checkpoints join outputs and joins them again
    * compounds the estimate MULTIPLICATIVELY across checkpoints — the
    * iterated label-propagation loop squares it every round. After a few
    * chained index-lifecycle steps the `BigInt` carries thousands of
    * digits, and every optimizer/AQE pass then burns wall-clock in
    * BigInteger Toom-Cook multiplication: profiled at 2/3 of d56's
    * 205 s wall, with per-iteration planning cost visibly DOUBLING
    * (1.2 → 2.4 → 3.1 → 7.3 → 18.6 s for five pointer-jump checkpoints
    * over constant-size data).
    *
    * The clamp keeps honest estimates untouched (anything ≤ capBytes —
    * small frames keep auto-broadcast eligibility exactly as before) and
    * caps the garbage products, which were never actionable: any
    * estimate past the cap means "huge, never broadcast" in every
    * planner decision, and AQE re-derives the real sizes at runtime
    * anyway. Answer-invariant: statistics feed strategy choices, never
    * results.
    */
  def clampCheckpointStats(df: DataFrame, capBytes: BigInt): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    df.queryExecution.logical match {
      case lr: LogicalRDD
          if lr.stats.sizeInBytes > capBytes ||
            lr.stats.rowCount.exists(_ > capBytes) =>
        val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
        classic.Dataset.ofRows(cs,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming)(cs,
            Some(Statistics(sizeInBytes = capBytes)),
            // keep the inherited constraints (isnotnull/equality facts the
            // optimizer uses for filter inference) — only the SIZE estimate
            // was pathological
            Some(lr.constraints)))
      case _ => df
    }
  }
}
