package graft.mr

import org.apache.spark.sql.SparkSession

/** In-process golden test harness — the capability port of the reference's
  * `mrtest` package (/root/reference/mrtest/testing.go:55-142): run a step
  * (or chained steps) over in-memory input lines and byte-compare the
  * sorted output against a golden expectation. Public API so engine users
  * can golden-test their own steps the way gomrjob users do.
  *
  * Comparison matches the reference: trim surrounding whitespace, sort
  * lines byte-lexicographically (the MR shuffle sort,
  * /root/reference/mrtest/testing.go:23,98-99), exact equality. Unlike
  * the reference's harness, combiners ARE exercised (its TODO at
  * testing.go:56) — steps run through the full MrPipeline physical path.
  */
object MrTest {

  final case class Result(
      output: Seq[String],
      counters: Counters,
      passed: Boolean,
      diff: Seq[String])

  /** Run steps over input lines; compare against golden output lines. */
  def testSteps(
      spark: SparkSession,
      steps: Seq[MrStep],
      input: Seq[String],
      golden: Seq[String]): Result = {
    import spark.implicits._
    val counters = Counters.create(spark.sparkContext, s"graft.mrtest.${steps.hashCode}")
    val out = MrPipeline.run(spark.createDataset(input), steps, counters)
      .collect().toSeq.map(_.trim).filter(_.nonEmpty).sorted
    val want = golden.map(_.trim).filter(_.nonEmpty).sorted
    val diff =
      (out.diff(want)).map("+ " + _) ++ (want.diff(out)).map("- " + _)
    Result(out, counters, diff.isEmpty, diff)
  }

  def testStep(
      spark: SparkSession,
      step: MrStep,
      input: Seq[String],
      golden: Seq[String]): Result = testSteps(spark, Seq(step), input, golden)
}
