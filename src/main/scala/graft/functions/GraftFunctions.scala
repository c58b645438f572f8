package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of graft's custom expressions, both ways Spark offers:
  *
  *  - [[GraftExtensions]]: injected at session build
  *    (`SparkSession.builder().withExtensions(new GraftExtensions)`), the
  *    deployment-grade path — every session on the cluster gets the
  *    functions, including pure-SQL users.
  *  - [[GraftFunctions.register]]: imperative registration on an existing
  *    session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftFunctions {

  private[functions] val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_md5hash60",
      new ExpressionInfo(classOf[Md5Hash60].getName, "graft_md5hash60"),
      (exprs: Seq[Expression]) => Md5Hash60(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.BinaryType))),
    ("graft_chargini",
      new ExpressionInfo(classOf[CharGini].getName, "graft_chargini"),
      (exprs: Seq[Expression]) => CharGini(exprs.head)),
    ("graft_floatvecdot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_floatvecdot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))),
    ("graft_minshinglehash60",
      new ExpressionInfo(classOf[MinShingleHash60].getName, "graft_minshinglehash60"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_minshinglehash60(text, n) takes exactly 2 arguments")
        // n parameterizes the generated code, so it must be a constant
        val n = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int  => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_minshinglehash60: n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_minshinglehash60: n must be a foldable integer literal")
        }
        MinShingleHash60(exprs.head, n)
      }),
    ("graft_wordbigrams",
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_wordbigrams"),
      (exprs: Seq[Expression]) => WordBigrams(exprs.head)))

  def register(s: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      s.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
