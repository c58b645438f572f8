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

  /** Extracts an Int from a foldable literal argument. Several expressions
    * bake their int parameters into generated code, so a non-constant
    * argument cannot work — fail analysis with a clear message instead.
    */
  private def foldableInt(fn: String, arg: String, e: Expression): Int = e match {
    case f if f.foldable => f.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable integer literal")
  }

  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n, s"$fn takes exactly $n arguments")

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
        arity("graft_minshinglehash60(text, n)", exprs, 2)
        MinShingleHash60(exprs.head,
          foldableInt("graft_minshinglehash60", "n", exprs(1)))
      }),
    ("graft_wordbigrams",
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_wordbigrams"),
      (exprs: Seq[Expression]) => WordBigrams(exprs.head)),
    ("graft_minhashsig",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhashsig"),
      (exprs: Seq[Expression]) => {
        arity("graft_minhashsig(text, n, k)", exprs, 3)
        MinHashSig(exprs.head,
          foldableInt("graft_minhashsig", "n", exprs(1)),
          foldableInt("graft_minhashsig", "k", exprs(2)))
      }),
    ("graft_shinglehash60s",
      new ExpressionInfo(classOf[ShingleHash60s].getName, "graft_shinglehash60s"),
      (exprs: Seq[Expression]) => {
        arity("graft_shinglehash60s(text, n)", exprs, 2)
        ShingleHash60s(exprs.head,
          foldableInt("graft_shinglehash60s", "n", exprs(1)))
      }),
    ("graft_signlshbuckets",
      new ExpressionInfo(classOf[SignLshBuckets].getName, "graft_signlshbuckets"),
      (exprs: Seq[Expression]) => {
        arity("graft_signlshbuckets(embedding, tables, bits)", exprs, 3)
        SignLshBuckets(exprs.head,
          foldableInt("graft_signlshbuckets", "tables", exprs(1)),
          foldableInt("graft_signlshbuckets", "bits", exprs(2)))
      }),
    ("graft_simhashsig",
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhashsig"),
      (exprs: Seq[Expression]) => {
        arity("graft_simhashsig(text, bits)", exprs, 2)
        SimHashSig(exprs.head, foldableInt("graft_simhashsig", "bits", exprs(1)))
      }),
    ("graft_tokenstats",
      new ExpressionInfo(classOf[TokenStats].getName, "graft_tokenstats"),
      (exprs: Seq[Expression]) => {
        arity("graft_tokenstats(text)", exprs, 1)
        TokenStats(exprs.head, TokenStats.DefaultStopwords)
      }),
    ("graft_termcounts",
      new ExpressionInfo(classOf[TermCounts].getName, "graft_termcounts"),
      (exprs: Seq[Expression]) => {
        arity("graft_termcounts(text)", exprs, 1)
        TermCounts(exprs.head)
      }))

  def register(s: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      s.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
