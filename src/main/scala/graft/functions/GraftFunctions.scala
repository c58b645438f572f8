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

  /** ExpressionInfo with a usage string so `DESCRIBE FUNCTION` documents
    * the surface (`_FUNC_` is Spark's placeholder for the function name).
    */
  private def info(className: String, name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(className, null, name, usage, "")

  private[functions] val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_md5hash60",
      info(classOf[Md5Hash60].getName, "graft_md5hash60",
        "_FUNC_(str) - Returns the first 60 bits of md5(str) as a bigint — " +
          "the engine-portable hash every dedup signature builds on."),
      (exprs: Seq[Expression]) => Md5Hash60(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.BinaryType))),
    ("graft_chargini",
      info(classOf[CharGini].getName, "graft_chargini",
        "_FUNC_(str) - Returns the Gini impurity of the character " +
          "distribution of str (0 = one repeated char, →1 = uniform)."),
      (exprs: Seq[Expression]) => CharGini(exprs.head)),
    ("graft_floatvecdot",
      info(classOf[FloatVecDot].getName, "graft_floatvecdot",
        "_FUNC_(a, b) - Returns the dot product of two float arrays as a " +
          "double, accumulated in index order (bit-stable across engines)."),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))),
    ("graft_intvecdot",
      info(classOf[IntVecDot].getName, "graft_intvecdot",
        "_FUNC_(a, b) - Returns the dot product of two int arrays as a " +
          "bigint (integer-exact, the sq8-quantized ANN scoring kernel)."),
      (exprs: Seq[Expression]) => IntVecDot(exprs(0), exprs(1))),
    ("graft_minshinglehash60",
      info(classOf[MinShingleHash60].getName, "graft_minshinglehash60",
        "_FUNC_(text, n) - Returns the minimum 60-bit hash over the " +
          "n-char shingles of text (n must be an integer literal)."),
      (exprs: Seq[Expression]) => {
        arity("graft_minshinglehash60(text, n)", exprs, 2)
        MinShingleHash60(exprs.head,
          foldableInt("graft_minshinglehash60", "n", exprs(1)))
      }),
    ("graft_wordbigrams",
      info(classOf[WordBigrams].getName, "graft_wordbigrams",
        "_FUNC_(text) - Returns the array of adjacent whitespace-token " +
          "bigrams of text ('a b', 'b c', ...)."),
      (exprs: Seq[Expression]) => WordBigrams(exprs.head)),
    ("graft_minhashsig",
      info(classOf[MinHashSig].getName, "graft_minhashsig",
        "_FUNC_(text, n, k) - Returns the k-hash MinHash signature over " +
          "distinct n-char shingles of text as an array<bigint> " +
          "(Kirsch-Mitzenmacher two-hash construction; n, k integer literals)."),
      (exprs: Seq[Expression]) => {
        arity("graft_minhashsig(text, n, k)", exprs, 3)
        MinHashSig(exprs.head,
          foldableInt("graft_minhashsig", "n", exprs(1)),
          foldableInt("graft_minhashsig", "k", exprs(2)))
      }),
    ("graft_shinglehash60s",
      info(classOf[ShingleHash60s].getName, "graft_shinglehash60s",
        "_FUNC_(text, n) - Returns the 60-bit hashes of the distinct " +
          "n-char shingles of text as an array<bigint> (n integer literal)."),
      (exprs: Seq[Expression]) => {
        arity("graft_shinglehash60s(text, n)", exprs, 2)
        ShingleHash60s(exprs.head,
          foldableInt("graft_shinglehash60s", "n", exprs(1)))
      }),
    ("graft_signlshbuckets",
      info(classOf[SignLshBuckets].getName, "graft_signlshbuckets",
        "_FUNC_(embedding, tables, bits) - Returns one sign-random-" +
          "projection LSH bucket per table for a float-array embedding " +
          "(md5-derived hyperplanes; tables, bits integer literals)."),
      (exprs: Seq[Expression]) => {
        arity("graft_signlshbuckets(embedding, tables, bits)", exprs, 3)
        SignLshBuckets(exprs.head,
          foldableInt("graft_signlshbuckets", "tables", exprs(1)),
          foldableInt("graft_signlshbuckets", "bits", exprs(2)))
      }),
    ("graft_simhashsig",
      info(classOf[SimHashSig].getName, "graft_simhashsig",
        "_FUNC_(text, bits) - Returns the SimHash signature of text's " +
          "whitespace tokens as a bigint (-1 for token-less input; bits " +
          "integer literal, at most 63)."),
      (exprs: Seq[Expression]) => {
        arity("graft_simhashsig(text, bits)", exprs, 2)
        SimHashSig(exprs.head, foldableInt("graft_simhashsig", "bits", exprs(1)))
      }),
    ("graft_tokenstats",
      info(classOf[TokenStats].getName, "graft_tokenstats",
        "_FUNC_(text) - Returns a struct of per-document token statistics " +
          "(token/type counts, mean length, stopword ratio) in one pass."),
      (exprs: Seq[Expression]) => {
        arity("graft_tokenstats(text)", exprs, 1)
        TokenStats(exprs.head, TokenStats.DefaultStopwords)
      }),
    ("graft_termcounts",
      info(classOf[TermCounts].getName, "graft_termcounts",
        "_FUNC_(text) - Returns the array of (term, count) structs for " +
          "text's distinct whitespace tokens — row-local term frequencies."),
      (exprs: Seq[Expression]) => {
        arity("graft_termcounts(text)", exprs, 1)
        TermCounts(exprs.head)
      }),
    ("graft_topbigram",
      info(classOf[TopBigram].getName, "graft_topbigram",
        "_FUNC_(text) - Returns (top_bigram, top_n, n_bigrams): the most " +
          "frequent adjacent token pair (binary-min tiebreak), its count, " +
          "and the total bigram count — ('', 0, 0) for < 2 tokens."),
      (exprs: Seq[Expression]) => {
        arity("graft_topbigram(text)", exprs, 1)
        TopBigram(exprs.head)
      }),
    ("graft_dupgramcovered",
      info(classOf[DupGramCovered].getName, "graft_dupgramcovered",
        "_FUNC_(text, k) - Returns the number of token positions of text " +
          "covered by a within-document duplicated token k-gram (the " +
          "Gopher repetition-rule statistic; k integer literal >= 2)."),
      (exprs: Seq[Expression]) => {
        arity("graft_dupgramcovered(text, k)", exprs, 2)
        DupGramCovered(exprs.head,
          foldableInt("graft_dupgramcovered", "k", exprs(1)))
      }))

  /** The registered SQL surface, for doc/spec enumeration. */
  def names: Seq[String] = all.map(_._1)

  def register(s: SparkSession): Unit =
    all.foreach { case (name, fnInfo, builder) =>
      // registerFunction (not createOrReplaceTempFunction) so the
      // ExpressionInfo — and with it DESCRIBE FUNCTION's usage text —
      // reaches the registry
      s.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), fnInfo, builder)
    }
}
