package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document token statistics: ONE codegen'd pass over the UTF-8
  * bytes computing everything the quality operators need —
  *
  *   - `n_tokens`: tokens of `split(text, ' ')` with empties dropped
  *     (≡ [[graft.llm.Hashing.tokens]]),
  *   - `n_distinct_tokens`: distinct by token STRING (≡ `array_distinct`),
  *   - `n_stopwords`: tokens in the given stopword set (case-sensitive,
  *     ≡ `filter(toks, isInCollection(stopwords))`),
  *   - `token_len_sum`: Σ code-point lengths (≡ `aggregate(transform(toks,
  *     length), 0, +)`),
  *   - `n_alpha`: ASCII-letter count of the whole text (≡
  *     `length(regexp_replace(text, "[^a-zA-Z]", ""))` — exact on UTF-8
  *     bytes because continuation bytes are ≥ 0x80, so counting bytes in
  *     [A-Za-z] can never over-count inside a multi-byte sequence).
  *
  * Why fused: the composed forms ran `transform`/`filter`/`aggregate`
  * lambdas on the INTERPRETED path per token, plus a regex pass — the same
  * finding that motivated WordBigrams/MinShingleHash60/CharGini (t06's
  * lambdas were ~75% of its cost). Every statistic here is per-row and
  * shuffle-free, so at 100 TB this is a pure scan — the only question is
  * CPU per byte, which this answers with one walk and zero regex.
  * Splitting on the 0x20 byte is UTF-8-safe (a space byte never occurs
  * inside a multi-byte sequence); code points are counted by skipping
  * continuation bytes.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = TokenStats.Schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.length * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.stats(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword set is expression state, not a literal — ship it into
    // the generated class as a reference object
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.stats($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("token_len_sum", LongType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false)))

  /** The text-analysis module's default stopword evidence set (kept here as
    * the single source of truth; [[graft.llm.TextAnalysis]] and the SQL
    * registration both read it).
    */
  val DefaultStopwords: Seq[String] = Seq("the", "and", "of", "a", "in", "to", "is")

  def stats(s: UTF8String, stop: java.util.HashSet[UTF8String]): InternalRow = {
    val bytes = s.getBytes
    val total = bytes.length
    var nTokens = 0
    var nStop = 0
    var lenSum = 0L
    var nAlpha = 0
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < total) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) nAlpha += 1
      i += 1
    }
    i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        val start = i
        var cps = 0
        while (i < total && bytes(i) != ' ') {
          // count code points: skip continuation bytes (0b10xxxxxx)
          if ((bytes(i) & 0xC0) != 0x80) cps += 1
          i += 1
        }
        nTokens += 1
        lenSum += cps
        val view = UTF8String.fromBytes(bytes, start, i - start)
        seen.add(view)
        if (stop.contains(view)) nStop += 1
      }
    }
    new GenericInternalRow(Array[Any](nTokens, seen.size(), nStop, lenSum, nAlpha))
  }

  /** Column wrapper (default stopword set). */
  def apply(c: Column): Column = apply(c, DefaultStopwords)

  def apply(c: Column, stopwords: Seq[String]): Column =
    GraftShims.column(TokenStats(GraftShims.expression(c), stopwords))
}
