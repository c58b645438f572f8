package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document top word-bigram: ONE codegen'd pass over the UTF-8
  * bytes computing the Gopher-style repetition evidence —
  *
  *   - `top_bigram`: the most frequent adjacent token pair (joined with a
  *     single space), ties broken by the binary-smallest bigram (matches
  *     DuckDB's default collation, so the oracle's `ORDER BY n DESC,
  *     bigram` tiebreak is reproduced exactly),
  *   - `top_n`: its occurrence count,
  *   - `n_bigrams`: total adjacent pairs = n_tokens − 1.
  *
  * Texts with fewer than two tokens have no bigram; the struct comes back
  * as `("", 0, 0)` so the expression stays non-null-producing (null-out
  * paths fall off `defineCodeGen`) — consumers filter `n_bigrams > 0`.
  *
  * Why fused: the composed form is explode(bigrams) → groupBy(doc_id,
  * bigram) → max — a shuffle of one row per TOKEN of the corpus to compute
  * a per-document statistic. Like [[MinShingleHash60]], the fused form
  * keeps the whole computation row-local: at 100 TB the operator is a pure
  * scan, and the only cost is one hash map of distinct bigrams per row.
  * Tokenization matches [[graft.llm.Hashing.tokens]] (split on the 0x20
  * byte, empties dropped — UTF-8-safe since a space byte never occurs
  * inside a multi-byte sequence).
  */
case class TopBigram(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = TopBigram.Schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TopBigram.topBigram(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopBigram.topBigram($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigram =
    copy(child = newChild)
}

object TopBigram {

  val Schema: StructType = StructType(Seq(
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_n", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))

  /** One pass: walk tokens, count adjacent pairs in a hash map, then pick
    * (max count, binary-min bigram). Named `topBigram`, not `eval` — a
    * companion method named `eval` shadows the static forwarder Janino
    * needs and silently kills whole-stage codegen (the round-8 t04 bug).
    */
  def topBigram(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val total = bytes.length
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var prevStart = -1
    var prevEnd = -1
    var nBigrams = 0
    var i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        val start = i
        while (i < total && bytes(i) != ' ') i += 1
        if (prevStart >= 0) {
          // bigram = prev token + ' ' + this token, materialized once
          val len = (prevEnd - prevStart) + 1 + (i - start)
          val bg = new Array[Byte](len)
          System.arraycopy(bytes, prevStart, bg, 0, prevEnd - prevStart)
          bg(prevEnd - prevStart) = ' '
          System.arraycopy(bytes, start, bg, prevEnd - prevStart + 1, i - start)
          val key = UTF8String.fromBytes(bg)
          val slot = counts.get(key)
          if (slot == null) counts.put(key, Array(1)) else slot(0) += 1
          nBigrams += 1
        }
        prevStart = start
        prevEnd = i
      }
    }
    if (nBigrams == 0)
      return new GenericInternalRow(Array[Any](UTF8String.EMPTY_UTF8, 0, 0))
    var bestKey: UTF8String = null
    var bestN = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val n = e.getValue()(0)
      if (n > bestN || (n == bestN && e.getKey.compareTo(bestKey) < 0)) {
        bestN = n
        bestKey = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](bestKey, bestN, nBigrams))
  }

  def apply(c: Column): Column =
    GraftShims.column(TopBigram(GraftShims.expression(c)))
}
