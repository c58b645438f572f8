package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused token-bigram builder: the array of space-joined adjacent token
  * pairs of `text`, where tokens are `split(text, ' ')` with empties
  * dropped — semantically identical to
  * `transform(sequence(1, size(toks)-1), i -> concat_ws(' ', toks[i], toks[i+1]))`
  * over [[graft.llm.Hashing.tokens]], as ONE codegen'd pass over the
  * UTF-8 bytes.
  *
  * Why fused: higher-order functions run their lambdas on the INTERPRETED
  * path per element; profiled at sf0.1, building the bigram array through
  * transform+element_at+concat_ws cost ~3.2 s of t06's 4.2 s while the
  * split itself cost 0.15 s. This expression scans the bytes once
  * (splitting on the 0x20 byte is UTF-8-safe: a space byte never occurs
  * inside a multi-byte sequence) and allocates exactly one byte array per
  * bigram. Texts with fewer than two tokens yield an empty array.
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    WordBigrams.build(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBigrams.build($c)")

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object WordBigrams {

  def build(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // token spans (start, end) — split on ' ', empties dropped
    var nTokens = 0
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        val start = i
        while (i < total && bytes(i) != ' ') i += 1
        starts.add(start)
        ends.add(i)
        nTokens += 1
      }
    }
    if (nTokens < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTokens - 1)
    var t = 0
    while (t < nTokens - 1) {
      val s1 = starts.get(t); val e1 = ends.get(t)
      val s2 = starts.get(t + 1); val e2 = ends.get(t + 1)
      val len1 = e1 - s1; val len2 = e2 - s2
      val buf = new Array[Byte](len1 + 1 + len2)
      System.arraycopy(bytes, s1, buf, 0, len1)
      buf(len1) = ' '
      System.arraycopy(bytes, s2, buf, len1 + 1, len2)
      out(t) = UTF8String.fromBytes(buf)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(c: Column): Column =
    GraftShims.column(WordBigrams(GraftShims.expression(c)))
}
