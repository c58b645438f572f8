package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document term frequencies: `(term, tf)` pairs for every
  * DISTINCT whitespace token of `text` (tokens ≡
  * [[graft.llm.Hashing.tokens]]: `split(text, ' ')`, empties dropped),
  * in first-occurrence order, as ONE codegen'd pass.
  *
  * Semantically `explode(tokens(text)) → groupBy(doc, term) → count(*)`,
  * but the aggregation happens per ROW instead of per SHUFFLE: term
  * frequency within a document is a row-local statistic, so the composed
  * form's hash-aggregate — which shuffles one row per corpus token, the
  * single largest data movement in TF-IDF-style queries — does no work a
  * per-row hash map can't. At 100 TB the difference is the whole exploded
  * corpus (≈ token count × row overhead) flowing through an exchange vs
  * nothing at all.
  *
  * Splitting on the 0x20 byte is UTF-8-safe (a space byte never occurs
  * inside a multi-byte sequence). `tf` is LongType to match `count(*)`.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = TermCounts.Schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  val Schema: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  def counts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // first-occurrence order: LinkedHashMap keeps output deterministic
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        val start = i
        while (i < total && bytes(i) != ' ') i += 1
        val view = UTF8String.fromBytes(bytes, start, i - start)
        val cnt = m.get(view)
        if (cnt == null) m.put(view, Array(1L)) else cnt(0) += 1L
      }
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      out(n) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(c: Column): Column =
    GraftShims.column(TermCounts(GraftShims.expression(c)))
}
