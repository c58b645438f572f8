package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared code-point windowing for the fused shingle expressions. */
private[functions] object Utf8Spans {

  /** Code-point start offsets of the UTF-8 bytes, plus a trailing sentinel
    * equal to `bytes.length`; result length = #codepoints + 1. Splitting a
    * window at these offsets is exactly Spark `substr` semantics.
    */
  def offsets(bytes: Array[Byte]): Array[Int] = {
    val total = bytes.length
    var chars = 0
    var i = 0
    while (i < total) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      chars += 1
    }
    val offs = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < total) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(chars) = total
    offs
  }
}

/** Fused MinHash signature: the full k-hash MinHash signature of `text`
  * over its `n`-code-point shingles, as ONE codegen'd pass — no shingle
  * array, no explode, no 16-column min-aggregate, no shuffle.
  *
  * Hash construction is the engine-portable two-hash scheme the DuckDB
  * oracle mirrors (Kirsch–Mitzenmacher composition over md5-60):
  * `a = md5hash60(shingle)`, `b = md5hash60('#'+shingle) & (2^56-1)`,
  * `h_i = (a + i·b) & (2^60-1)`, minimized over all shingles. The min is
  * invariant under shingle dedup, so the DISTINCT in the composed form
  * (and the oracle) needs no mirroring here. Texts shorter than `n`
  * (including empty) contribute the whole text as their only shingle,
  * exactly like [[graft.llm.Hashing.shingles]].
  *
  * Why fused: the composed plan paid an interpreted `transform` lambda
  * per shingle, one exploded row per (doc, shingle), and a 16-way min
  * hash-aggregate — at 100 TB that explode is ~one row per character of
  * the corpus shuffled into an aggregate, for a statistic that is
  * per-document and needs no data movement at all.
  */
case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(k >= 1 && k <= 64, s"signature length must be in [1, 64], got $k")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** 60-bit value domain of the base hash; `a` is already ≤ 60 bits. */
  private val H60Mask = (1L << 60) - 1

  /** `b` masked to 56 bits so `i·b` can't overflow a signed 64-bit int in
    * either engine (DuckDB errors on BIGINT overflow).
    */
  private val B56Mask = (1L << 56) - 1

  def sig(s: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = Utf8Spans.offsets(bytes)
    val chars = offs.length - 1
    val windows = math.max(chars - n + 1, 1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = Md5Hash60.threadMd
    var w = 0
    while (w < windows) {
      val start = offs(w)
      val len = offs(math.min(w + n, chars)) - start
      md.reset()
      md.update(bytes, start, len)
      val a = Md5Hash60.digest60(md)
      md.reset()
      md.update('#'.toByte)
      md.update(bytes, start, len)
      val b = Md5Hash60.digest60(md) & B56Mask
      var i = 0
      while (i < k) {
        val h = (a + i.toLong * b) & H60Mask
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** Column wrapper. */
  def apply(c: Column, n: Int, k: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(c), n, k))
}
