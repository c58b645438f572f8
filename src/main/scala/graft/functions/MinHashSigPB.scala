package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** [[MinHashSig]]'s per-band-independent variant — the A/B arm of the
  * Kirsch–Mitzenmacher anchor-bucket measurement (SCALING.md §3b).
  *
  * The shipped two-hash scheme draws ONE (a, b) per shingle and extends it
  * across all k rows (`h_i = a + i·b`), which makes every row of a band
  * share the same argmin-stability failure: a corpus-common shingle with a
  * small draw anchors the whole band signature for every document that
  * contains it. This variant redraws per BAND:
  * `a_β = md5-60(β ‖ ':' ‖ shingle)`, `b_β = md5-60(β ‖ '#' ‖ shingle) &
  * (2^56−1)`, `h_{β,r} = (a_β + r·b_β) & (2^60−1)` — 2·bands md5
  * computations per shingle instead of 2, so whether one shingle anchors a
  * band becomes an independent draw per band instead of one global event.
  *
  * Measurement-only for now: no oracle mirror ships until the A/B says the
  * scan-cost multiple buys a real candidate reduction (the adopt-or-reject
  * decision the round-8 verdict asked to make on data, not argument).
  */
case class MinHashSigPB(child: Expression, n: Int, k: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(k >= 1 && k <= 64, s"signature length must be in [1, 64], got $k")
  require(rowsPerBand >= 1 && k % rowsPerBand == 0,
    s"rowsPerBand=$rowsPerBand must divide k=$k")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigPB.sig(input.asInstanceOf[UTF8String], n, k, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigPB.sig($c, $n, $k, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigPB =
    copy(child = newChild)
}

object MinHashSigPB {

  private val H60Mask = (1L << 60) - 1
  private val B56Mask = (1L << 56) - 1

  def sig(s: UTF8String, n: Int, k: Int, rowsPerBand: Int): ArrayData = {
    val bands = k / rowsPerBand
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
      var beta = 0
      while (beta < bands) {
        // band prefix as ASCII digits — deterministic and SQL-replayable
        // (β ‖ ':' ‖ shingle) should an oracle mirror ever be needed
        val prefix = beta.toString.getBytes("UTF-8")
        md.reset()
        md.update(prefix)
        md.update(':'.toByte)
        md.update(bytes, start, len)
        val a = Md5Hash60.digest60(md)
        md.reset()
        md.update(prefix)
        md.update('#'.toByte)
        md.update(bytes, start, len)
        val b = Md5Hash60.digest60(md) & B56Mask
        var r = 0
        while (r < rowsPerBand) {
          val h = (a + r.toLong * b) & H60Mask
          val i = beta * rowsPerBand + r
          if (h < mins(i)) mins(i) = h
          r += 1
        }
        beta += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** Column wrapper. */
  def apply(c: Column, n: Int, k: Int, rowsPerBand: Int): Column =
    GraftShims.column(MinHashSigPB(GraftShims.expression(c), n, k, rowsPerBand))
}
