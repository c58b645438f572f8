package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** The PRODUCTION layout for int8-quantized vectors: one signed byte per
  * coordinate in a `binary` column — 64 bytes for a 64-dim code where the
  * `array<int>` modeling layout spends ~8 bytes/element (UnsafeArrayData:
  * 4-byte slot + null word + header). The d30/d31 scaladoc carried this as
  * a caveat; these two expressions close it ([[graft.llm.Similarity]]
  * `sq8KnnPacked` / `ivfSq8KnnPacked`, gates d34/d35):
  *
  *  - [[PackInt8]]  — `array<int>` → `binary`, one signed byte per element
  *    (inputs must already be in [-128, 127]; out-of-range THROWS rather
  *    than silently wrapping a wrong code into a plausible one);
  *  - [[BinVecDot]] — signed-byte dot of two codes, accumulated in a long
  *    (integer-exact like [[IntVecDot]]; equal lengths required).
  *
  * Both are codegen'd tight loops over the raw byte arrays. The byte
  * layout itself is cross-engine pinned by the d34 gate: the oracle
  * rebuilds each code's hex transcription from the same quantization
  * arithmetic and compares md5s, so a Spark-side layout change (order,
  * sign convention, width) fails the gate, not just a comment.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<int>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    PackInt8.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PackInt8.pack($a)")

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
}

object PackInt8 {
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = a.getInt(i)
      if (v < -128 || v > 127)
        throw new IllegalArgumentException(
          s"PackInt8: element $i = $v outside int8 range [-128, 127]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  def apply(a: Column): Column =
    GraftShims.column(PackInt8(GraftShims.expression(a)))
}

/** Signed-byte dot product of two packed int8 codes ([[PackInt8]]). */
case class BinVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == BinaryType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires two binary inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BinVecDot.dot(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BinVecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinVecDot =
    copy(left = newLeft, right = newRight)
}

object BinVecDot {
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = a.length
    if (b.length != n)
      throw new IllegalArgumentException(
        s"BinVecDot requires equal-length codes, got $n vs ${b.length}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a(i).toLong * b(i).toLong // signed bytes: the int8 convention
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(BinVecDot(GraftShims.expression(a), GraftShims.expression(b)))
}
