package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Dot product of two `array<int>` columns, accumulated in a long — the
  * scoring kernel of the int8-quantized ANN path ([[graft.llm.Similarity]]
  * `sq8Knn`). INTEGER-EXACT: unlike the float cosine (whose cross-engine
  * equality leans on identical accumulation order), an integer dot has one
  * possible value on any engine, so the quantized ranking is portable by
  * construction, not by discipline. Long accumulation overflows only past
  * ~2^63 / (127·127) ≈ 5.7e14 dimensions — unreachable.
  *
  * Same contract as [[FloatVecDot]]: codegen'd tight loop (the HOF
  * `aggregate(zip_with(...))` form interprets its lambda per element),
  * equal lengths required, null arrays propagate null.
  */
case class IntVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires two array<int> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    IntVecDot.dot(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntVecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}

object IntVecDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    // equal lengths are the contract (fixed-dim quantized vectors); a
    // silent truncation would return a plausible-but-wrong partial product
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"IntVecDot requires equal-length vectors, got $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.column(IntVecDot(GraftShims.expression(a), GraftShims.expression(b)))
}
