package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch — the
  * map-side prefilter that makes sketch-broadcast decontamination work
  * (see [[graft.llm.SpanDedup.contamSpansBloomDf]]).
  *
  * The filter rides the expression as a reference object (Spark's own
  * runtime-row-filter pattern: `ctx.addReferenceObj`, not a codegen'd
  * literal — the bit array can be megabytes and must never be inlined
  * into generated source). Task closures serialize the expression, so
  * each executor gets the sketch once per task-set, exactly like a
  * broadcast variable but scoped to the expression tree.
  *
  * False positives are inherent to the sketch (rate set at build time);
  * callers MUST exact-verify downstream — the probe is a volume filter,
  * never a truth source. No false negatives: a `false` is definitive.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires long input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(filter: BloomFilter, c: Column): Column =
    GraftShims.column(BloomMightContain(GraftShims.expression(c), filter))
}
