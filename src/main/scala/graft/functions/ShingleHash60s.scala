package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused distinct-shingle hashes:
  * `transform(shingles(text, n), hash60)` — i.e. the md5-60 hash of every
  * DISTINCT `n`-code-point shingle of `text` — as ONE codegen'd pass.
  *
  * Distinctness is by shingle STRING (mirroring `array_distinct` in the
  * composed form and `SELECT DISTINCT` in the DuckDB oracle), not by hash:
  * two distinct shingles that collided in the 60-bit hash would both be
  * emitted, preserving exact multiset equality with the composed plan.
  * Order is first occurrence; downstream consumers (explode → join/agg)
  * are order-insensitive. Texts shorter than `n` (including empty) yield
  * the whole text as their only shingle.
  *
  * Why fused: the composed form pays an interpreted `transform` lambda
  * per window plus an `array_distinct` pass and a per-row expression-tree
  * walk for the hash; this walks the UTF-8 bytes once, dedups through a
  * zero-copy `UTF8String` view of each window, and md5s only new shingles.
  */
case class ShingleHash60s(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60s.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash60s.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60s =
    copy(child = newChild)
}

object ShingleHash60s {

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = Utf8Spans.offsets(bytes)
    val chars = offs.length - 1
    val windows = math.max(chars - n + 1, 1)
    // clamp BEFORE doubling: windows*2 overflows Int for ~2^30-codepoint
    // documents, which would pass a negative capacity and crash on valid
    // (if huge) input
    val seen = new java.util.HashSet[UTF8String](math.min(windows, 1 << 15) * 2)
    val out = new Array[Long](windows)
    var nOut = 0
    val md = Md5Hash60.threadMd
    var w = 0
    while (w < windows) {
      val start = offs(w)
      val len = offs(math.min(w + n, chars)) - start
      // zero-copy view over the window bytes; hashCode/equals span-scoped
      val view = UTF8String.fromBytes(bytes, start, len)
      if (seen.add(view)) {
        md.reset()
        md.update(bytes, start, len)
        out(nOut) = Md5Hash60.digest60(md)
        nOut += 1
      }
      w += 1
    }
    new GenericArrayData(if (nOut == windows) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** Column wrapper. */
  def apply(c: Column, n: Int): Column =
    GraftShims.column(ShingleHash60s(GraftShims.expression(c), n))
}
