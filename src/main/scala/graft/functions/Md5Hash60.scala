package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native 60-bit MD5 hash: the first 15 hex digits of md5(input) as a
  * long — bit-identical to `conv(substring(md5(x),1,15),16,10)` (and to
  * DuckDB's `('0x'||substr(md5(x),1,15))::BIGINT`), but computed straight
  * from the digest bytes: big-endian first 8 bytes, logical-shifted right
  * by 4. No 32-char hex string, no base-conversion string parse — the two
  * allocations the composed form pays per row.
  *
  * This is the hot inner loop of MinHash/SimHash/fingerprinting (2 × ~2M
  * calls per signature pass at sf0.1, billions at 100 TB), which justifies
  * a custom codegen'd Expression over composing built-ins (SURVEY.md §7.4
  * preference order: this is case (b)).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires binary input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Thread-local digest for span-based hashing in sibling expressions. */
  private[functions] def threadMd: java.security.MessageDigest = localMd.get()

  /** Finish the digest and truncate to the 60-bit value (same contract as
    * [[hash]]) — for callers that fed the digest incrementally.
    */
  private[functions] def digest60(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** First 15 hex digits of md5(bytes) as an unsigned 60-bit long. */
  def hash(bytes: Array[Byte]): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(bytes)
    // big-endian first 8 digest bytes = first 16 hex digits; >>> 4 drops
    // the 16th digit, leaving digits 1..15 exactly like substring(hex,1,15)
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** Column wrapper (input auto-cast to binary). */
  def apply(c: Column): Column =
    GraftShims.column(Md5Hash60(GraftShims.expression(c.cast("binary"))))
}
