package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash signature: the `bits`-bit per-token-hash majority-vote
  * signature of `text` (tokens ≡ [[graft.llm.Hashing.tokens]]: split on
  * ' ', empties dropped; token hash = md5-60, the engine-portable
  * construction every dedup operator shares) — ONE codegen'd pass.
  *
  * Returns `-1` for token-less documents (impossible as a real signature:
  * valid signatures are in [0, 2^bits)), which callers filter — mirroring
  * the composed form, where a document with no tokens never reaches the
  * vote aggregate.
  *
  * Why fused: the composed form ([[graft.llm.Dedup.simhash]]'s original
  * shape) exploded one row per corpus TOKEN into a 32-conditional-sum
  * hash-aggregate — map-side combining bounds what shuffles, but the
  * explode rows, the aggregate hash table, and the exchange all exist
  * only to compute a statistic that is per-document: a row-local vote
  * array computes it with zero movement. Same finding as MinHashSig
  * (signature generation must be a scan, not a shuffle).
  */
case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.sig(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.sig($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {

  /** `-1` ⇔ no tokens (callers filter; a real signature is ≥ 0). */
  val Empty: Long = -1L

  def sig(s: UTF8String, bits: Int): Long = {
    val bytes = s.getBytes
    val total = bytes.length
    val votes = new Array[Int](bits)
    var nTokens = 0
    val md = Md5Hash60.threadMd
    var i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        val start = i
        while (i < total && bytes(i) != ' ') i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val h = Md5Hash60.digest60(md)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        nTokens += 1
      }
    }
    if (nTokens == 0) return Empty
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column wrapper. */
  def apply(c: Column, bits: Int): Column =
    GraftShims.column(SimHashSig(GraftShims.expression(c), bits))
}
