package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused min-shingle-hash: `array_min(transform(shingles(text, n), hash60))`
  * as ONE codegen'd pass over the string — the winnowing fingerprint
  * (min of md5-60 over all `n`-code-point windows; texts shorter than `n`
  * contribute the whole text as their only window, exactly like
  * [[graft.llm.Hashing.shingles]]).
  *
  * Why fused: the composed form materializes the shingle array and runs
  * `transform`'s lambda in the INTERPRETED path per element (higher-order
  * functions don't codegen their lambdas), which benchmarked slower than
  * the explode+shuffle plan it replaced. This expression walks the UTF-8
  * bytes once, md5s each window slice in place (no substring/array/string
  * allocations), and keeps the whole computation inside whole-stage
  * codegen. The min is invariant under shingle dedup, so it matches the
  * DISTINCT-based DuckDB oracle exactly.
  */
case class MinShingleHash60(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MinShingleHash60.minHash(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinShingleHash60.minHash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleHash60 =
    copy(child = newChild)
}

object MinShingleHash60 {

  /** Min of hash60 over all n-code-point windows of the UTF-8 bytes.
    * Windows slide by code point (Spark `substr` semantics); the byte span
    * of window w is [offset(w), offset(w+n)) against the code-point offset
    * table. A string shorter than n (including empty) hashes once, whole.
    *
    * Named `minHash`, NOT `eval`: generated code calls this as a STATIC
    * forwarder on the companion class, and scalac omits the forwarder when
    * the case class inherits a member of the same name
    * (`Expression.eval`) — with the old name Janino failed compilation
    * ("no applicable method for (UTF8String, int)") and every t04 plan
    * silently ran with whole-stage codegen DISABLED (the unexplained
    * CodeGenerator.doCompile trace in the r6/r7 bench tails).
    */
  def minHash(s: UTF8String, n: Int): Long = {
    val bytes = s.getBytes
    val total = bytes.length
    // code-point start offsets (ASCII fast path: offsets are identity)
    var chars = 0
    var i = 0
    var asciiOnly = true
    while (i < total) {
      val b = bytes(i)
      if ((b & 0x80) == 0) i += 1
      else {
        asciiOnly = false
        i += UTF8String.numBytesForFirstByte(b)
      }
      chars += 1
    }
    val md = localMd.get()
    var min = Long.MaxValue
    if (asciiOnly) {
      val windows = math.max(chars - n + 1, 1)
      var w = 0
      while (w < windows) {
        val end = math.min(w + n, total)
        md.reset()
        md.update(bytes, w, end - w)
        val h = digest60(md)
        if (h < min) min = h
        w += 1
      }
    } else {
      val offsets = new Array[Int](chars + 1)
      var c = 0
      i = 0
      while (i < total) {
        offsets(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offsets(chars) = total
      val windows = math.max(chars - n + 1, 1)
      var w = 0
      while (w < windows) {
        val start = offsets(w)
        val end = offsets(math.min(w + n, chars))
        md.reset()
        md.update(bytes, start, end - start)
        val h = digest60(md)
        if (h < min) min = h
        w += 1
      }
    }
    min
  }

  private def digest60(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column wrapper. */
  def apply(c: Column, n: Int): Column =
    GraftShims.column(MinShingleHash60(GraftShims.expression(c), n))
}
