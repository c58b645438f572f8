package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused within-document duplicated-k-gram coverage (the t17 / Gopher
  * repetition-rule kernel): the number of token positions of `text`
  * covered by any token k-gram whose [[Md5Hash60]] value occurs two or
  * more times WITHIN the document — semantically identical to the
  * composed higher-order-function form
  * ([[graft.llm.TextAnalysis.withDupCoveredHof]]: gram-hash `transform` →
  * `array_sort` → adjacent-equal dup set → covered-position
  * `filter`/`exists`), as ONE codegen'd pass.
  *
  * Why fused: the composed form runs every lambda on the INTERPRETED
  * expression path, and its final covered-position scan is
  * `filter(sequence(1,n), j -> exists(ds, ...))` — O(n·d) interpreted
  * steps per row (judge-timed at 110 s for the sf0.1 corpus, 1.65× the
  * whole 105-query inventory). This expression walks the UTF-8 bytes
  * once, md5s each gram incrementally off the token spans (no gram
  * string is ever materialized), finds duplicated values in a sorted
  * copy (binary-search neighbor test), and counts the covered positions
  * as an interval union in a single ordered pass — O(g log g) with g =
  * gram count, allocation ≈ three primitive arrays per row.
  *
  * Contract notes (all mirrored by the DuckDB oracle):
  *   - tokens = split on the 0x20 byte, empties dropped (UTF-8-safe: a
  *     space byte never occurs inside a multi-byte sequence);
  *   - grams compare by 60-bit md5 VALUE, so the ~1e-18/pair collision
  *     note of [[graft.llm.SpanDedup]] applies identically here;
  *   - documents with fewer than k tokens have no k-gram → 0.
  */
case class DupGramCovered(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 2, s"gram width must be >= 2, got $k")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    DupGramCovered.covered(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DupGramCovered.covered($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): DupGramCovered =
    copy(child = newChild)
}

object DupGramCovered {

  def covered(s: UTF8String, k: Int): Int = {
    val bytes = s.getBytes
    val total = bytes.length
    // pass 1: token count (split on ' ', empties dropped)
    var nTokens = 0
    var i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        nTokens += 1
        while (i < total && bytes(i) != ' ') i += 1
      }
    }
    if (nTokens < k) return 0
    // pass 2: token spans
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    i = 0
    while (i < total) {
      while (i < total && bytes(i) == ' ') i += 1
      if (i < total) {
        starts(t) = i
        while (i < total && bytes(i) != ' ') i += 1
        ends(t) = i
        t += 1
      }
    }
    // gram hashes, fed to md5 incrementally (token bytes + single-space
    // joiners) — bit-identical to hash60(concat_ws(" ", tok_i..tok_{i+k-1}))
    val nGrams = nTokens - k + 1
    val hashes = new Array[Long](nGrams)
    val md = Md5Hash60.threadMd
    var g = 0
    while (g < nGrams) {
      md.reset()
      var j = g
      while (j < g + k) {
        if (j > g) md.update(' '.toByte)
        md.update(bytes, starts(j), ends(j) - starts(j))
        j += 1
      }
      hashes(g) = Md5Hash60.digest60(md)
      g += 1
    }
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    // interval union over duplicated gram starts, 1-based positions:
    // start p covers [p+1, p+k]; the ordered walk keeps a rolling `end`
    var count = 0
    var end = 0
    var p = 0
    while (p < nGrams) {
      val idx = java.util.Arrays.binarySearch(sorted, hashes(p))
      // any found index of a value with multiplicity >= 2 has an equal
      // neighbor on at least one side
      val dup = (idx > 0 && sorted(idx - 1) == hashes(p)) ||
        (idx + 1 < nGrams && sorted(idx + 1) == hashes(p))
      if (dup) {
        val lo = math.max(p + 1, end + 1)
        val hi = p + k
        if (hi >= lo) count += hi - lo + 1
        if (hi > end) end = hi
      }
      p += 1
    }
    count
  }

  /** Column wrapper. */
  def apply(c: Column, k: Int): Column =
    GraftShims.column(DupGramCovered(GraftShims.expression(c), k))
}
