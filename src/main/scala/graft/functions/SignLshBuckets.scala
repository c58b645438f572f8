package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Sign-random-projection LSH bucket signatures: for each of `nTables`
  * hash tables, the `bits`-bit signature of `embedding` against
  * deterministic md5-derived hyperplanes — as ONE codegen'd expression
  * (replaces a Scala UDF, which broke whole-stage codegen on the corpus
  * scan and needed a broadcast for the plane matrix).
  *
  * The hyperplane components are a pure function of (plane j, dim i):
  * `(md5hash60("j:i") mod 2000 − 1000)/1000 ∈ [−1, 1)` — exactly the
  * derivation the DuckDB oracle replays in SQL
  * ([[graft.llm.Similarity.lshKnnSql]]), so every engine and every
  * executor materializes identical planes with no data shipping at all.
  * Sign decisions are robust to fp summation order (P(|dot| < 1e-13) is
  * negligible per vector-plane).
  */
case class SignLshBuckets(child: Expression, nTables: Int, bits: Int)
    extends UnaryExpression {

  require(nTables >= 1 && bits >= 1 && bits <= 30,
    s"bad LSH shape: nTables=$nTables bits=$bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<float> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SignLshBuckets.buckets(input.asInstanceOf[ArrayData], nTables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SignLshBuckets.buckets($c, $nTables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {

  /** Embedding dimensionality the planes cover; vectors shorter than this
    * use only their own length (same truncation the UDF form applied).
    */
  val Dim = 64

  /** Deterministic pseudo-random hyperplane component r_j[i] ∈ [-1, 1),
    * derived from md5-60 so every engine/executor agrees.
    */
  def planeComponent(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$j:$i".getBytes("UTF-8"))
    (Md5Hash60.digest60(md) % 2000L - 1000L) / 1000.0
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  private def planes(nTables: Int, bits: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nTables, bits),
      _ => Array.tabulate(nTables * bits, Dim)(planeComponent))

  def buckets(v: ArrayData, nTables: Int, bits: Int): ArrayData = {
    val ps = planes(nTables, bits)
    val n = math.min(v.numElements(), Dim)
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val p = ps(t * bits + b)
        var d = 0.0
        var i = 0
        while (i < n) {
          d += v.getFloat(i) * p(i)
          i += 1
        }
        if (d >= 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(c: Column, nTables: Int, bits: Int): Column =
    GraftShims.column(SignLshBuckets(GraftShims.expression(c), nTables, bits))
}
