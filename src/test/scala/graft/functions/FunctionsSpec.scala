package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mr.TestSession
import graft.llm.Hashing

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("Md5Hash60 is bit-identical to conv(substring(md5,1,15),16,10)") {
    // adversarial inputs: empty, unicode, long strings, binary-ish bytes
    val data = (Seq("", "a", "abc", "é中文", "\t\n\\\"",
      "x" * 10000) ++ (0 until 1000).map(i => s"row-$i-payload")).toDF("s")
    val mismatches = data
      .select(Hashing.hash60($"s").as("fast"), Hashing.hash60Reference($"s").as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(mismatches == 0)
  }

  test("Md5Hash60 matches a known digest value") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72 → first 15 hex digits
    val got = Seq("abc").toDF("s").select(Hashing.hash60($"s")).as[Long].head()
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("graft_md5hash60 is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_md5hash60('abc') AS h").as[Long].head()
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("FloatVecDot is bit-identical to the HOF aggregate/zip_with form") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }.toDF("id", "v")
    val pairs = vecs.as("a").crossJoin(vecs.limit(10).as("b"))
      .select(col("a.v").as("qv"), col("b.v").as("embedding"))
    val hof = expr(
      "aggregate(zip_with(qv, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")
    val mismatches = pairs
      .select(FloatVecDot(col("qv"), col("embedding")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("Md5Hash60 stays in whole-stage codegen") {
    val df = spark.range(100).select(Hashing.hash60(col("id").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [md5hash60"), plan)
    assert(df.distinct().count() == 100)
  }
}
