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

  test("IntVecDot is exactly the HOF aggregate/zip_with long sum") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 255) - 127))
    }.toDF("id", "v")
    val pairs = vecs.as("a").crossJoin(vecs.limit(10).as("b"))
      .select(col("a.v").as("qa"), col("b.v").as("qv"))
    val hof = expr(
      "aggregate(zip_with(qa, qv, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, z) -> acc + z)")
    val mismatches = pairs
      .select(IntVecDot(col("qa"), col("qv")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("IntVecDot throws on length-mismatched vectors, never truncates") {
    val df = Seq((Array(1, 2, 3), Array(1, 2))).toDF("a", "b")
    val ex = intercept[Throwable] {
      df.select(IntVecDot(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("equal-length")), ex.toString)
  }

  test("FloatVecDot throws on length-mismatched vectors, never truncates") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val ex = intercept[Throwable] {
      df.select(FloatVecDot(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("equal-length")), ex.toString)
  }

  test("CharGini is bit-identical to the explode-aggregate form") {
    // adversarial: repeats, unicode (incl. astral plane), whitespace, long
    val data = (Seq("a", "aa", "ab", "aab", "é中文é", "x" * 5000,
      "😀😀y", "the quick brown fox") ++
      (0 until 500).map(i => s"doc $i " * (i % 17 + 1))).toDF("text")
    val agg = data
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), explode(transform(sequence(lit(1), length(col("text"))),
        i => col("text").substr(i, lit(1)))).as("ch"))
      .groupBy(col("id"), col("ch")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(sum(col("cnt") * col("cnt")).as("sumsq"), sum(col("cnt")).as("len"))
      .select(col("id"),
        (lit(1.0) - col("sumsq").cast("double") /
          (col("len").cast("double") * col("len").cast("double"))).as("ref"))
    val fast = data
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), CharGini(col("text")).as("fast"))
    val mismatches = fast.join(agg, "id").filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("CharGini known values and SQL registration") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_chargini('aab') AS g").as[Double].head()
    assert(got == 1.0 - 5.0 / 9.0) // counts 2,1 → 1 - (4+1)/9
    val uniform = Seq("abcd").toDF("s").select(CharGini($"s")).as[Double].head()
    assert(uniform == 0.75)
  }

  test("WordBigrams is identical to the transform/concat_ws HOF form") {
    // adversarial: empties, runs of spaces, leading/trailing, unicode,
    // single token, two tokens, long docs
    val data = (Seq("", " ", "a", "a b", "a  b", "  a b  ", "a b c d",
      "é中 文é x", "😀 y 😀", "one") ++
      (0 until 500).map(i => (0 to i % 23).map(j => s"w$i$j").mkString(" "))).toDF("text")
    val toks = graft.llm.Hashing.tokens($"text")
    val hof = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val mismatches = data
      .select(WordBigrams($"text").as("fast"), hof.as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(mismatches == 0)
    // and it stays in whole-stage codegen
    val df = spark.range(50)
      .select(WordBigrams(concat(lit("a b c"), col("id").cast("string"))).as("b"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [wordbigrams"),
      df.queryExecution.executedPlan.toString)
  }

  test("MinHashSig is identical to the explode + 16-way min-aggregate form") {
    val h60Mask = (1L << 60) - 1
    val b56Mask = (1L << 56) - 1
    val mh = 16
    val data = (Seq("", "a", "abcd", "abcde", "abcdef", "é中文é中文",
      "the quick brown fox jumps over the lazy dog", "aaaaaaaaaa") ++
      (0 until 300).map(i => s"document $i body " * (i % 7 + 1))).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val composed = data
      .select(col("doc_id"), explode(graft.llm.Hashing.shingles(col("text"), 5)).as("s"))
      .select(col("doc_id"),
        graft.llm.Hashing.hash60(col("s")).as("a"),
        graft.llm.Hashing.hash60(concat(lit("#"), col("s"))).bitwiseAND(lit(b56Mask)).as("b"))
      .groupBy(col("doc_id"))
      .agg(
        min(col("a").bitwiseAND(lit(h60Mask))).as("h0"),
        (1 until mh).map(i =>
          min((col("a") + lit(i.toLong) * col("b")).bitwiseAND(lit(h60Mask))).as(s"h$i")): _*)
      .select(col("doc_id"), array((0 until mh).map(i => col(s"h$i")): _*).as("ref"))
    val fused = data.select(col("doc_id"), MinHashSig(col("text"), 5, mh).as("fast"))
    val mismatches = fused.join(composed, "doc_id")
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("ShingleHash60s is identical to the distinct-shingles + hash60 form") {
    val data = (Seq("", "a", "ab", "abc", "abab", "aaaa", "é中文é中文x",
      "the cat sat on the mat") ++
      (0 until 300).map(i => s"gram $i payload " * (i % 5 + 1))).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    // compare as sorted multisets: fused order is first-occurrence
    val composed = data
      .select(col("doc_id"), explode(graft.llm.Hashing.shingles(col("text"), 3)).as("gs"))
      .select(col("doc_id"), graft.llm.Hashing.hash60(col("gs")).as("g"))
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("g"))).as("ref"))
    val fused = data
      .select(col("doc_id"), explode(ShingleHash60s(col("text"), 3)).as("g"))
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("g"))).as("fast"))
    val mismatches = fused.join(composed, "doc_id")
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("graft_wordbigrams is callable from SQL") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_wordbigrams('a b  c') AS b")
      .as[Seq[String]].head()
    assert(got == Seq("a b", "b c"))
  }

  test("graft_minshinglehash60 is callable from SQL and matches the Column form") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_minshinglehash60('the quick brown fox', 8) AS f")
      .as[Long].head()
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(MinShingleHash60($"t", 8)).as[Long].head()
    assert(viaSql == viaCol)
    // n must be constant — the expression bakes it into generated code
    intercept[Exception] {
      spark.sql("SELECT graft_minshinglehash60('abc', CAST(id AS INT)) FROM range(3)")
        .collect()
    }
  }

  test("graft_minhashsig / graft_shinglehash60s / graft_signlshbuckets are callable from SQL") {
    GraftFunctions.register(spark)
    // each matches its Column form on the same input
    val sigSql = spark.sql("SELECT graft_minhashsig('the quick brown fox', 5, 16) AS s")
      .as[Seq[Long]].head()
    val sigCol = Seq("the quick brown fox").toDF("t")
      .select(MinHashSig($"t", 5, 16).as("s")).as[Seq[Long]].head()
    assert(sigSql == sigCol)
    val gsSql = spark.sql("SELECT graft_shinglehash60s('abcabc', 3) AS g")
      .as[Seq[Long]].head()
    val gsCol = Seq("abcabc").toDF("t")
      .select(ShingleHash60s($"t", 3).as("g")).as[Seq[Long]].head()
    assert(gsSql == gsCol && gsSql.length == 3) // abc, bca, cab distinct; dup abc dropped
    val lshSql = spark.sql(
      "SELECT graft_signlshbuckets(CAST(array(1.0, -2.0, 3.0) AS ARRAY<FLOAT>), 8, 4) AS b")
      .as[Seq[Int]].head()
    val lshCol = Seq(Array(1.0f, -2.0f, 3.0f)).toDF("v")
      .select(SignLshBuckets($"v", 8, 4).as("b")).as[Seq[Int]].head()
    assert(lshSql == lshCol && lshSql.length == 8)
    // int parameters bake into generated code — non-constant must fail
    intercept[Exception] {
      spark.sql("SELECT graft_minhashsig('abc', CAST(id AS INT), 4) FROM range(3)").collect()
    }
  }

  test("graft_simhashsig is callable from SQL and matches the Column form") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_simhashsig('the cat sat', 32) AS s").as[Long].head()
    val viaCol = Seq("the cat sat").toDF("t")
      .select(SimHashSig($"t", 32).as("s")).as[Long].head()
    assert(viaSql == viaCol && viaSql >= 0L && viaSql < (1L << 32))
    // token-less input yields the -1 sentinel
    assert(spark.sql("SELECT graft_simhashsig('   ', 32) AS s").as[Long].head() == -1L)
  }

  test("graft_tokenstats / graft_termcounts are callable from SQL") {
    GraftFunctions.register(spark)
    val st = spark.sql(
      "SELECT s.* FROM (SELECT graft_tokenstats('the cat the mat') AS s)").head()
    assert(st.getInt(0) == 4 && st.getInt(1) == 3 && st.getInt(2) == 2 &&
      st.getLong(3) == 12L && st.getInt(4) == 12)
    val tc = spark.sql(
      "SELECT inline(graft_termcounts('b a b'))").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tc == Seq(("b", 2L), ("a", 1L)))
  }

  test("graft_topbigram is callable from SQL and matches the Column form") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT s.* FROM (SELECT graft_topbigram('a b a b a') AS s)").head()
    assert(viaSql.getString(0) == "a b" && viaSql.getInt(1) == 2 && viaSql.getInt(2) == 4)
    val viaCol = Seq("a b a b a").toDF("t").select(TopBigram($"t").as("s"))
      .select($"s.top_bigram", $"s.top_n", $"s.n_bigrams")
      .as[(String, Int, Int)].head()
    assert(viaCol == (("a b", 2, 4)))
    // token-less input: the ("", 0, 0) sentinel, never null
    assert(spark.sql("SELECT graft_topbigram(' ').n_bigrams AS n").as[Int].head() == 0)
  }

  test("SignLshBuckets matches a driver-side reference and stays codegen'd") {
    val nTables = 8
    val bits = 4
    def ref(v: Array[Float]): Seq[Int] =
      (0 until nTables).map { t =>
        var sig = 0
        for (b <- 0 until bits) {
          val d = (0 until math.min(64, v.length)).map { i =>
            v(i) * SignLshBuckets.planeComponent(t * bits + b, i)
          }.sum
          if (d >= 0) sig |= (1 << b)
        }
        sig
      }
    val vecs = (0 until 50).map(i => Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    val got = vecs.toDF("v")
      .select(SignLshBuckets($"v", nTables, bits).as("sigs"))
      .as[Seq[Int]].collect()
    assert(got.toSeq == vecs.map(v => ref(v)))
    val plan = spark.range(10)
      .select(array_repeat(col("id").cast("float"), 64).as("v"))
      .select(SignLshBuckets($"v", nTables, bits).as("sigs"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [signlshbuckets"), plan)
  }

  test("CharGini stays in whole-stage codegen") {
    val df = spark.range(100).select(CharGini(concat(lit("v"), col("id").cast("string"))).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [chargini"), plan)
    assert(df.filter($"g" > 0).count() == 100)
  }

  test("PackInt8/BinVecDot: packed dot == array dot; layout, range and length are enforced") {
    // equivalence with IntVecDot on deterministic pseudo-random int8 vectors
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(20)(Array.fill(64)(rnd.nextInt(255) - 127))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "arr")
      .withColumn("code", PackInt8($"arr"))
    val both = df.alias("a").crossJoin(df.alias("b"))
      .select(IntVecDot(col("a.arr"), col("b.arr")).as("ai"),
        BinVecDot(col("a.code"), col("b.code")).as("bi"))
    assert(both.filter($"ai" =!= $"bi").count() == 0)
    // the byte layout: one signed byte per element, coordinate order
    val hexed = Seq((1L, Seq(-127, 0, 5, 127))).toDF("id", "arr")
      .select(hex(PackInt8($"arr")).as("h")).as[String].head()
    assert(hexed == "8100057F", hexed)
    // out-of-range values must throw, not wrap into a plausible code
    // (surfaces raw when constant-folded driver-side, SparkException from
    // an executor — either way it must not succeed)
    intercept[Exception] {
      Seq((1L, Seq(200))).toDF("id", "arr").select(PackInt8($"arr")).collect()
    }
    // unequal code lengths must throw, not truncate
    intercept[Exception] {
      Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
        .select(BinVecDot(PackInt8($"a"), PackInt8($"b"))).collect()
    }
    // codegen: the packed dot runs inside a whole-stage project
    val plan = df.alias("a").crossJoin(df.alias("b"))
      .select(BinVecDot(col("a.code"), col("b.code")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("binvecdot"), plan)
  }

  test("Md5Hash60 stays in whole-stage codegen") {
    val df = spark.range(100).select(Hashing.hash60(col("id").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [md5hash60"), plan)
    assert(df.distinct().count() == 100)
  }

  test("DupGramCovered is identical to the interpreted HOF kernel") {
    // adversarial: periodic, one-dup, clean, short, unicode, space runs,
    // plus pseudo-random small-vocab docs (the repetitive regime where
    // coverage intervals overlap and chain)
    val rnd = new scala.util.Random(7)
    val docs = (Seq("", " ", "a", "a a", "a a a", "a b a b a b",
      "x y z x y z pad", "é中 文 é中 文 é中", "a  b a  b", "😀 y 😀 y",
      "one two three four five") ++
      (0 until 400).map { i =>
        val vocab = 2 + i % 7
        (0 until 3 + i % 50).map(_ => s"t${rnd.nextInt(vocab)}").mkString(" ")
      }).toDF("text")
    for (k <- Seq(2, 3, 5)) {
      val both = graft.llm.TextAnalysis.withDupCoveredHof(docs, "text", k)
        .withColumnRenamed("dup_covered", "ref")
        .select($"ref", DupGramCovered($"text", k).as("fast"))
      assert(both.filter($"fast" =!= $"ref").count() == 0, s"mismatch at k=$k")
    }
  }

  test("DupGramCovered known values, codegen residency, and SQL surface") {
    // "a b a b": grams(k=2) = [ab, ba, ab]; dup starts {1,3} cover
    // [1,2] ∪ [3,4] = 4 of 4 positions
    def cov(s: String, k: Int): Int =
      Seq(s).toDF("text").select(DupGramCovered($"text", k).as("c")).as[Int].head()
    assert(cov("a b a b", 2) == 4)
    // overlap chaining: "x x x" grams(k=2) = [xx, xx], starts {1,2} →
    // [1,2] ∪ [2,3] = 3
    assert(cov("x x x", 2) == 3)
    assert(cov("a b c d", 2) == 0)
    assert(cov("a b", 3) == 0) // shorter than k → no gram
    val df = spark.range(100)
      .select(DupGramCovered(concat(lit("p q p q r"), col("id").cast("string")), 2).as("c"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [dupgramcovered"),
      df.queryExecution.executedPlan.toString)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dupgramcovered('a b a b', 2) AS c").as[Int].head() == 4)
  }
}
