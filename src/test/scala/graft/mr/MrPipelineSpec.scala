package graft.mr

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM; Test/fork := true). */
object TestSession {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Golden tests mirroring the reference's in-process harness
  * (/root/reference/mrtest/testing.go:55-142) and its example/protocol
  * fixtures — same inputs, same expected bytes.
  */
class MrPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** The reference's flagship golden pair
    * (/root/reference/example/example_mr_test.go:14-31).
    */
  test("flagship field-frequency golden output") {
    val input = Seq(
      """{"key_field":"z"}""",
      """{"key_field":"a"}""",
      """{"key_field":"another"}""",
      """{"key_field":"z"}""",
      """{"key_field":"z"}""",
      """{"another_key":"a"}""")
    val counters = Counters.create(spark.sparkContext, "t-flagship")
    val out = MrPipeline
      .run(spark.createDataset(input), Seq(new BuiltinSteps.FieldFrequencyStep(Some(2))), counters)
      .collect()
      .sorted // byte-lexicographic, like the MR sort (mrtest/testing.go:23)
    assert(out.toSeq == Seq(
      "\"another_key\"\t1",
      "\"key_field\"\t5",
      "\"lines_read\"\t6"))
  }

  /** Invalid JSON is skipped and counted, never fatal
    * (/root/reference/mrproto/protocol.go:32-35; heartbeat fixture
    * mrproto/protocol_test.go:14-16).
    */
  test("invalid lines are skipped and counted") {
    val input = Seq(
      """{"_HEARTBEAT_":1359516282.66455, "row": 0}""",
      "not-json-data",
      "",
      """{"row":1}""")
    val counters = Counters.create(spark.sparkContext, "t-invalid")
    val out = MrPipeline
      .run(spark.createDataset(input), Seq(new BuiltinSteps.FieldFrequencyStep()), counters)
      .collect()
      .sorted
    assert(out.contains("\"lines_read\"\t2")) // heartbeat + row parse; garbage+blank skipped
    assert(out.contains("\"row\"\t2"))
    assert(out.contains("\"_HEARTBEAT_\"\t1"))
    assert(counters.get("example", "invalid line") == 1)
  }

  /** Grouping semantics from the reference's protocol test
    * (/root/reference/mrproto/protocol_test.go:44-76): empty key groups,
    * adjacent equal keys collate, distinct keys → distinct groups; tab-less
    * lines counted and dropped.
    */
  test("identity-mapper grouping: empty keys, distinct keys, tab-less lines") {
    val input = Seq("\tv1", "\tv2", "a\t1", "a\t2", "b\t3", "no-tab-line")
    val counters = Counters.create(spark.sparkContext, "t-group")
    val step = new MrStep {
      override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
        Iterator.single(KV(key, values.size.toString))
    }
    val out = MrPipeline.runStep(spark.createDataset(input), step, counters).collect().sorted
    assert(out.toSeq == Seq("\t2", "a\t2", "b\t1"))
    assert(counters.get("unknown", "invalid line - no tab") == 1)
  }

  /** Multi-step chaining: count per key, then histogram of counts —
    * the agg-of-agg shape (/root/reference/mrtest/testing.go:102-124).
    */
  test("multi-step pipeline: count then histogram") {
    val input = Seq(
      """{"a":1}""", """{"a":1}""", """{"a":1}""",
      """{"b":1}""", """{"b":1}""", """{"c":1}""")
    val counters = Counters.create(spark.sparkContext, "t-multi")
    val out = MrPipeline
      .run(
        spark.createDataset(input),
        Seq(new BuiltinSteps.FieldFrequencyStep(), BuiltinSteps.CountHistogramStep),
        counters)
      .collect()
      .sorted
    // counts: a→3, b→2, c→1, lines_read→6 ⇒ histogram: 1×1, 2×1, 3×1, 6×1
    assert(out.toSeq == Seq("1\t1", "2\t1", "3\t1", "6\t1"))
  }

  /** Combiner correctness — the law the reference left untested (TODO at
    * /root/reference/mrtest/testing.go:56): with a capacity-1 LRU (forcing
    * evictions on every key change) results must equal the no-combiner run.
    */
  test("LRU combiner with forced evictions matches no-combiner result") {
    val input = (1 to 100).map(i => s"""{"k${i % 7}":$i}""")
    val c1 = Counters.create(spark.sparkContext, "t-comb1")
    val withComb = MrPipeline
      .run(spark.createDataset(input), Seq(new BuiltinSteps.FieldFrequencyStep()), c1,
        combinerCapacity = 1)
      .collect().sorted.toSeq
    val noCombStep = new MrStep {
      override val mapper = new BuiltinSteps.FieldFrequencyStep().mapper
      override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
        BuiltinSteps.Sum.reducer(key, values, c)
      // no combiner
    }
    val c2 = Counters.create(spark.sparkContext, "t-comb2")
    val noComb = MrPipeline
      .run(spark.createDataset(input), Seq(noCombStep), c2)
      .collect().sorted.toSeq
    assert(withComb == noComb)
    assert(c1.get("graft.combiner", "lru evictions") > 0)
  }

  /** The combiner must stream on BOTH sides: high-cardinality partitions may
    * not accumulate their whole combined output before yielding (the
    * reference streams partials to stdout as the LRU evicts,
    * example/example_mr.go:25-29). We prove it by pulling one output element
    * and checking the input has barely been consumed.
    */
  test("combinePartition streams output without draining the input first") {
    val n = 100000
    var consumed = 0
    val input = Iterator.tabulate(n) { i =>
      consumed += 1
      KV(s"key-$i", "1") // every key distinct → eviction on every insert past capacity
    }
    val counters = Counters.create(spark.sparkContext, "t-stream-comb")
    val sumComb = (k: String, vs: Iterator[String], c: Counters) =>
      Iterator.single(vs.map(_.toLong).sum.toString)
    val out = MrPipeline.combinePartition(input, sumComb, counters, capacity = 4)
    val first = out.next()
    assert(first.value == "1")
    // one eviction needs capacity+1 inserts; anything near n means buffering
    assert(consumed <= 16, s"input consumed eagerly: $consumed of $n")
    assert(out.size == n - 1) // the rest still arrives, exactly once each
  }

  /** Secondary sort: with sortValues, a key's values stream byte-ordered
    * (the mrtest whole-line sort, /root/reference/mrtest/testing.go:23).
    */
  test("sortValues delivers values byte-ordered within each key") {
    val input = Seq("k\tc", "k\ta", "k\tb", "j\t2", "j\t10", "j\t1")
    val step = new MrStep {
      override val sortValues: Boolean = true
      override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
        Iterator.single(KV(key, values.mkString("|")))
    }
    val counters = Counters.create(spark.sparkContext, "t-secsort")
    val out = MrPipeline.runStep(spark.createDataset(input), step, counters).collect().sorted
    // byte order: "1" < "10" < "2" (lexicographic, like the reference sort)
    assert(out.toSeq == Seq("j\t1|10|2", "k\ta|b|c"))
  }

  /** Fail-fast: a throwing reducer fails the job (the reference's task
    * exits non-zero so Hadoop marks it failed, runner.go:299-305) —
    * data errors are lenient, CODE errors are not.
    */
  test("a throwing reducer fails the job, not silently drops data") {
    val step = new MrStep {
      override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
        throw new IllegalStateException("user reducer bug")
    }
    val counters = Counters.create(spark.sparkContext, "t-throw")
    val ex = intercept[org.apache.spark.SparkException] {
      MrPipeline.runStep(spark.createDataset(Seq("k\t1")), step, counters).collect()
    }
    assert(ex.getMessage.contains("user reducer bug") ||
      Option(ex.getCause).exists(_.getMessage.contains("user reducer bug")))
  }

  /** Lenient Sum semantics (/root/reference/mrproto/protocol.go:343-350):
    * non-integral values are skipped and counted.
    */
  test("Sum skips non-int values") {
    val input = Seq("k\t1", "k\t2", "k\t\"x\"", "k\t1.5", "k\t3")
    val counters = Counters.create(spark.sparkContext, "t-sum")
    val out = MrPipeline.runStep(spark.createDataset(input), BuiltinSteps.Sum, counters)
      .collect().toSeq
    assert(out == Seq("k\t6"))
    assert(counters.get("unknown", "invalid value") == 2)
  }
}
