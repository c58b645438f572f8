package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end runner parity: input glob → steps → gzip'd part-* output +
  * counters — the whole gomrjob user journey in one call.
  */
class MrRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("MrTest harness reproduces the reference's golden example") {
    // the exact fixture of /root/reference/example/example_mr_test.go:14-31
    val r = MrTest.testStep(spark, new BuiltinSteps.FieldFrequencyStep(),
      input = Seq(
        """{"key_field":"z"}""", """{"key_field":"a"}""", """{"key_field":"another"}""",
        """{"key_field":"z"}""", """{"key_field":"z"}""", """{"another_key":"a"}"""),
      golden = Seq("\"another_key\"\t1", "\"key_field\"\t5", "\"lines_read\"\t6"))
    assert(r.passed, r.diff.mkString("\n"))
    val bad = MrTest.testStep(spark, BuiltinSteps.Sum,
      input = Seq("k\t1"), golden = Seq("k\t2"))
    assert(!bad.passed && bad.diff.nonEmpty)
  }

  test("KV sink encodes composite array keys like encoding/json") {
    // parity with /root/reference/mrproto/protocol_test.go:27-42
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kv-arr").toString + "/out"
    val df = Seq((Seq("b", "c"), 1L)).toDF("k", "v")
    graft.sources.KvSink.writeKvLines(df, "k", "v", dir)
    val back = graft.sources.KvSink.readKvLines(spark, dir).collect()
    assert(back.toSeq == Seq("[\"b\",\"c\"]\t1"))
  }

  test("MrRunner reads gzipped input globs transparently") {
    val in = Files.createTempDirectory("graft-gz-in")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(in.resolve("part1.json.gz")))
    gz.write(Seq("""{"key_field":"z"}""", """{"key_field":"z"}""").mkString("\n").getBytes)
    gz.close()
    val (outPath, _) = MrRunner(
      name = "gz-input",
      inputFiles = Seq(s"$in/*.json.gz"),
      steps = Seq(new BuiltinSteps.FieldFrequencyStep())).run(spark)
    val lines = graft.sources.KvSink.readKvLines(spark, outPath).collect().sorted
    assert(lines.toSeq == Seq("\"key_field\"\t2", "\"lines_read\"\t2"))
  }

  test("keys containing tabs and newlines survive the wire format") {
    // JSON string escaping keeps the k\tv line format unambiguous even for
    // keys with raw tabs/newlines (encoding/json parity,
    // /root/reference/mrproto/protocol.go:233-239)
    val input = Seq("{\"a\\tb\":1}", "{\"c\\nd\":1}", "{\"a\\tb\":2}")
    val r = MrTest.testStep(spark, new BuiltinSteps.FieldFrequencyStep(),
      input = input,
      golden = Seq("\"a\\tb\"\t2", "\"c\\nd\"\t1", "\"lines_read\"\t3"))
    assert(r.passed, r.diff.mkString("\n"))
  }

  test("job-wide reducerTasks preserves a step's sortValues (secondary sort)") {
    // regression: the old anonymous re-wrap dropped sortValues, so a
    // secondary-sort reducer saw undefined value order under a job-wide
    // parallelism override
    val in = Files.createTempDirectory("graft-secsort-in")
    Files.write(in.resolve("part1.txt"),
      Seq("k\tc", "k\ta", "k\tb", "j\t2", "j\t10", "j\t1").mkString("\n").getBytes)
    val step = new MrStep {
      override val sortValues: Boolean = true
      override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
        Iterator.single(KV(key, values.mkString("|")))
    }
    val (outPath, _) = MrRunner(
      name = "secsort-parallel",
      inputFiles = Seq(s"$in/part*.txt"),
      steps = Seq(step),
      reducerTasks = Some(3)).run(spark)
    val lines = graft.sources.KvSink.readKvLines(spark, outPath).collect().sorted
    assert(lines.toSeq == Seq("j\t1|10|2", "k\ta|b|c"))
  }

  test("withReducerTasks forwards every member of the original step") {
    val base = new MrStep {
      override val mapper = Some((it: Iterator[String], c: Counters) =>
        it.flatMap(KV.fromLine))
      override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
        Iterator.single(KV(key, values.size.toString))
      override val combiner =
        Some((k: String, vs: Iterator[String], c: Counters) => Iterator.single(vs.mkString(",")))
      override val sortValues: Boolean = true
      override def properties: Map[String, String] = Map("spark.graft.flag" -> "on")
    }
    val copied = base.withReducerTasks(7)
    assert(copied.reducerTasks.contains(7))
    assert(copied.sortValues)
    assert(copied.mapper.isDefined && copied.combiner.isDefined)
    assert(copied.properties == Map("spark.graft.flag" -> "on"))
  }

  test("MrRunner runs the flagship job from files to compressed output") {
    val in = Files.createTempDirectory("graft-run-in")
    Files.write(in.resolve("part1.json"),
      Seq("""{"key_field":"z"}""", """{"key_field":"a"}""", "garbage").mkString("\n").getBytes)
    Files.write(in.resolve("part2.json"),
      Seq("""{"key_field":"z"}""", """{"another_key":"a"}""").mkString("\n").getBytes)
    val outBase = Files.createTempDirectory("graft-run-out").toString

    val (outPath, counters) = MrRunner(
      name = "field-freq-e2e",
      inputFiles = Seq(s"$in/part*.json"),
      steps = Seq(new BuiltinSteps.FieldFrequencyStep()),
      output = Some(s"$outBase/result"),
      compressOutput = true,
      reducerTasks = Some(2)).run(spark)

    val files = new java.io.File(outPath).listFiles().map(_.getName)
    assert(files.count(_.startsWith("part-")) == 2)     // ReducerTasks parity
    assert(files.filter(_.startsWith("part-")).forall(_.endsWith(".gz")))
    val lines = graft.sources.KvSink.readKvLines(spark, outPath).collect().sorted
    assert(lines.toSeq == Seq(
      "\"another_key\"\t1", "\"key_field\"\t3", "\"lines_read\"\t4"))
    assert(counters.get("example", "invalid line") == 1) // the garbage row
  }
}
