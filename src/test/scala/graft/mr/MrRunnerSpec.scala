package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end runner parity: input glob → steps → gzip'd part-* output +
  * counters — the whole gomrjob user journey in one call.
  */
class MrRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

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
