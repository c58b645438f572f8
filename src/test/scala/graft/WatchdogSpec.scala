package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mr.TestSession

/** The round-11 regression that voided the round: one hanging plan took
  * down the whole Verify/Bench artifact. These pin the harness posture —
  * skip-bad-and-count — for the three ways a query can go wrong: a
  * driver-side hang (the d37 class), a hung Spark job, and a plain throw.
  */
class WatchdogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("a healthy body returns Ok with its side effects applied") {
    @volatile var ran = false
    val r = Watchdog.run(spark, "wd-ok", 30) { ran = true }
    assert(r == Watchdog.Ok && ran)
  }

  test("a throwing body reports Failed with the original exception") {
    Watchdog.run(spark, "wd-throw", 30) {
      throw new IllegalStateException("boom")
    } match {
      case Watchdog.Failed(e) => assert(e.getMessage == "boom")
      case other => fail(s"expected Failed, got $other")
    }
  }

  test("a DRIVER-side hang times out without killing the session") {
    val t0 = System.nanoTime()
    val r = Watchdog.run(spark, "wd-driver-hang", 2) {
      Thread.sleep(600000) // the d37 class: never reaches a Spark job
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r == Watchdog.TimedOut)
    assert(secs < 30, s"watchdog took ${secs}s to give up")
    // the session survives for the NEXT query — the whole point
    assert(spark.range(10).count() == 10)
  }

  test("a hung Spark JOB is cancelled via its job group and the run continues") {
    import spark.implicits._
    val t0 = System.nanoTime()
    val r = Watchdog.run(spark, "wd-job-hang", 3) {
      spark.range(0, 8, 1, 8).mapPartitions { it =>
        Thread.sleep(600000); it
      }.write.format("noop").mode("overwrite").save()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r == Watchdog.TimedOut)
    assert(secs < 60, s"cancelJobGroup took ${secs}s to unwind")
    // executor threads were interrupted, not leaked behind a live job —
    // the session still schedules new work
    assert(spark.range(100).selectExpr("sum(id)").as[Long].head() == 4950L)
  }

  test("timeout env override parses and falls back") {
    assert(Watchdog.secs("GRAFT_NO_SUCH_ENV_VAR", 42) == 42)
  }

  test("Verify's loop ships a COMPLETE artifact around a hung query (the r11 done-criterion)") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val out = java.nio.file.Files.createTempDirectory("graft-verify-wd").toString
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "a_ok" -> ((s, _) => s.range(5).toDF("v")),
      "b_hangs" -> ((s, _) => {
        Thread.sleep(600000) // driver-side hang before any plan exists
        s.range(1).toDF("v")
      }),
      "c_ok" -> ((s, _) => s.range(7).toDF("v")))
    Verify.runAll(spark, "unused", out, queries, timeoutSec = 2)
    def rows(name: String): Long = spark.read.parquet(s"$out/$name").count()
    assert(rows("a_ok") == 5, "query before the hang must be dumped")
    assert(rows("c_ok") == 7, "query after the hang must be dumped — the artifact survives")
    assert(!new java.io.File(s"$out/b_hangs").exists()
      || spark.read.parquet(s"$out/b_hangs").count() == 0,
      "the hung query contributes no (or empty) output, never a partial artifact")
  }
}
