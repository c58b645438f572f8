package graft

import org.apache.spark.sql.SparkSession

/** Per-query watchdog for the harness mains ([[Verify]] / [[Bench]]):
  * runs one query's action on a dedicated thread under a wall-clock
  * bound; on expiry it cancels the query's Spark job group and the
  * harness moves on to the next query.
  *
  * Why it exists: in round 11 a single pathological plan (the d37
  * pushdown-inlined filter) hung the shared JVM and voided the ENTIRE
  * round's correctness and bench artifacts — 113 queries of signal lost
  * to one bug. The reference engine's own protocol posture is
  * skip-bad-and-count (reference mrproto/protocol.go:32-35: malformed
  * records are counted and skipped, never allowed to kill the job);
  * this applies the same rule one level up, to queries.
  *
  * Mechanics: the action runs on a fresh daemon thread that first
  * installs a job group with `interruptOnCancel = true` (job-group state
  * is thread-local, so the group binds to exactly this query's jobs).
  * On timeout the watchdog cancels the group — which interrupts running
  * tasks — and abandons the thread. A plan that hangs DRIVER-side (in
  * the optimizer or codegen, like d37 did) has no job to cancel; the
  * abandoned daemon thread keeps one core busy until process exit, which
  * is the price of completing the other queries. Queries run
  * sequentially, so at most one zombie per pathological query.
  */
object Watchdog {

  sealed trait Result
  case object Ok extends Result
  case object TimedOut extends Result
  final case class Failed(e: Throwable) extends Result

  /** Env-var override for a timeout, in seconds. */
  def secs(envVar: String, default: Int): Int =
    sys.env.get(envVar).map(_.toInt).getOrElse(default)

  def run(spark: SparkSession, group: String, timeoutSec: Int)(body: => Unit): Result = {
    val sc = spark.sparkContext
    @volatile var outcome: Result = TimedOut
    val latch = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try {
        sc.setJobGroup(group, group, interruptOnCancel = true)
        try { body; outcome = Ok }
        finally sc.clearJobGroup()
      } catch { case e: Throwable => outcome = Failed(e) }
      finally latch.countDown()
    }, s"watchdog-$group")
    t.setDaemon(true)
    t.start()
    if (!latch.await(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)) {
      sc.cancelJobGroup(group)
      // give interrupted tasks a moment to unwind into Failed; if the
      // hang is driver-side the thread never finishes and we report the
      // timeout as-is
      latch.await(5, java.util.concurrent.TimeUnit.SECONDS)
      if (outcome == Ok) Ok else TimedOut
    } else outcome
  }
}
