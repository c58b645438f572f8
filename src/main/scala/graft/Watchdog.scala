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
  * On timeout the watchdog cancels the group AND its future jobs
  * (interrupting running tasks, and voiding any jobs a later-waking
  * zombie thread would submit), then interrupts the thread. A plan that
  * hangs DRIVER-side in a non-interruptible spin (the d37 optimizer
  * class) can still hold one core until process exit — the price of
  * completing the other queries; its Spark jobs can never run. Queries
  * run sequentially, so at most one zombie per pathological query.
  */
object Watchdog {

  sealed trait Result
  case object Ok extends Result
  case object TimedOut extends Result
  final case class Failed(e: Throwable) extends Result

  /** Env-var override for a timeout, in seconds. A malformed value falls
    * back to the default with a warning instead of throwing — a crash in
    * the harness main before any query runs would void the whole
    * artifact, the exact failure class this object exists to prevent.
    */
  def secs(envVar: String, default: Int): Int =
    sys.env.get(envVar) match {
      case None => default
      case Some(v) => v.trim.toIntOption match {
        case Some(n) if n > 0 => n
        case _ =>
          System.err.println(
            s"[watchdog] ignoring malformed $envVar='$v' (want positive seconds); using $default")
          default
      }
    }

  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def run(spark: SparkSession, label: String, timeoutSec: Int)(body: => Unit): Result = {
    val sc = spark.sparkContext
    // unique group per RUN: cancelJobGroupAndFutureJobs poisons the group
    // NAME forever, and the bench reuses a label across its min-of-2 runs
    // — a transient first-run timeout must not auto-cancel the retry
    val group = s"$label#${runSeq.incrementAndGet()}"
    @volatile var outcome: Result = TimedOut
    val latch = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try {
        sc.setJobGroup(group, label, interruptOnCancel = true)
        try { body; outcome = Ok }
        finally sc.clearJobGroup()
      } catch { case e: Throwable => outcome = Failed(e) }
      finally latch.countDown()
    }, s"watchdog-$group")
    t.setDaemon(true)
    t.start()
    if (!latch.await(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)) {
      // ...AndFutureJobs: a DRIVER-side hang has no job yet — if the
      // zombie thread later wakes and submits its pipeline, a plain
      // one-shot cancel would let those jobs RUN concurrently with the
      // next measured query and silently inflate its number
      sc.cancelJobGroupAndFutureJobs(group)
      // interrupt unblocks most driver-side waits (sleep/IO/monitor);
      // a truly-spinning optimizer thread ignores it, which is the
      // documented residual cost
      t.interrupt()
      // give interrupted tasks a moment to unwind into Failed; if the
      // hang is driver-side the thread never finishes and we report the
      // timeout as-is
      latch.await(5, java.util.concurrent.TimeUnit.SECONDS)
      if (outcome == Ok) Ok else TimedOut
    } else outcome
  }
}
