package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Scale posture: these configs are the local[N] analogues of what a
  * 1000-executor deployment would set — AQE for runtime re-planning
  * (coalescing post-shuffle partitions, skew-join splitting), a shuffle
  * partition count matched to the parallelism actually available (the
  * reference's `ReducerTasks` knob, /root/reference/runner.go:54,100),
  * and UTC session time for reproducible timestamp semantics.
  */
object GraftSession {

  /** Default parallelism: the reference defaults to 30 reducer tasks
    * (/root/reference/runner.go:100); we default to the local core count.
    */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Parsed core count with the [[Watchdog.secs]] posture: a malformed
    * SPARK_GRAFT_CPUS warns and falls back instead of throwing — a crash
    * at session build (before any query runs) voids the whole artifact,
    * the exact failure class the watchdog exists to prevent.
    */
  private def cpusInt: Int = cpus.trim.toIntOption match {
    case Some(n) if n > 0 => n
    case _ =>
      System.err.println(
        s"[graft] ignoring malformed SPARK_GRAFT_CPUS='$cpus' (want positive int); using 32")
      32
  }

  /** Default shuffle partitions = 2 × cores. Measured, not folklore: the
    * round-12 d13cand A/B at ×500 (SCALE_RESULTS_r12.jsonl) found an
    * interior minimum at exactly 2 tasks/core — 54.5 s vs 79.7 s at
    * 1×/32 and 64.8 s at 4×/128, identical outputs, zero spill — the
    * granularity that rides out stragglers without paying 4× the
    * per-partition fixed costs. AQE coalescing trims the small-stage
    * excess at runtime, so the cost of the higher default on tiny
    * queries is already handled. (The driver-contract mains pin their
    * own value and are unaffected.)
    */
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", (cpusInt * 2).toString)

  def build(master: String = s"local[$cpusInt]", appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
