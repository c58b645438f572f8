package graft.mr

/** Serialized key/value record — the engine's analogue of the reference's
  * internal `key \t value` wire format, split on the FIRST tab
  * (/root/reference/mrproto/protocol.go:94, notes.txt:9-12). Key and value
  * are JSON-encoded strings; grouping compares the *serialized* key, exactly
  * like the reference's `bytes.Equal` on consecutive sorted lines
  * (/root/reference/mrproto/protocol.go:101) — so `10` and `"10"` are
  * different keys, and composite keys like `["b","c"]` group by their
  * serialized form (/root/reference/mrproto/protocol_test.go:34-40).
  */
final case class KV(key: String, value: String)

object KV {
  def toLine(kv: KV): String = kv.key + "\t" + kv.value

  /** First-tab split; None for tab-less lines (the reference counts these as
    * `invalid line - no tab` and continues,
    * /root/reference/mrproto/protocol.go:96-100).
    */
  def fromLine(line: String): Option[KV] = {
    val i = line.indexOf('\t')
    if (i < 0) None else Some(KV(line.substring(0, i), line.substring(i + 1)))
  }
}

/** One MapReduce step — the engine's port of the reference's `Step`
  * interfaces (/root/reference/map_reduce_step.go:7-25):
  *
  *  - `mapper`: optional per-split transform, 0..n KV outputs per input
  *    line (`Mapper(io.Reader, io.Writer)`); None = identity pass-through
  *    (/root/reference/runner.go:281-287), in which case input lines must
  *    already be in `k \t v` form.
  *  - `reducer`: required per-key aggregation over grouped values
  *    (`Reducer`, the only required method).
  *  - `combiner`: optional map-side partial aggregation (`Combiner`,
  *    attached only when implemented, /root/reference/runner.go:188-190).
  *  - `reducerTasks`: per-step parallelism override
  *    (`StepReducerTasksCount`, /root/reference/map_reduce_step.go:19-21).
  *
  * Functions receive a [[Counters]] handle — the reference's reporter
  * channel (/root/reference/reporter.go:12-21).
  */
trait MrStep extends Serializable {
  def mapper: Option[(Iterator[String], Counters) => Iterator[KV]] = None
  def reducer(key: String, values: Iterator[String], counters: Counters): Iterator[KV]
  def combiner: Option[(String, Iterator[String], Counters) => Iterator[String]] = None
  def reducerTasks: Option[Int] = None

  /** Secondary sort: when true, a key's values arrive byte-ordered — the
    * semantics of the reference's in-process harness, which sorts whole
    * `key\tvalue` lines (/root/reference/mrtest/testing.go:23,26-53).
    * Default false = Hadoop's key-only sort (value order undefined), which
    * is what the reference's production runtime provides (notes.txt:9-12).
    */
  def sortValues: Boolean = false

  /** Per-step engine properties — the reference's `-D k=v` passthrough
    * (`Properties map[string]string`, /root/reference/runner.go:59, applied
    * as Hadoop -D flags at /root/reference/hdfs/job.go:59-70). Applied to
    * the session conf while THIS step's plan is built (so build-time reads
    * like `spark.sql.shuffle.partitions` take effect) and restored after.
    */
  def properties: Map[String, String] = Map.empty

  /** Copy of this step with a different parallelism, forwarding EVERY other
    * member — the one sanctioned way to re-wrap a step (ad-hoc anonymous
    * wrappers silently drop members added later, which is exactly how
    * `sortValues` once got lost under a job-wide `reducerTasks`).
    */
  final def withReducerTasks(n: Int): MrStep = {
    val self = this
    new MrStep {
      override def mapper = self.mapper
      override def reducer(k: String, vs: Iterator[String], c: Counters) =
        self.reducer(k, vs, c)
      override def combiner = self.combiner
      override def reducerTasks: Option[Int] = Some(n)
      override def sortValues: Boolean = self.sortValues
      override def properties: Map[String, String] = self.properties
    }
  }
}
