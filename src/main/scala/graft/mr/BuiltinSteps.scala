package graft.mr

/** Built-in steps and the flagship example job, ported by capability from
  * the reference (not by code).
  */
object BuiltinSteps {

  /** Lenient int64 sum of a group — the reference's only built-in reducer
    * (`mrproto.Sum`, /root/reference/mrproto/protocol.go:339-356): values
    * coerce with `.Int64()`; non-integral values are counted and skipped,
    * never fatal.
    */
  def lenientSum(values: Iterator[String], counters: Counters): Long = {
    var acc = 0L
    values.foreach { v =>
      Json.asLong(v) match {
        case Some(n) => acc += n
        case None    => counters.inc("unknown", "invalid value")
      }
    }
    acc
  }

  /** `Sum` as a step: key → sum(int64(values)). Declares itself as its own
    * combiner — summing partials is associative, the combiner law the
    * reference never property-tested (TODO at
    * /root/reference/mrtest/testing.go:56).
    */
  object Sum extends MrStep {
    override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
      Iterator.single(KV(key, lenientSum(values, c).toString))
    override val combiner: Option[(String, Iterator[String], Counters) => Iterator[String]] =
      Some((_, values, c) => Iterator.single(lenientSum(values, c).toString))
  }

  /** Flagship job (SURVEY.md §2C #33): for each JSON input record, emit each
    * top-level key (JSON-quoted, as encoding/json would) plus a global
    * `lines_read`; reduce with [[Sum]]. Capability port of
    * /root/reference/example/example_mr.go:21-53 including its skip-and-count
    * handling of non-JSON lines.
    */
  class FieldFrequencyStep(override val reducerTasks: Option[Int] = None) extends MrStep {
    override val mapper: Option[(Iterator[String], Counters) => Iterator[KV]] =
      Some { (lines, c) =>
        lines.flatMap { line =>
          if (line == null || line.trim.isEmpty) Iterator.empty
          else
            Json.topLevelKeys(line) match {
              case Some(keys) =>
                keys.iterator.map(k => KV(Json.encode(k), "1")) ++
                  Iterator.single(KV("\"lines_read\"", "1"))
              case None =>
                c.inc("example", "invalid line")
                Iterator.empty
            }
        }
      }
    override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
      Sum.reducer(key, values, c)
    override val combiner: Option[(String, Iterator[String], Counters) => Iterator[String]] =
      Sum.combiner
  }

  /** Second-step histogram: input `k \t count` lines, regroup by count —
    * the agg-of-agg shape the reference chains via `Steps`
    * (/root/reference/runner.go:50,352-356).
    */
  object CountHistogramStep extends MrStep {
    override val mapper: Option[(Iterator[String], Counters) => Iterator[KV]] =
      Some { (lines, c) =>
        lines.flatMap { line =>
          KV.fromLine(line) match {
            case Some(kv) => Iterator.single(KV(kv.value, "1"))
            case None =>
              c.inc("unknown", "invalid line - no tab")
              Iterator.empty
          }
        }
      }
    override def reducer(key: String, values: Iterator[String], c: Counters): Iterator[KV] =
      Sum.reducer(key, values, c)
    override val combiner: Option[(String, Iterator[String], Counters) => Iterator[String]] =
      Sum.combiner
  }
}
