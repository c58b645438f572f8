package graft.mr

import org.apache.spark.SparkContext
import org.apache.spark.util.AccumulatorV2
import scala.collection.mutable

/** Distributed counter plane — the engine's analogue of Hadoop counters as
  * used by the reference (`reporter:counter:<group>,<counter>,<amount>` on
  * stderr, /root/reference/reporter.go:12-15; incremented from protocol code
  * e.g. /root/reference/mrproto/protocol.go:33).
  *
  * A single map-valued accumulator supports dynamically-named counters from
  * executor code (the reference allows any group/name at any time), merges
  * associatively across tasks, and reports on the driver — the same
  * many-tasks→one-view contract Hadoop's counter channel provides.
  */
final class CounterAccumulator
    extends AccumulatorV2[(String, Long), Map[String, Long]] {
  private val map = mutable.HashMap.empty[String, Long]

  override def isZero: Boolean = synchronized(map.isEmpty)
  override def copy(): CounterAccumulator = synchronized {
    val c = new CounterAccumulator
    c.map ++= map
    c
  }
  override def reset(): Unit = synchronized(map.clear())
  override def add(v: (String, Long)): Unit = synchronized {
    map.update(v._1, map.getOrElse(v._1, 0L) + v._2)
  }
  override def merge(other: AccumulatorV2[(String, Long), Map[String, Long]]): Unit =
    other.value.foreach(add)
  override def value: Map[String, Long] = synchronized(map.toMap)
}

/** Serializable handle usable from both driver and executor closures. */
final class Counters(private val acc: CounterAccumulator) extends Serializable {

  /** Equivalent of `Counter(group, counter, amount)` (/root/reference/reporter.go:12). */
  def inc(group: String, counter: String, amount: Long = 1L): Unit =
    acc.add(s"$group,$counter" -> amount)

  /** Driver-side view after an action has run. */
  def value: Map[String, Long] = acc.value

  def get(group: String, counter: String): Long =
    acc.value.getOrElse(s"$group,$counter", 0L)
}

object Counters {
  def create(sc: SparkContext, name: String = "graft.counters"): Counters = {
    val acc = new CounterAccumulator
    sc.register(acc, name)
    new Counters(acc)
  }
}
