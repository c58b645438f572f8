package graft.runtime

import org.apache.spark.SparkFiles
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** Side-file / distributed-cache API (SURVEY.md §2B #24) — the named engine
  * surface for the reference's `CacheFiles`/`Files` job options
  * (/root/reference/runner.go:57-58) and the `#link` cache-file shipping it
  * configures (/root/reference/hdfs/job.go:90-100). Two shapes:
  *
  *  - [[broadcastMap]]: the dominant use — a small key→value lookup shipped
  *    once per executor and dereferenced inside the mapper (zero fact-side
  *    movement; THE small-dim join strategy at 100 TB). The size guard is
  *    built in and bounded: the collect job itself is `limit(max + 1)`, so
  *    an over-sized side table fails fast without an extra count job and
  *    without the driver ever holding more than `max + 1` rows.
  *  - [[shipFile]] / [[localPath]]: literal file parity — ship any file to
  *    every executor's work dir (Spark's native distributed cache) and
  *    resolve it task-side by name, like reading a cache-file symlink.
  */
object SideData {

  /** Collect a small two-column dataset into a broadcast lookup map.
    * Fails (before broadcasting) if the dataset exceeds `maxRows`.
    */
  def broadcastMap[K, V](ds: Dataset[(K, V)], maxRows: Int = 10000000): Broadcast[Map[K, V]] = {
    require(maxRows > 0 && maxRows < Int.MaxValue, s"maxRows out of range: $maxRows")
    val rows = ds.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"side table exceeds the $maxRows-row distributed-cache bound — " +
        "use a broadcast/shuffle join instead of the side-data pattern")
    ds.sparkSession.sparkContext.broadcast(rows.toMap)
  }

  /** Ship a local or HDFS file to every executor (≙ `CacheFiles`). Returns
    * the task-side name to pass to [[localPath]].
    */
  def shipFile(s: SparkSession, path: String): String = {
    s.sparkContext.addFile(path)
    path.split('/').last
  }

  /** Task-side (or driver-side, in local mode) path of a shipped file. */
  def localPath(name: String): String = SparkFiles.get(name)
}
