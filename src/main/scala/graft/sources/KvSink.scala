package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** KV text sink (SURVEY.md §2B #15-17): the reference's output protocol
  * writes `json(key) \t json(value) \n` through a buffered writer
  * (/root/reference/mrproto/protocol.go:224-287), optionally gzip'd
  * (`CompressOutput`, /root/reference/runner.go:160-163), into a directory
  * of `part-*` files — one per reducer (/root/reference/runner.go:150).
  *
  * Spark-native form: `to_json` both sides, tab-concat, `write.text`;
  * compression is a writer option; part-file count = partition count
  * (`repartition(n)` ≙ `ReducerTasks`).
  */
object KvSink {

  /** Write `k \t v` lines; keys/values JSON-encoded like encoding/json.
    * `numFiles` mirrors the reference's reducer-task count knob; None
    * keeps the upstream partitioning (no extra shuffle).
    */
  /** JSON-encode a scalar or complex column: `to_json` only accepts
    * struct/array/map, so wrap in a 1-element array and strip the
    * brackets — exact scalar JSON encoding for any type ("a" → "\"a\"",
    * 1 → "1"), matching encoding/json's output.
    */
  def jsonScalar(c: Column): Column = {
    val j = to_json(array(c))
    j.substr(lit(2), length(j) - 2)
  }

  def writeKvLines(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      path: String,
      gzip: Boolean = false,
      numFiles: Option[Int] = None): Unit = {
    val lines = df.select(
      concat_ws("\t", jsonScalar(col(keyCol)), jsonScalar(col(valueCol))).as("value"))
    val sized = numFiles.map(lines.repartition(_)).getOrElse(lines)
    val w = sized.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).text(path)
  }

  /** Read back a KV-lines directory (`part-*` globs work, #18's cat is
    * `.show`/`.toLocalIterator` on the result).
    */
  def readKvLines(s: SparkSession, path: String): Dataset[String] = {
    import s.implicits._
    s.read.textFile(path)
  }
}
