package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.mr.Counters

/** Input sources (SURVEY.md §2B #11-14).
  *
  * The reference reads newline-delimited byte records with a 2 MiB buffer
  * (/root/reference/mrproto/protocol.go:46-69) and JSON-per-line with
  * skip-and-count on malformed input (:17-42); input paths may be globs on
  * any Hadoop scheme incl. *.gz (/root/reference/runner.go:51-52,
  * hdfs/job.go:27-43). Spark's readers subsume the byte plumbing
  * (vectorized, codec-transparent, glob/scheme-native); what we add is the
  * reference's lenient-ingestion contract: malformed records are counted
  * and dropped, never fatal.
  */
object Sources {

  /** Text-line source (#11): one string per line; globs, every Hadoop
    * scheme, and compressed files (#13, #14) come free from the reader.
    */
  def textLines(s: SparkSession, path: String): Dataset[String] = {
    import s.implicits._
    s.read.textFile(path)
  }

  /** JSON-lines source (#12): schema-on-read with PERMISSIVE mode; rows
    * whose JSON fails to parse land in `_corrupt_record`, are counted into
    * `counters("unknown", "invalid line")` — the reference's counter name
    * (/root/reference/mrproto/protocol.go:33) — and dropped.
    *
    * The count happens inside the returned plan (an accumulator bump in a
    * filter), so it aggregates across executors without a second scan.
    */
  def jsonLines(
      s: SparkSession,
      path: String,
      counters: Counters): DataFrame = {
    // schema inference over the clean subset (Spark 4 forbids filtering a
    // raw JSON read on its corrupt-record column alone, and caching the
    // whole input as the suggested workaround is a non-starter at scale);
    // the data pass itself goes text → from_json, one scan, no cache.
    val schema = s.read.option("mode", "DROPMALFORMED").json(path).schema
    jsonLinesFrom(s.read.textFile(path), schema, counters)
  }

  /** JSON-lines over an existing Dataset[String] (e.g. a column extracted
    * upstream), same lenient contract but without schema inference cost:
    * caller provides the schema.
    */
  def jsonLinesFrom(
      lines: Dataset[String],
      schema: org.apache.spark.sql.types.StructType,
      counters: Counters): DataFrame = {
    // PERMISSIVE from_json yields a struct of nulls for garbage — only a
    // corrupt-record field in the parse schema distinguishes "all fields
    // null" from "line did not parse".
    val corrupt = "_corrupt_record"
    val parseSchema = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val withParsed = lines.withColumn("_parsed",
      from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
    // asNondeterministic pins evaluation (the optimizer may otherwise elide
    // or duplicate a "deterministic" UDF). Counter semantics are
    // AT-LEAST-ONCE, like the reference's Hadoop counters under task retry:
    // Spark only guarantees exactly-once accumulator updates inside actions,
    // so retries/speculation/re-execution of this transformation can
    // over-count. Exact invalid-line counts, when needed, come from an
    // aggregate over the corrupt column instead.
    val keep = udf { (ok: Boolean) =>
      if (!ok) counters.inc("unknown", "invalid line")
      ok
    }.asNondeterministic()
    withParsed
      .filter(keep(col(s"_parsed.$corrupt").isNull))
      .select(col("_parsed.*"))
      .drop(corrupt)
  }
}
