package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The reference's demonstrated compositions (SURVEY.md §2C #33-37) as
  * first-class DataFrame queries over the driver star schema.
  *
  * These are the queries gomrjob users actually write by hand as
  * Mapper/Reducer pairs (/root/reference/example/example_mr.go:21-53);
  * here each is a declarative plan Catalyst can optimize (partial
  * aggregation replaces the hand-rolled LRU combiner,
  * /root/reference/example/example_mr.go:26-29).
  */
object Compositions {

  /** #33 flagship — JSON field-frequency count.
    *
    * Reference: mapper explodes each record's top-level JSON keys, reducer
    * sums (example/example_mr.go:21-53); output also carries a `lines_read`
    * total. Here: parse `events.props` (schema-on-read JSON column) to a
    * map, explode keys, count per key, union the total. The map parse +
    * explode happens inside whole-stage codegen; the two aggregates share
    * one scan at 100 TB because the union branches both prune to `props`.
    */
  def fieldFrequency(s: SparkSession, dir: String): DataFrame =
    // each record emits its top-level keys PLUS one "lines_read" token —
    // exactly the reference mapper's emission (example_mr.go:31-44) — so
    // the whole query is ONE scan + ONE map-side-combined aggregate (a
    // union of a second count(*) branch would scan the input twice).
    Tables.events(s, dir)
      .select(explode(concat(
        map_keys(from_json(col("props"), MapType(StringType, StringType))),
        array(lit("lines_read")))).as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))

  val fieldFrequencySql: String =
    """SELECT k AS key, COUNT(*) AS cnt
      |FROM (SELECT UNNEST(list_append(json_keys(props), 'lines_read')) AS k FROM events)
      |GROUP BY k""".stripMargin

  /** #35 sum-by-key — the built-in `Sum` reducer
    * (/root/reference/mrproto/protocol.go:339-356): per event_type totals.
    * Decimal accumulation keeps the result independent of partitioning.
    */
  def sumByKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(Exact.dsum(col("value"), 2).as("total_value"),
           count(lit(1)).as("n_events"))

  val sumByKeySql: String =
    s"""SELECT event_type, ${Exact.sqlSum("value", 2)} AS total_value,
       |COUNT(*) AS n_events FROM events GROUP BY event_type""".stripMargin

  /** #34 word counting with map-side combining — the reference's LRU
    * in-mapper pre-aggregation (example/example_mr.go:26-29) is Catalyst's
    * automatic partial HashAggregate; nothing to hand-roll. Empty tokens
    * (trailing separators) are filtered on both sides.
    */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  val wordCountSql: String =
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word""".stripMargin

  /** #36 multi-step pipeline (agg-of-agg): orders-per-customer histogram.
    * Reference chains two streaming jobs with a materialized tmp dir
    * (runner.go:137-151); Spark composes lazily — one DAG, no tmp I/O.
    */
  def multiStep(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))

  val multiStepSql: String =
    """SELECT n_orders, COUNT(*) AS n_customers
      |FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
      |GROUP BY n_orders""".stripMargin

  /** JSON scalar extraction with lenient numeric coercion — the `Sum`
    * reducer's skip-semantics (/root/reference/mrproto/protocol.go:343-350)
    * as a relational query: pull `$.k` from the props payload, try_cast to
    * long (non-numeric → null → excluded from the sum, counted separately),
    * aggregate per event type.
    */
  def jsonExtractSum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      // try_cast, not cast: under Spark 4's default ANSI mode a plain cast
      // THROWS on a non-numeric $.k, while the lenient contract (and the
      // TRY_CAST oracle) skips-and-counts it as null
      .select(col("event_type"),
        expr("try_cast(get_json_object(props, '$.k') AS long)").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_valid"),
        (count(lit(1)) - count(col("k"))).as("n_skipped"))

  val jsonExtractSumSql: String =
    """SELECT event_type,
      |CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_valid,
      |COUNT(*) - COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_skipped
      |FROM events GROUP BY event_type""".stripMargin

  /** Dynamic JSON via Spark 4 VariantType — the engine-native successor to
    * string-typed JSON payloads: `parse_json` once, typed `variant_get`
    * access after (binary-encoded, no re-parse per field). Semantically the
    * reference's `*simplejson.Json` record (schema-on-read), but columnar.
    * Same result contract as the string-path q42.
    */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      // try_variant_get for the same ANSI-mode reason as q42's try_cast:
      // a non-long $.k must become null (skip-and-count), not a runtime error
      .select(col("event_type"),
        expr("try_variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_valid"))

  val variantExtractSql: String =
    """SELECT event_type,
      |CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_valid
      |FROM events GROUP BY event_type""".stripMargin

  /** #37 heartbeat/garbage filtering — drop records whose props payload is
    * not a JSON object with a data key (the reference skips `_HEARTBEAT_`
    * and non-JSON lines, mrproto/protocol_test.go:14-16). Filter pushes to
    * the scan; count per type survives.
    */
  def filteredCount(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isNotNull && col("event_type") =!= "error")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  val filteredCountSql: String =
    """SELECT event_type, COUNT(*) AS cnt FROM events
      |WHERE event_type IS NOT NULL AND event_type <> 'error'
      |GROUP BY event_type""".stripMargin
}
