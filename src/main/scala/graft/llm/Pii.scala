package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection and redaction — the scrubbing pass every training-data
  * pipeline runs before anything else ships: find emails, North-American
  * phone numbers, and IPv4 addresses, count them per document, and
  * replace each with a typed placeholder.
  *
  * Scale shape: pure per-row regex work — shuffle-free, embarrassingly
  * parallel, and entirely inside whole-stage codegen (Spark's
  * `RegExpReplace`/`RegExpCount` are codegen'd expressions with a cached
  * compiled pattern per task). At 100 TB this is a single map pass whose
  * cost is the scan itself; column pruning keeps the read to
  * (doc_id, text).
  *
  * Engine-exactness: the three patterns use only syntax with identical
  * semantics in java.util.regex and RE2 (character classes, bounded
  * repetition, `\b`, `\d` — no backreferences, no lookaround), so the
  * DuckDB oracle replays detection AND redaction byte-for-byte.
  *
  * The synthetic corpus contains no organic PII (word-salad text), so the
  * oracle-gated query [[piiRedact]] PLANTS deterministic PII derived from
  * `doc_id` — same arithmetic in both engines, the m02 planted-pair
  * pattern — and then detects/redacts it. The operator surface
  * ([[countPii]] / [[redactPii]]) takes any text column.
  */
object Pii {

  /** RFC-ish email: local part, @, dotted domain, ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: ddd-ddd-dddd on word boundaries. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 on word boundaries. */
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-category match counts over `text` (email, phone, ipv4). */
  def countPii(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
      regexp_count(text, lit(PhoneRe)),
      regexp_count(text, lit(IpRe)))

  /** Replace every match with a typed placeholder. Email first: once
    * emails collapse to `<EMAIL>` the digit-run patterns can no longer
    * partially match inside a local part, so the chain order is the only
    * correct one — and the oracle replays the same order.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  /** SQL twin of the planted-text expression used by [[piiRedact]]:
    * ~1/7 of docs get an email, ~1/11 a phone, ~1/13 an IPv4, all
    * deterministic functions of doc_id (integer % only).
    */
  private[graft] def plantSql: String =
    """text
      |  || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
      |       || '@mail.example.com for details' ELSE '' END
      |  || CASE WHEN doc_id % 11 = 0 THEN ' or call 555-'
      |       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
      |       || lpad(CAST(doc_id * 3 % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |  || CASE WHEN doc_id % 13 = 0 THEN ' from host 10.'
      |       || CAST(doc_id % 256 AS VARCHAR) || '.'
      |       || CAST(doc_id * 3 % 256 AS VARCHAR) || '.'
      |       || CAST(doc_id * 7 % 256 AS VARCHAR) ELSE '' END""".stripMargin

  private[graft] def plantCol: Column = concat(
    col("text"),
    when(col("doc_id") % 7 === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com for details"))).otherwise(lit("")),
    when(col("doc_id") % 11 === 0,
      concat(lit(" or call 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") * 3 % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
    when(col("doc_id") % 13 === 0,
      concat(lit(" from host 10."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") * 3 % 256).cast("string"), lit("."),
        (col("doc_id") * 7 % 256).cast("string"))).otherwise(lit("")))

  /** The t13 gate: plant → count → redact, every doc in, every doc out
    * (zero-count docs prove the scrub is a no-op on clean text).
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val (ne, np, ni) = countPii(col("ptext"))
    Tables.documents(s, dir)
      .select(col("doc_id"), plantCol.as("ptext"))
      .select(col("doc_id"),
        ne.cast("int").as("n_emails"),
        np.cast("int").as("n_phones"),
        ni.cast("int").as("n_ips"),
        redactPii(col("ptext")).as("redacted"))
  }

  // plantSql is spliced AFTER stripMargin — its own `||` lines would be
  // eaten as margin characters if the outer template stripped them
  val piiRedactSql: String =
    s"""WITH p AS (SELECT doc_id, __PLANT__ AS ptext FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(ptext, '$EmailRe')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(ptext, '$PhoneRe')) AS INT) AS n_phones,
       |  CAST(len(regexp_extract_all(ptext, '$IpRe')) AS INT) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(ptext,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g'),
       |    '$IpRe', '<IP>', 'g') AS redacted
       |FROM p""".stripMargin.replace("__PLANT__", plantSql)
}
