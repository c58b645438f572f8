package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for the LLM-pipeline operators.
  *
  * All dedup/fingerprint operators hash through MD5 (a published, exact
  * spec both Spark and DuckDB implement identically) truncated to 60 bits,
  * rather than engine-private hash functions (Spark's xxhash64 and DuckDB's
  * hash() disagree by design). This is what makes MinHash/SimHash results
  * *oracle-checkable* — and, at scale, what makes signatures stable across
  * engine versions and cluster re-shards.
  */
object Hashing {

  /** 60-bit hash of a string column: first 15 hex digits of md5, as long.
    * Computed by the codegen'd native expression [[graft.functions.Md5Hash60]]
    * (bit-identical to `conv(substring(md5(x),1,15),16,10)` — equivalence
    * property-tested in FunctionsSpec — but without the hex-string and
    * base-conversion allocations in the per-shingle hot loop).
    */
  def hash60(c: Column): Column = graft.functions.Md5Hash60(c)

  /** The composed-builtins form (kept for the equivalence test). */
  def hash60Reference(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB mirror of [[hash60]]. */
  def sqlHash60(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** Character shingles of width `n` (1-based positions, short tail shingles
    * at the end are dropped by construction of the position range; texts
    * shorter than `n` yield the whole text as their only shingle).
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))))

  /** DuckDB mirror of [[shingles]] (to be wrapped in SELECT DISTINCT …
    * UNNEST): `range(a,b)` is exclusive of `b` where Spark's `sequence` is
    * inclusive, hence the +1 asymmetry.
    */
  def sqlShingles(textExpr: String, n: Int): String =
    s"[substr($textExpr, x, $n) for x in range(1, greatest(length($textExpr)-${n - 2}, 2))]"

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def sqlTokens(textExpr: String): String =
    s"list_filter(string_split($textExpr, ' '), x -> x <> '')"
}
