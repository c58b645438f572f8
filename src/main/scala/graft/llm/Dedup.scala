package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Hashing._

/** Deduplication operators for training-data pipelines, designed
  * partition-first: every variant is a groupBy/join on a derived key —
  * the shape that scales linearly with executors — never a pairwise
  * comparison of the full corpus.
  *
  * Scale ladder:
  *  - exact: one hash-aggregate over the corpus (content hash as key).
  *  - MinHash+LSH: signature → band buckets → self-join within buckets
  *    only (candidate pairs ∝ actual near-dups, not n²) — the standard
  *    banding construction from Broder's MinHash and the LSH literature.
  *  - SimHash: one 64→32-bit signature per doc; near-dup candidates share
  *    signatures (or band thereof); here we emit the signature itself.
  *  - n-gram Jaccard: exact verifier via inverted-index join on shared
  *    grams; bounded to a subset because its cost is driven by gram
  *    document-frequency (a stop-gram appearing in d docs contributes
  *    d² join rows) — at 100 TB you run this only on LSH candidates.
  */
object Dedup {

  private val mh = 16 // minhash signature length
  private val bandRows = 4 // rows per LSH band → 4 bands

  /** Exact dedup by content hash: keep the smallest doc_id per distinct
    * text, report group size. One shuffle on a 128-bit key.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** MinHash signatures: 16 min-hashes over distinct 5-char shingles.
    *
    * Uses the standard two-hash construction (Kirsch–Mitzenmacher):
    * h_i(s) = (a(s) + i·b(s)) mod 2^60 with a,b independent md5-derived
    * hashes — 2 md5 computations per shingle instead of 16 (8× less hash
    * work in the scan, the dominant cost of signature generation at any
    * scale). b is masked to 56 bits so i·b can't overflow a signed 64-bit
    * int in either engine (DuckDB errors on BIGINT overflow).
    *
    * The whole signature comes from the fused codegen expression
    * [[graft.functions.MinHashSig]] (same construction, same md5-60, the
    * min is dedup-invariant): a per-document computation with ZERO data
    * movement — the composed explode → 16-way min-aggregate form it
    * replaces shuffled ~one row per corpus character into an aggregate.
    */
  private val h60Mask = (1L << 60) - 1
  private val b56Mask = (1L << 56) - 1

  private def minhashesSqlK(k: Int): String =
    s"""SELECT doc_id, ${(0 until k)
         .map(i => s"min((a + $i * b) & $h60Mask) AS h$i")
         .mkString(", ")}
       |FROM (SELECT doc_id, ${sqlHash60("s")} AS a,
       |        ${sqlHash60("'#'||s")} & $b56Mask AS b
       |  FROM (SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(${sqlShingles("text", 5)}) AS s FROM documents)))
       |GROUP BY doc_id""".stripMargin

  private def minhashesSql: String = minhashesSqlK(mh)

  /** MinHash + LSH near-dup pairs: band the 16-hash signature into 4 bands
    * of 4; docs sharing any full band become candidates; report estimated
    * Jaccard = fraction of matching minhashes. The self-join keys on
    * (band, signature) — bucket sizes stay tiny, so the join output is
    * proportional to real near-duplicates at any corpus size.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables.documents(s, dir)
      .select(col("doc_id"), graft.functions.MinHashSig(col("text"), 5, mh).as("sig"))
    val bandCols = (0 until mh / bandRows).map { b =>
      concat_ws(":", (0 until bandRows).map(j =>
        element_at(col("sig"), b * bandRows + j + 1)): _*)
    }
    // The full signature rides along through the band explode (128 bytes
    // per row), so est_jaccard is computed directly on the joined rows —
    // no second/third join back to the signatures. The shuffle_hash hint
    // matters twice over: broadcasting `bands` (4 rows per corpus doc)
    // cannot scale — it only looks broadcastable on test data — and the
    // shuffle form gives both sides IDENTICAL exchanges, which Spark
    // dedups via ReusedExchange: one corpus scan, one signature pass.
    val bands = sig
      .select(col("doc_id"), col("sig"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bsig")
      .hint("shuffle_hash")
    val a = bands.alias("a")
    val b = bands.alias("b")
    val matches: Column = (0 until mh)
      .map(i => when(element_at(col("a.sig"), i + 1) === element_at(col("b.sig"), i + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    a
      .join(b, col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        (matches.cast("double") / lit(mh.toDouble)).as("est_jaccard"))
      .distinct()
  }

  val minhashLshSql: String = {
    val bandSelects = (0 until mh / bandRows).map { b =>
      val sig = (0 until bandRows).map(j => s"h${b * bandRows + j}").mkString("||':'||")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString(" UNION ALL ")
    val matchSum = (0 until mh)
      .map(i => s"(CASE WHEN ma.h$i = mb.h$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH mh AS (${minhashesSql}),
       |bands AS ($bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
       |SELECT p.a_id, p.b_id, CAST($matchSum AS DOUBLE) / 16.0 AS est_jaccard
       |FROM pairs p
       |JOIN mh ma ON ma.doc_id = p.a_id
       |JOIN mh mb ON mb.doc_id = p.b_id""".stripMargin
  }

  /** SimHash (32-bit) over whitespace tokens: per-bit weighted majority
    * vote of token hashes, computed per ROW by the fused codegen
    * expression [[graft.functions.SimHashSig]] — a pure scan, zero data
    * movement. The composed form (explode every token → 32-conditional-sum
    * hash-aggregate) shuffled one row per corpus token for a per-document
    * statistic; token-less documents, absent from that aggregate, are
    * mirrored here by filtering the `-1` sentinel.
    */
  def simhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), graft.functions.SimHashSig(col("text"), 32).as("simhash"))
      .where(col("simhash") =!= graft.functions.SimHashSig.Empty)

  val simhashSql: String = {
    val bits = 32
    val votes = (0 until bits)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val sig = (0 until bits)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, ${sqlHash60("t")} AS h FROM (
       |    SELECT doc_id, unnest(${sqlTokens("text")}) AS t FROM documents)),
       |votes AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM votes""".stripMargin
  }

  /** SimHash near-dup pairs: band the 32-bit signature into 4 bytes; docs
    * sharing any full band are candidates (a Hamming distance ≤ 7 pair must
    * agree on at least one of 4 bands — pigeonhole); verify by exact
    * Hamming distance over the full signature. The d02 join discipline
    * applies unchanged: the signature rides through the band explode so the
    * verify needs no join back, `shuffle_hash` keeps the corpus-sized band
    * table out of a broadcast and lets the two identical exchanges dedup
    * via ReusedExchange (one corpus scan, one signature aggregate).
    * Everything is integer arithmetic — bit-identical in any engine.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val bands = simhash(s, dir)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bsig")
      .hint("shuffle_hash")
    val a = bands.alias("a")
    val b = bands.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 7)
      .distinct()
  }

  val simhashPairsSql: String =
    s"""WITH sh AS ($simhashSql),
       |bands AS (
       |  SELECT doc_id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bsig
       |  FROM sh, range(0, 4) t(b)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 7""".stripMargin

  // d13 banding: calibrated for the 0.8 verify threshold, unlike d02's
  // (4×4 at k=16, S-curve midpoint ≈0.71, which on a templated corpus
  // floods the verifier — measured 605 k candidates for 256 true pairs).
  // 8 rows/band pushes the midpoint to (1/4)^(1/8) ≈ 0.84 and cuts
  // j≈0.45 template collisions by ~0.45⁴ ≈ 25×.
  private val vK = 32 // signature length
  private val vRows = 8 // rows per band → 4 bands

  /** The composed scale ladder, in one query: corpus-wide MinHash-LSH
    * candidates (NO doc_id bound — the join is banded, so this is the
    * 100 TB-legal pass) verified by EXACT 5-gram Jaccard at 0.8.
    *
    * Three calibration decisions, each measured (SCALING.md §3):
    *  - banding matched to the verify threshold (k=32, 4 bands × 8 rows;
    *    d02's 4×4 flooded the verifier with j≈0.45 template collisions);
    *  - FILTER-AND-VERIFY: candidates first cut on the free signature
    *    estimate (est ≥ 0.6 — at 32 hashes, sd(est) ≈ 0.09, so
    *    P[est < 0.6 | j ≥ 0.8] ≈ 1%), applied AFTER a checkpoint
    *    barrier: pushed down, the 32-way comparison becomes an
    *    interpreted join condition evaluated per band collision
    *    (measured 6× slower than the projected form);
    *  - the verifier joins each surviving pair to its two fused gram
    *    arrays ([[graft.functions.ShingleHash60s]], materialized once)
    *    and intersects per ROW (`array_intersect`, codegen'd) — no
    *    inverted-index join, no Σ df² blowup: verify cost is
    *    O(survivors × gram-array size).
    */
  def lshVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables.documents(s, dir)
      .select(col("doc_id"), graft.functions.MinHashSig(col("text"), 5, vK).as("sig"))
    val bandCols = (0 until vK / vRows).map { b =>
      concat_ws(":", (0 until vRows).map(j =>
        element_at(col("sig"), b * vRows + j + 1)): _*)
    }
    val bands = sig
      .select(col("doc_id"), col("sig"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bsig")
      .hint("shuffle_hash")
    val a = bands.alias("a")
    val b = bands.alias("b")
    val matches: Column = (0 until vK)
      .map(i => when(element_at(col("a.sig"), i + 1) === element_at(col("b.sig"), i + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    // checkpoint = pushdown barrier: est stays a codegen'd projection
    // computed once per distinct pair, never a join condition
    val pairs = a
      .join(b, col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        (matches.cast("double") / lit(vK.toDouble)).as("est"))
      .distinct()
      .localCheckpoint(true)
    val cand = pairs.filter(col("est") >= 0.6).select(col("a_id"), col("b_id"))
    // both verify sides read the gram arrays — materialize the corpus-wide
    // md5 gram pass ONCE (recompute-under-reuse otherwise, SCALING.md §2)
    val gsel = Tables.documents(s, dir)
      .select(col("doc_id"), graft.functions.ShingleHash60s(col("text"), 5).as("gs"))
      .localCheckpoint(true)
    val ga = gsel.select(col("doc_id").as("a_id"), col("gs").as("ga"))
    val gb = gsel.select(col("doc_id").as("b_id"), col("gs").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb"))).cast("double")
    cand
      .join(ga, "a_id")
      .join(gb, "b_id")
      .select(col("a_id"), col("b_id"),
        (inter / (size(col("ga")) + size(col("gb")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  val lshVerifiedPairsSql: String = {
    val bandSelects = (0 until vK / vRows).map { b =>
      val sig = (0 until vRows).map(j => s"h${b * vRows + j}").mkString("||':'||")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString(" UNION ALL ")
    val matchSum = (0 until vK)
      .map(i => s"(CASE WHEN ma.h$i = mb.h$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH mh AS (${minhashesSqlK(vK)}),
       |bands AS ($bandSelects),
       |cpairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |cand AS (
       |  SELECT p.a_id, p.b_id
       |  FROM cpairs p JOIN mh ma ON ma.doc_id = p.a_id
       |  JOIN mh mb ON mb.doc_id = p.b_id
       |  WHERE CAST($matchSum AS DOUBLE) / ${vK}.0 >= 0.6),
       |grams AS (
       |  SELECT doc_id, list(${sqlHash60("g")}) AS gs FROM (
       |    SELECT DISTINCT doc_id, g FROM (
       |      SELECT doc_id, unnest(${sqlShingles("text", 5)}) AS g FROM documents))
       |  GROUP BY doc_id),
       |scored AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
       |      / CAST(len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
       |      AS jaccard
       |  FROM cand c
       |  JOIN grams ga ON ga.doc_id = c.a_id
       |  JOIN grams gb ON gb.doc_id = c.b_id)
       |SELECT a_id, b_id, jaccard FROM scored WHERE jaccard >= 0.8""".stripMargin
  }

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.8) via inverted-index
    * join on shared 3-grams. Bounded to doc_id < 600: the exact pass is the
    * *verifier* you run on LSH candidates, not the corpus scan — its join
    * cost is Σ_g df(g)², which stop-grams make quadratic.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 600)
    // grams join/aggregate on their 60-bit hash, not the string: long keys
    // shuffle and compare cheaper, and both engines hash identically so
    // the (negligible, identical) collision behavior is mirrored too.
    // The distinct-gram hash array comes fused from ShingleHash60s
    // (string-distinct, so hash collisions still emit both grams — exact
    // multiset parity with the unnest-DISTINCT oracle) — and because the
    // array is in hand, each doc's gram count is size(gs) — a per-row
    // projection, not the explode + count-aggregate pass it used to be.
    // The intersection aggregate stays NARROW (a_id, b_id only): it runs
    // over the Σ df(g)² join output, the dominant volume of this query,
    // so every extra byte in its keys is paid quadratically; the tiny
    // per-doc sizes attach afterwards. The self-join may broadcast here
    // because the exact pass is BOUNDED by construction (candidates-only
    // at scale — this file's scale ladder); an unbounded corpus-wide gram
    // index would need the shuffle_hash form d02 uses.
    val gsel = docs
      .select(col("doc_id"), graft.functions.ShingleHash60s(col("text"), 3).as("gs"))
    val grams = gsel.select(col("doc_id"), explode(col("gs")).as("g"))
    val sizes = gsel.select(col("doc_id"), size(col("gs")).as("n"))
    val a = grams.alias("a")
    val b = grams.alias("b")
    val inter = a
      .join(b, col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("i"))
    val sa = sizes.alias("sa")
    val sb = sizes.alias("sb")
    inter
      .join(sa, col("a_id") === col("sa.doc_id"))
      .join(sb, col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"),
        (col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  val ngramJaccardSql: String =
    s"""WITH grams AS (
       |  SELECT doc_id, ${sqlHash60("gs")} AS g FROM (
       |    SELECT DISTINCT doc_id, gs FROM (
       |      SELECT doc_id, unnest(${sqlShingles("text", 3)}) AS gs
       |      FROM documents WHERE doc_id < 600))),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT a_id, b_id,
       |  CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = a_id
       |JOIN sizes sb ON sb.doc_id = b_id
       |WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8""".stripMargin
}
