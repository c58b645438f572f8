package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Hashing.{sqlHash60, sqlShingles}

/** Benchmark decontamination — the training-data step that flags corpus
  * documents overlapping an evaluation set, so eval answers don't leak
  * into training. Standard practice is n-gram overlap (e.g. the 13-token
  * window used for GPT-3's decontamination); here the window is 16
  * characters over the same md5-60 shingle machinery as the dedup family
  * (fused [[graft.functions.ShingleHash60s]], so both engines hash
  * identically and the oracle can replay the whole operator).
  *
  * Scale shape — the part that matters at 100 TB: the benchmark gram set
  * is small (eval suites are MBs, not TBs), so it BROADCASTS; the corpus
  * side is scanned once, its grams never shuffle, and only matched rows
  * (contaminated doc, gram) reach the per-doc count — an aggregate whose
  * input is proportional to actual contamination, not corpus size.
  */
object Decontaminate {

  private val gramChars = 16

  /** (doc_id, n_shared) for every corpus doc sharing at least one
    * 16-char gram with the benchmark set. The synthetic stand-in for the
    * eval suite is every 100th document — realistic in that eval items
    * ARE present verbatim in the corpus (the case decontamination exists
    * to catch); those docs flag themselves with their full gram count.
    */
  def flagOverlaps(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 100 === 0)
    val bgrams = bench
      .select(explode(graft.functions.ShingleHash60s(col("text"), gramChars)).as("g"))
      .distinct()
    // ShingleHash60s output is per-doc distinct already, so the inner
    // join against the distinct benchmark grams yields one row per
    // (doc, shared gram): count(*) = distinct shared grams
    docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash60s(col("text"), gramChars)).as("g"))
      .join(broadcast(bgrams), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  val flagOverlapsSql: String =
    s"""WITH bench AS (
       |  SELECT DISTINCT ${sqlHash60("gs")} AS g FROM (
       |    SELECT DISTINCT gs FROM (
       |      SELECT unnest(${sqlShingles("text", gramChars)}) AS gs
       |      FROM documents WHERE doc_id % 100 = 0))),
       |cg AS (
       |  SELECT doc_id, ${sqlHash60("gs")} AS g FROM (
       |    SELECT DISTINCT doc_id, gs FROM (
       |      SELECT doc_id, unnest(${sqlShingles("text", gramChars)}) AS gs
       |      FROM documents)))
       |SELECT doc_id, COUNT(*) AS n_shared
       |FROM cg JOIN bench USING (g)
       |GROUP BY doc_id""".stripMargin
}
