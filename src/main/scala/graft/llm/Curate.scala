package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end training-data curation pipeline — the reason this
  * engine exists, as ONE operator: starting from the raw corpus,
  *
  *   1. drop near-duplicates (corpus-wide LSH → exact-verify → connected
  *      components, keep the min-id representative — [[Dedup.lshVerifiedPairs]]
  *      + [[DedupResolve.resolveClusters]]);
  *   2. drop benchmark-contaminated documents (eval-set 16-gram overlap,
  *      broadcast-semi shape — [[Decontaminate.flagOverlaps]]);
  *   3. drop low-quality documents (composite length/diversity/stopword/
  *      alpha score < 0.5, fused single pass — [[TextAnalysis.qualityFilter]]).
  *
  * Every stage is the already-oracle-gated operator, so the composition
  * is itself oracle-checked end to end (recursive-CTE components +
  * mirrored gram/quality SQL). Scale shape: stage 1 is banded equi-joins
  * + O(log d) resolution rounds, stage 2 broadcasts only the (small)
  * benchmark grams, stage 3 is a pure scan; the three removal sets then
  * anti-join the corpus id list — no stage ever materializes more than
  * ids off the scan path.
  */
object Curate {

  def curate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.lshVerifiedPairs(s, dir).select(col("a_id"), col("b_id"))
    val losers = DedupResolve.resolveClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id"))
    val contaminated = Decontaminate.flagOverlaps(s, dir)
      .select(col("doc_id").as("cid"))
    val quality = TextAnalysis.qualityFilter(s, dir).select(col("doc_id"))
    docs.select(col("doc_id"))
      .join(losers, docs("doc_id") === losers("id"), "left_anti")
      .join(contaminated, col("doc_id") === col("cid"), "left_anti")
      .join(quality, Seq("doc_id"), "left_semi")
      .orderBy(col("doc_id"))
  }

  val curateSql: String =
    s"""WITH RECURSIVE pairs AS (${Dedup.lshVerifiedPairsSql}),
       |edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a),
       |contaminated AS (SELECT doc_id FROM (${Decontaminate.flagOverlapsSql})),
       |quality AS (SELECT doc_id FROM (${TextAnalysis.qualityFilterSql}))
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id <> cluster)
       |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
       |  AND doc_id IN (SELECT doc_id FROM quality)
       |ORDER BY doc_id""".stripMargin
}
