package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental corpus-append deduplication (d39) — the operator a daily
  * ingest pipeline runs most often: dedup a DELTA batch against the
  * already-resolved corpus using its persisted signature artifacts,
  * without rescanning the corpus, and produce exactly the kept-set the
  * full-corpus rerun would (the reference's chained-step
  * prior-output-as-input pattern, reference runner.go:147-151, applied
  * at the corpus boundary).
  *
  * The persisted artifact ([[CorpusIndex]]) is what yesterday's run
  * leaves behind:
  *   - `hashes`  — (doc_id, content_hash): the exact-dup key (d01's);
  *   - `sigs`    — (doc_id, sig): the k-minhash signature. Bands are a
  *     deterministic per-row map of the signature
  *     ([[Dedup.bandsOf]] — the SAME construction the corpus run
  *     banded with, which is what makes the artifact joinable), so
  *     persisting sigs once beats persisting the 4× exploded band
  *     table; at read time the band derivation is a narrow projection;
  *   - `labels`  — (id, cluster): the corpus's resolved components.
  *     Star edges id→cluster preserve corpus-internal connectivity
  *     EXACTLY (a label edge set and the pair set it resolved from
  *     have the same transitive closure over corpus nodes), which is
  *     the identity that lets the incremental pass skip every
  *     corpus-internal pair.
  *
  * The incremental pass ([[appendKept]]) touches, per stage:
  *   1. exact: delta content hashes ⋈ (corpus hashes ∪ delta hashes)
  *      group-min — STAR edges to the group minimum, linear in delta
  *      and skew-proof (never the m² clique of a viral duplicate);
  *   2. LSH: delta signatures band-join (corpus ∪ delta) bands — both
  *      sides shuffle on the band key (`shuffle_hash`: a "small" delta
  *      is still millions of rows at 100 TB scale), candidates are
  *      pairs with ≥ 1 delta member ONLY — corpus×corpus buckets never
  *      join;
  *   3. verify: est prefilter (free, from the signatures both sides
  *      already carry) then exact 5-gram Jaccard. Gram arrays are
  *      computed for candidate members only — the corpus side is a
  *      SEMI-JOIN-PRUNED point read of the documents table (cost ∝
  *      candidates; with doc_id-bucketed storage this is the one
  *      selective corpus read the pass performs, and it is not a
  *      scan);
  *   4. resolve: connected components over (label stars ∪ exact stars
  *      ∪ verified delta pairs) — pointer-jumping, O(log d) rounds
  *      over an edge set proportional to delta activity.
  *
  * Equivalence to the full rerun (the d39 gate): rerun pairs split into
  * corpus-internal ∪ delta-involved. Corpus-internal pairs reproduce
  * yesterday's (same deterministic md5 minhash, same banding, same
  * verify), whose components the label stars encode; delta-involved
  * candidates are exactly the rerun's band buckets restricted to ≥ 1
  * delta member, scored by the same est/Jaccard arithmetic. Components
  * therefore agree node-for-node, and the kept set (min doc_id per
  * component) is hash-identical — which is why d39's DuckDB oracle IS
  * the full-corpus rerun SQL ([[DedupResolve.corpusDedupPipelineSql]]):
  * the incremental path must change the COST, never the answer.
  *
  * The one DOCUMENTED divergence: under a finite `bucketCap` (the
  * template-skew guard every capped path owns), the equivalence is to
  * yesterday's-population semantics, not today's — a bucket whose
  * membership crosses the cap only once the delta lands was capped
  * differently by the corpus-only run than a full rerun would cap it,
  * so corpus-internal pairs from exactly those buckets can differ. This
  * is inherent to capping + increments (the cap is a recall knob, as in
  * d21/d25); the ScaleBench `incdedup` mode MEASURES the resulting
  * kept-set drift at ×500 instead of hand-waving it, and its uncapped
  * arm certifies set_diff = 0 where the equivalence claim is exact.
  */
object IncrementalDedup {

  /** The persisted per-corpus artifacts (see class doc). */
  final case class CorpusIndex(hashes: DataFrame, sigs: DataFrame, labels: DataFrame) {
    /** Materialize each artifact (the in-plan stand-in for the parquet
      * the production pipeline persists — and the pushdown fence that
      * guarantees the incremental pass reads artifacts, not a re-derive
      * of the corpus text).
      */
    def checkpointed(): CorpusIndex =
      CorpusIndex(hashes.localCheckpoint(true), sigs.localCheckpoint(true),
        labels.localCheckpoint(true))
  }

  /** Build the artifacts the corpus run persists: content hashes,
    * minhash signatures, and the resolved component labels of the
    * corpus-internal verified pairs (yesterday's full run).
    */
  def buildIndex(
      corpus: DataFrame,
      k: Int = 32,
      rowsPerBand: Int = 8,
      estMin: Double = 0.6,
      jaccardMin: Double = 0.8,
      bucketCap: Int = Dedup.NoBucketCap): CorpusIndex = {
    val hashes = corpus.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"))
    val sigs = corpus.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
    val pairs = Dedup.lshVerifiedPairsDf(corpus, k, rowsPerBand, estMin, jaccardMin, bucketCap)
      .select(col("a_id"), col("b_id"))
    CorpusIndex(hashes, sigs, DedupResolve.resolveClusters(pairs))
  }

  /** Write the artifacts as parquet (the real persistence surface the
    * ScaleBench `incdedup` mode measures through).
    */
  def writeIndex(idx: CorpusIndex, dir: String): Unit = {
    idx.hashes.write.mode("overwrite").parquet(s"$dir/hashes")
    idx.sigs.write.mode("overwrite").parquet(s"$dir/sigs")
    idx.labels.write.mode("overwrite").parquet(s"$dir/labels")
  }

  def readIndex(s: SparkSession, dir: String): CorpusIndex =
    CorpusIndex(
      s.read.parquet(s"$dir/hashes"),
      s.read.parquet(s"$dir/sigs"),
      s.read.parquet(s"$dir/labels"))

  /** The incremental pass: kept doc_ids of corpus ⊎ delta (one column,
    * doc_id-ordered — the d14 output contract). `allDocs` is the full
    * documents table; the pass reads it ONLY for the final id list and
    * the semi-join-pruned gram verify (see class doc).
    */
  def appendKept(
      allDocs: DataFrame,
      idx: CorpusIndex,
      delta: DataFrame,
      k: Int = 32,
      rowsPerBand: Int = 8,
      estMin: Double = 0.6,
      jaccardMin: Double = 0.8,
      bucketCap: Int = Dedup.NoBucketCap): DataFrame = {
    // 1. exact stars: each delta doc links to the min id of its
    // content-hash group (connectivity-equal to the clique, linear cost)
    val deltaHash = delta.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"))
    val groupMin = idx.hashes.unionByName(deltaHash)
      .groupBy(col("content_hash")).agg(min(col("doc_id")).as("min_id"))
    val exactStars = deltaHash
      .join(groupMin, "content_hash")
      .filter(col("doc_id") =!= col("min_id"))
      .select(col("min_id").as("a_id"), col("doc_id").as("b_id"))

    // 2. banded candidates with >= 1 delta member: delta bands join ALL
    // bands. a != b + least/greatest normalization (not a < b: a
    // delta-corpus pair may order either way; delta-delta pairs arrive
    // in both orders and collapse in the distinct)
    val deltaSigs = delta.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
    // the template-skew cap (d21's guard) applies on the ALL side: its
    // bucket count sees the full corpus+delta population, and an
    // over-cap bucket emptied there emits nothing regardless of the
    // delta side — so capping one side caps the pair output
    val allBands = Dedup.capBuckets(
        Dedup.bandsOf(idx.sigs.unionByName(deltaSigs), k, rowsPerBand),
        bucketCap, "band", "bsig")
      .hint("shuffle_hash").alias("a")
    val deltaBands = Dedup.bandsOf(deltaSigs, k, rowsPerBand)
      .hint("shuffle_hash").alias("b")
    val cand = allBands
      .join(deltaBands,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        Dedup.sigEst(k).as("est"))
      .distinct()
      // the d13 pushdown barrier: est stays a projection computed once
      // per distinct pair, never an interpreted join condition
      .localCheckpoint(true)

    // 3. est prefilter + exact-Jaccard verify; grams only for candidate
    // members (the semi-join prune inside verifyJaccardDf)
    val verified = Dedup.verifyJaccardDf(allDocs,
      cand.filter(col("est") >= estMin).select(col("a_id"), col("b_id")),
      n = 5, minJaccard = jaccardMin)

    // 4. components over label stars + new evidence; keep min per component
    val labelStars = idx.labels
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("a_id"), col("cluster").as("b_id"))
    val edges = labelStars
      .unionByName(exactStars)
      .unionByName(verified.select(col("a_id"), col("b_id")))
    DedupResolve.dedupedDocIds(allDocs.sparkSession, allDocs, edges)
      .orderBy(col("doc_id"))
  }

  /** d39: the oracle-gated composition — corpus = the 80% doc_id split
    * ("yesterday"), delta = the 20% ("today's batch"); build the corpus
    * artifacts, materialize them (the persistence stand-in), then run
    * the incremental pass. The DuckDB mirror is the FULL-CORPUS rerun
    * ([[DedupResolve.corpusDedupPipelineSql]]) — hash-matching it is
    * the incremental ≡ full equivalence proof, per query run.
    */
  def appendDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idx = buildIndex(docs.where(col("doc_id") % 5 < 4)).checkpointed()
    appendKept(docs, idx, docs.where(col("doc_id") % 5 >= 4))
  }

  val appendDedupSql: String = DedupResolve.corpusDedupPipelineSql
}
