package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental corpus-append arms for the remaining signature families
  * of the corpus index (r14 VERDICT ask #5) — the d39 pattern (persist
  * the probe tables BUCKETED on their probe keys; a delta pass probes
  * them with zero corpus-side exchange and unions yesterday's answers)
  * applied to:
  *   - the fixed-width bit-signature families: SimHash (d12/d22) and
  *     pHash (m02–m05) — [[IncrementalSig]];
  *   - the contamination Bloom sketch (d36) — [[IncrementalContam]].
  *
  * Bit-signature pairs are even simpler than d39's minhash path: the
  * verify (exact Hamming over the full signature) needs only the
  * signatures both band rows already carry, and the PAIR LIST itself is
  * the resolvable artifact — no component resolution, no text reads.
  * The incremental answer is exactly
  *   persisted corpus-internal pairs ∪ delta-involved pairs
  * because banding and Hamming are deterministic integer arithmetic:
  * corpus-internal buckets reproduce yesterday's join verbatim, and a
  * delta-involved pair shares a (band, bsig) bucket with ≥ 1 delta
  * member by definition. The gates' oracles are therefore the FULL
  * RERUN SQL, unchanged — the incremental path must change the cost,
  * never the answer (the d39 contract).
  *
  * Decontamination is simpler still: per-document spans are
  * INDEPENDENT across corpus docs (the only shared state is the static
  * benchmark suite), so append = yesterday's spans ∪ spans of the
  * delta probed through the persisted sketch + bucketed gram table.
  */
object IncrementalSig {

  /** Band explode of a (doc_id, sig) fixed-width signature: the same
    * width-bit slicing [[Dedup.simhashPairs]] and
    * [[Multimodal.phashPairsFromSigs]] band with — band-key equality
    * across runs is what makes the persisted band table joinable.
    */
  private def bandsOfSig(sigs: DataFrame, bits: Int, nBands: Int): DataFrame = {
    require(bits % nBands == 0, s"bands=$nBands must divide the $bits-bit signature")
    val width = bits / nBands
    val mask = (1L << width) - 1
    // col("*") lets caller-side evidence columns (e.g. the ledger
    // rerun's epoch tag) ride through the explode
    sigs
      .select(col("*"),
        posexplode(array((0 until nBands).map(b =>
          shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bsig")
  }

  /** The banded Hamming self-join over a (doc_id, sig) table — the
    * "yesterday's run" that produces the persisted corpus-internal pair
    * artifact. Identical semantics to the shipped family operators
    * (banded candidates, exact full-signature Hamming verify, a < b
    * normalized, distinct); `bucketCap` is the d25 production posture —
    * fixed-width bit signatures have O(n/2^width) bucket populations,
    * so an UNCAPPED band join is quadratic at corpus scale (the d22
    * measured cost) and every production run caps.
    */
  private[graft] def buildPairs(sigs: DataFrame, bits: Int, nBands: Int,
      maxHamming: Int, bucketCap: Int = Dedup.NoBucketCap): DataFrame = {
    val banded = Dedup.capBuckets(
        bandsOfSig(sigs, bits, nBands), bucketCap, "band", "bsig")
      .hint("shuffle_hash")
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The persisted artifacts: the bucketed band table (probe surface),
    * its per-bucket population counts (the cap's delta-side evidence —
    * the d39 pattern), and yesterday's resolved pair list.
    */
  final case class SigIndex(bands: DataFrame, pairs: DataFrame,
      bits: Int, nBands: Int, bandCounts: Option[DataFrame] = None)

  private def bandTable(loc: String) =
    graft.runtime.IndexStore.tableFor("graft_sig_bands_", loc)
  private def bcntTable(loc: String) =
    graft.runtime.IndexStore.tableFor("graft_sig_bcnt_", loc)

  private def writeBandTables(s: SparkSession, dir: String, bands: DataFrame,
      relBands: String, relCounts: String, nBuckets: Int): Unit = {
    s.sql(s"DROP TABLE IF EXISTS ${bandTable(s"$dir/$relBands")}")
    s.sql(s"DROP TABLE IF EXISTS ${bcntTable(s"$dir/$relCounts")}")
    graft.runtime.Par.run( // independent writes — overlap (guide §2.6)
      () => graft.runtime.IndexStore.writeBucketed(bands, nBuckets,
        s"$dir/$relBands", bandTable(s"$dir/$relBands"), "overwrite",
        "band", "bsig"),
      () => graft.runtime.IndexStore.writeBucketed(
        bands.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn")),
        nBuckets, s"$dir/$relCounts", bcntTable(s"$dir/$relCounts"),
        "overwrite", "band", "bsig"))
  }

  /** Write + PUBLISH (manifest generation 0 — the atomic-publication
    * discipline of [[IncrementalDedup.writeIndex]], shared by every
    * index family; r16 VERDICT #1).
    */
  def writeIndex(corpusSigs: DataFrame, pairs: DataFrame, dir: String,
      bits: Int, nBands: Int, nBuckets: Int = 32,
      capLedger0: Option[DataFrame] = None): Unit = {
    import graft.runtime.{IndexManifest, IndexStatePublisher}
    val s = corpusSigs.sparkSession
    graft.runtime.Par.run(Seq( // independent writes — overlap (guide §2.6)
      () => writeBandTables(s, dir, bandsOfSig(corpusSigs, bits, nBands),
        "bands", "bandcounts", nBuckets),
      () => pairs.write.mode("overwrite").parquet(s"$dir/pairs/epoch-0"),
      () => s.range(1).selectExpr(s"$bits AS bits", s"$nBands AS n_bands",
          s"$nBuckets AS n_buckets")
        .write.mode("overwrite").parquet(s"$dir/meta")) ++
      capLedger0.map(l => () => l.select(col("band"), col("bsig"))
        .write.mode("overwrite").parquet(s"$dir/capledger/epoch-0")): _*)
    graft.runtime.MetaCache.invalidate(dir) // meta just (re)written
    IndexStatePublisher.publish(dir, IndexManifest(0L,
      Map("bands" -> "bands", "bandcounts" -> "bandcounts", "pairs" -> "pairs") ++
        (if (capLedger0.nonEmpty) Map("capledger" -> "capledger") else Map.empty),
      Map("pairs" -> 0) ++
        (if (capLedger0.nonEmpty) Map("capledger" -> 0) else Map.empty)))
  }

  /** Load the index at its CURRENT published generation (one manifest
    * resolution = one consistent snapshot; see
    * [[IncrementalDedup.readIndex]]). Tombstones (see [[deleteDocs]])
    * are filtered out of the band table and the pair list with
    * broadcast anti-joins — the bucketed layout survives, deleted docs
    * can neither pair with future deltas nor linger in the answer.
    */
  def readIndex(s: SparkSession, dir: String): SigIndex = {
    import graft.runtime.{IndexStatePublisher, IndexStore}
    val m = IndexStatePublisher.current(dir)
    val meta = graft.runtime.MetaCache.row(s, dir)
    val (bits, nBands, nb) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
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
    SigIndex(
      minusDel(IndexStore.ensureBucketedTable(s, bandTable(s"$dir/${m.path("bands")}"),
        "doc_id BIGINT, sig BIGINT, band INT, bsig BIGINT",
        "band, bsig", nb, s"$dir/${m.path("bands")}"), "doc_id"),
      minusDel(minusDel(s.read.parquet(m.epochPaths(dir, "pairs"): _*), "a_id"), "b_id"),
      bits, nBands,
      Some(IndexStore.ensureBucketedTable(s, bcntTable(s"$dir/${m.path("bandcounts")}"),
        "band INT, bsig BIGINT, cn BIGINT", "band, bsig", nb,
        s"$dir/${m.path("bandcounts")}")))
  }

  /** Deletion from a signature index (the d47 lifecycle applied to the
    * bit-signature families): the PAIR LIST is the resolvable artifact —
    * there is no cluster stage to repair — so takedown is exactly a
    * tombstone generation; [[readIndex]] filters every artifact by it.
    * The full surviving tombstone list is rewritten per generation
    * (delete traffic is small by contract) and published with the
    * manifest CAS under the writer lock — a reader's one manifest
    * resolution gives a consistent (pairs, tombstones) snapshot.
    * Equivalence (uncapped): surviving docs band identically in a rerun
    * over corpus-minus-deleted, so the rerun's pairs are precisely
    * yesterday's restricted to surviving endpoints — the filtered load.
    * Under a finite cap the mirror of the append caveat applies
    * (buckets falling back under the cap re-admit pairs; SCALING.md
    * §3h). The persisted per-bucket counts intentionally keep counting
    * tombstoned rows: the cap guards the PHYSICAL bucket population the
    * probe join touches, and dead band rows still sit in those buckets
    * until rebuild-time compaction.
    *
    * LEDGERED (capped) indexes: deletion COMPOSES with the cap ledger
    * (r18 VERDICT #1). Suppression sets are population history a
    * takedown cannot rewrite, and counts keep counting tombstones, so
    * post-delete capped appends suppress exactly as the epoch history
    * says; [[rerunWithLedger]] fed the SURVIVING signatures (original
    * epoch tags) equals the tombstone-filtered pair artifact —
    * spec-pinned (IndexPublicationSpec "cap ledger" case).
    */
  def deleteDocs(s: SparkSession, dir: String, deleteIds: DataFrame): Unit = {
    import graft.runtime.IndexStatePublisher
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      val del = deleteIds.select(col("doc_id").cast("long").as("doc_id"))
      val allDel = m.pathOpt("deleted")
        .map(rel => s.read.parquet(s"$dir/$rel").unionByName(del).distinct())
        .getOrElse(del)
        .transform(graft.runtime.Ckpt.eager)
      allDel.write.mode("overwrite").parquet(s"$dir/deleted/gen-${m.gen + 1}")
      IndexStatePublisher.publish(dir, m
        .withEntry("deleted", s"deleted/gen-${m.gen + 1}")
        .copy(gen = m.gen + 1))
    }
  }

  /** The LEDGERED family's compaction: a REBUILD (r18 VERDICT ask #2 —
    * previously only a refusal message recommended this; now it is
    * engine code). Epoch-collapsing compaction cannot preserve a cap
    * ledger (suppression HISTORY), so the scheduled physical cleanup
    * for a ledgered index is: re-derive everything from the SURVIVING
    * signatures — recoverable from the tombstone-filtered band table,
    * no caller-supplied corpus needed — via [[buildPairsWithLedger]],
    * into FRESH generation-suffixed directories with a fresh EPOCH-0
    * ledger, switch with the manifest CAS (tombstone entry dropped),
    * all under the writer lock. In-flight readers keep their
    * directories until [[graft.runtime.IndexStatePublisher.gc]].
    *
    * The rebuilt index answers as a FRESH capped build over survivors —
    * by design NOT necessarily the pre-rebuild maintained answer (the
    * epoch history is gone; suppression re-derives from the survivor
    * population). That is the same semantic reset a re-banding or
    * centroid retrain performs: a scheduled, loud re-derivation, never
    * a silent drift. The spec pins rebuilt ≡ fresh-build-over-survivors
    * AND that the fresh ledger replays (epoch-0 tags) to the rebuilt
    * answer.
    */
  def rebuildLedgered(s: SparkSession, dir: String, maxHamming: Int,
      bucketCap: Int): Unit = {
    import graft.runtime.{IndexManifest, IndexStatePublisher}
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      require(m.pathOpt("capledger").nonEmpty,
        s"signature index at $dir is not ledgered — use compactIndex")
      val meta = graft.runtime.MetaCache.row(s, dir)
      val (bits, nBands, nb) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
      val idx = readIndex(s, dir) // tombstone-filtered views
      val survSigs = idx.bands.select(col("doc_id"), col("sig")).distinct()
        .transform(graft.runtime.Ckpt.eager)
      val (pairs, over0) = buildPairsWithLedger(survSigs, bits, nBands,
        maxHamming, bucketCap)
      val pairsC = pairs.transform(graft.runtime.Ckpt.eager)
      val g = m.gen + 1
      graft.runtime.Par.run( // independent writes — overlap (guide §2.6)
        () => writeBandTables(s, dir, bandsOfSig(survSigs, bits, nBands),
          s"bands-g$g", s"bandcounts-g$g", nb),
        () => pairsC.write.mode("overwrite").parquet(s"$dir/pairs-g$g/epoch-0"),
        () => over0.select(col("band"), col("bsig"))
          .write.mode("overwrite").parquet(s"$dir/capledger-g$g/epoch-0"))
      IndexStatePublisher.publish(dir, IndexManifest(g,
        Map("bands" -> s"bands-g$g", "bandcounts" -> s"bandcounts-g$g",
          "pairs" -> s"pairs-g$g", "capledger" -> s"capledger-g$g"),
        Map("pairs" -> 0, "capledger" -> 0)))
    }
  }

  /** Rebuild-time compaction (see [[IncrementalDedup.compactIndex]]):
    * rewrite the band table and pair list minus tombstoned rows,
    * recount buckets (collapsing the maintained index's per-append
    * count rows and the epoch history), drop the tombstone entry.
    * Answer-invariant — the spec pins read-before ≡ read-after. All
    * rewrites target FRESH generation-suffixed directories; the switch
    * is the manifest CAS (in-flight readers keep their files).
    */
  def compactIndex(s: SparkSession, dir: String): Unit = {
    import graft.runtime.{IndexManifest, IndexStatePublisher}
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      // a LEDGERED index's cap ledger is suppression HISTORY: an
      // epoch-collapsed rewrite cannot preserve the rerun contract
      // (r17 ADVICE #2 — silently dropping the ledger made later capped
      // appends stop recording). The ledgered path's compaction is
      // [[rebuildLedgered]] — engine code since r19.
      require(m.pathOpt("capledger").isEmpty,
        s"signature index at $dir is ledgered; compaction would discard " +
          "the cap ledger and break the rerun contract — use " +
          "rebuildLedgered(dir, maxHamming, bucketCap) instead")
      if (m.pathOpt("deleted").nonEmpty) {
        val nb = graft.runtime.MetaCache.row(s, dir).getInt(2)
        val idx = readIndex(s, dir) // tombstone-filtered views
        val bands = idx.bands.transform(graft.runtime.Ckpt.eager)
        val pairs = idx.pairs.transform(graft.runtime.Ckpt.eager)
        val g = m.gen + 1
        writeBandTables(s, dir, bands, s"bands-g$g", s"bandcounts-g$g", nb)
        pairs.write.mode("overwrite").parquet(s"$dir/pairs-g$g/epoch-0")
        IndexStatePublisher.publish(dir, IndexManifest(g,
          Map("bands" -> s"bands-g$g", "bandcounts" -> s"bandcounts-g$g",
            "pairs" -> s"pairs-g$g"),
          Map("pairs" -> 0)))
      }
    }
  }

  /** The incremental pass: delta bands probe the bucketed corpus band
    * table (corpus side: scan, no exchange) for corpus–delta pairs,
    * plus a delta-sized self-join for delta–delta pairs; exact Hamming
    * verify is a projection of the joined rows; union with yesterday's
    * pairs IS the full-corpus answer (class doc). `bucketCap` follows
    * the d39 pattern: the cap over corpus+delta bucket population is
    * enforced from the PERSISTED per-bucket counts joined to the
    * delta's — delta-touched buckets only, output-equivalent to
    * capping the full union (a bucket without a delta member emits no
    * candidate), at a delta-bucket-sized cost. Under a finite cap the
    * equivalence carries d39's yesterday's-population caveat at cap
    * crossings; the uncapped gates stay exact.
    */
  def appendPairs(idx: SigIndex, deltaSigs: DataFrame,
      maxHamming: Int, bucketCap: Int = Dedup.NoBucketCap): DataFrame =
    idx.pairs.unionByName(deltaPairs(idx, deltaSigs, maxHamming, bucketCap)._2)

  /** The CAPPED build arm with its over-cap evidence (the epoch-0 cap
    * ledger): same semantics as [[buildPairs]] at a finite cap, but the
    * suppressed bucket set is returned for persistence. Epoch-0 rule =
    * the same rule every append applies ([[deltaPairs]]): a bucket is
    * suppressed iff its population among docs visible at this epoch
    * exceeds the cap.
    */
  private[graft] def buildPairsWithLedger(sigs: DataFrame, bits: Int, nBands: Int,
      maxHamming: Int, bucketCap: Int): (DataFrame, DataFrame) = {
    require(bucketCap != Dedup.NoBucketCap, "ledger build requires a finite cap")
    val banded = bandsOfSig(sigs, bits, nBands)
    val over = banded.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn"))
      .filter(col("cn") > bucketCap)
      .select(col("band"), col("bsig"))
      .transform(graft.runtime.Ckpt.eager)
    (buildPairs(sigs, bits, nBands, maxHamming, bucketCap), over)
  }

  /** The delta-involved pairs of one append (the shared core of the
    * one-shot [[appendPairs]] and the maintained [[appendToIndex]]):
    * corpus–delta via the bucketed band probe, delta–delta via the
    * delta-sized self-join, exact Hamming verify, `a < b` distinct.
    * Returns (delta band rows — checkpointed, the write-back payload —
    * the LAZY new-pair frame, and the over-cap bucket set this epoch
    * SUPPRESSED — the cap-ledger row source, `None` when uncapped).
    */
  private def deltaPairs(idx: SigIndex, deltaSigs: DataFrame,
      maxHamming: Int, bucketCap: Int): (DataFrame, DataFrame, Option[DataFrame]) = {
    val db0 = bandsOfSig(deltaSigs, idx.bits, idx.nBands).transform(graft.runtime.Ckpt.eager)
    var overLedger: Option[DataFrame] = None
    val (cb, db) =
      if (bucketCap == Dedup.NoBucketCap) (idx.bands, db0)
      else {
        require(bucketCap > 0,
          s"bucketCap must be positive or NoBucketCap, got $bucketCap")
        val cCnt0 = idx.bandCounts.getOrElse(
          idx.bands.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn")))
        val dCnt = db0.groupBy(col("band"), col("bsig"))
          .agg(count(lit(1)).as("dn"))
          .transform(graft.runtime.Ckpt.eager)
        // a MAINTAINED index appends one count row per (append, bucket):
        // SUM over delta-touched keys only (the d46 pattern)
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
        (idx.bands.join(over, Seq("band", "bsig"), "left_anti"),
          db0.join(over, Seq("band", "bsig"), "left_anti"))
      }
    def ham = bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int")
    val candCD = cb.alias("a")
      .join(db.hint("shuffle_hash").alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"),
        ham.as("hamming"))
    val candDD = db.hint("shuffle_hash").alias("a")
      .join(db.alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        ham.as("hamming"))
    (db0,
      candCD.unionByName(candDD)
        .filter(col("hamming") <= maxHamming)
        .distinct(),
      overLedger)
  }

  /** One MAINTAINED append (the d46 lifecycle for the signature
    * families): compute the delta-involved pairs, then write the delta's
    * rows BACK — band rows appended in the same bucket layout, one count
    * row per (append, bucket) (readers sum over delta-touched keys),
    * new pairs appended to the pair artifact — so the directory again
    * holds what a full run over the accumulated corpus would persist.
    * New pairs are checkpointed BEFORE any table mutation (their plan
    * lazily probes the very band table being appended). Returns the
    * artifact's pair state re-read from disk — old ∪ new, tombstone-
    * filtered, exactly what the next reader sees.
    */
  def appendToIndex(s: SparkSession, dir: String, deltaSigs: DataFrame,
      maxHamming: Int, bucketCap: Int = Dedup.NoBucketCap): DataFrame = {
    import graft.runtime.IndexStatePublisher
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      val idx = readIndex(s, dir)
      val nb = graft.runtime.MetaCache.row(s, dir).getInt(2)
      val (db0, newPairs0, over) = deltaPairs(idx, deltaSigs, maxHamming, bucketCap)
      val newPairs = newPairs0.transform(graft.runtime.Ckpt.eager)
      val pairEpoch = m.epochs.getOrElse("pairs", -1) + 1
      // the CAP LEDGER (r16 VERDICT #2): a LEDGERED index (built via
      // [[buildPairsWithLedger]]) persists, per epoch, the exact bucket
      // set the cap suppressed — which is what makes a capped
      // incremental answer REPRODUCIBLE by a rerun
      // ([[rerunWithLedger]]) instead of "append-consistent, drift
      // unbounded". Epochs align with the pair epochs; an uncapped
      // append on a ledgered index records an empty suppression set.
      val ledgered = m.pathOpt("capledger").nonEmpty
      val ledgerWrite = if (!ledgered) Seq.empty else {
        val rows = over.getOrElse {
          import org.apache.spark.sql.types._
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("band", IntegerType),
              StructField("bsig", LongType))))
        }
        Seq(() => rows.select(col("band"), col("bsig"))
          .write.mode("overwrite")
          .parquet(s"$dir/${m.path("capledger")}/epoch-$pairEpoch"))
      }
      graft.runtime.Par.run(Seq( // independent writes — overlap (guide §2.6)
        () => graft.runtime.IndexStore.writeBucketed(db0, nb,
          s"$dir/${m.path("bands")}", bandTable(s"$dir/${m.path("bands")}"),
          "append", "band", "bsig"),
        () => graft.runtime.IndexStore.writeBucketed(
          db0.groupBy(col("band"), col("bsig")).agg(count(lit(1)).as("cn")),
          nb, s"$dir/${m.path("bandcounts")}",
          bcntTable(s"$dir/${m.path("bandcounts")}"), "append", "band", "bsig"),
        () => newPairs.write.mode("overwrite")
          .parquet(s"$dir/${m.path("pairs")}/epoch-$pairEpoch")) ++ ledgerWrite: _*)
      IndexStatePublisher.publish(dir, m.copy(gen = m.gen + 1,
        epochs = m.epochs + ("pairs" -> pairEpoch) ++
          (if (ledgered) Map("capledger" -> pairEpoch) else Map.empty)))
      readIndex(s, dir).pairs
    }
  }

  /** The persisted cap ledger as one frame: (epoch, band, bsig) — every
    * bucket the cap suppressed, at the epoch it suppressed it.
    */
  def readCapLedger(s: SparkSession, dir: String): DataFrame = {
    val m = graft.runtime.IndexStatePublisher.current(dir)
    require(m.pathOpt("capledger").nonEmpty, s"index at $dir has no cap ledger")
    m.epochPaths(dir, "capledger").zipWithIndex
      .map { case (p, e) => s.read.parquet(p).withColumn("epoch", lit(e)) }
      .reduce(_.unionByName(_))
      .select(col("epoch"), col("band"), col("bsig"))
  }

  /** The LEDGER-AWARE RERUN — the engineering contract the cap ledger
    * buys (r16 VERDICT #2): given every document's signature tagged
    * with the epoch it arrived in (`sigsWithEpoch`: doc_id, sig,
    * epoch), recompute from scratch the exact pair set the capped
    * maintained appends produced, using the PERSISTED suppression sets
    * instead of re-deriving caps from populations. The identity: a
    * pair is discovered at epoch e = max(epoch_a, epoch_b) (the epoch
    * its later member arrived), through any shared (band, bsig) bucket
    * NOT suppressed at e — so one self-join with the ledger anti-joined
    * on (band, bsig, e) replays the whole history. The capped
    * incremental answer thus HAS a rerun-reproducible definition; the
    * spec gates `rerunWithLedger ≡ accumulated index pairs`, and d51
    * gates the same semantics against a DuckDB oracle that re-derives
    * the suppression sets from running bucket populations.
    */
  def rerunWithLedger(s: SparkSession, dir: String,
      sigsWithEpoch: DataFrame, maxHamming: Int): DataFrame = {
    val m = graft.runtime.IndexStatePublisher.current(dir)
    val meta = graft.runtime.MetaCache.row(s, dir)
    val (bits, nBands) = (meta.getInt(0), meta.getInt(1))
    // Suppression is MONOTONE: bucket population over visible docs only
    // grows with the epoch, so "over cap at epoch k ⇒ over at every
    // k' > k" — a bucket's ledger rows form a suffix [firstOver, K].
    // Therefore "pair admitted ⇔ bucket not over at pe = max(ea, eb)"
    // ⇔ "both endpoints' epochs < firstOver(bucket)", and the filter
    // moves from the pair level to the ROW level — which is what keeps
    // the rerun scale-safe: a mega-bucket the cap suppressed from
    // epoch 0 contributes ZERO rows to the self-join instead of
    // enumerating its quadratic candidates and discarding them.
    val firstOver = readCapLedger(s, dir)
      .groupBy(col("band"), col("bsig"))
      .agg(min(col("epoch")).as("first_over"))
    val banded = bandsOfSig(
        sigsWithEpoch.select(col("doc_id"), col("sig"), col("epoch")),
        bits, nBands)
      .join(broadcast(firstOver), Seq("band", "bsig"), "left_outer")
      .filter(col("first_over").isNull || col("epoch") < col("first_over"))
      .drop("first_over")
      .transform(graft.runtime.Ckpt.eager)
    banded.alias("a")
      .join(banded.hint("shuffle_hash").alias("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** d42: incremental SimHash near-dup pairs at d12's grid point
    * (32-bit signature, 4 bands, Hamming ≤ 7). Corpus = the 80% doc_id
    * split, delta = the 20%; the gate writes the real bucketed index to
    * a per-invocation temp dir, reads it back, and appends — oracle =
    * the full-rerun banded-join SQL ([[Dedup.simhashPairsSql]]).
    */
  def simhashAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def sigsOf(d: DataFrame): DataFrame = d
      .select(col("doc_id"), graft.functions.SimHashSig(col("text"), 32).as("sig"))
      .where(col("sig") =!= lit(graft.functions.SimHashSig.Empty))
    // one SimHash pass for the corpus side (guide §1.2): the kernel fed
    // the band/count/pair writes lazily — 3-4 recomputes per build (r21)
    val corpusSigs = sigsOf(docs.where(col("doc_id") % 5 < 4))
      .transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incsim")
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(corpusSigs, buildPairs(corpusSigs, 32, 4, 7), idxDir, 32, 4, nBuckets = 8)
    appendPairs(readIndex(s, idxDir), sigsOf(docs.where(col("doc_id") % 5 >= 4)), 7)
  }

  val simhashAppendSql: String = Dedup.simhashPairsSql

  /** d48: DELETION from the signature index — yesterday's index over the
    * whole corpus at d12's grid point (4 bands, Hamming ≤ 7, uncapped ⇒
    * the equivalence is exact), then every doc_id ≡ 3 (mod 7) is taken
    * down; the answer is the tombstone-filtered pair artifact. Oracle:
    * the full rerun over the surviving corpus.
    */
  def simhashDelete(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sigs = docs
      .select(col("doc_id"), graft.functions.SimHashSig(col("text"), 32).as("sig"))
      .where(col("sig") =!= lit(graft.functions.SimHashSig.Empty))
      // one SimHash pass feeding the build's 3-4 write/pair actions (r21)
      .transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incsimdel")
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(sigs, buildPairs(sigs, 32, 4, 7), idxDir, 32, 4, nBuckets = 8)
    deleteDocs(s, idxDir, docs.where(col("doc_id") % 7 === 3).select(col("doc_id")))
    readIndex(s, idxDir).pairs
  }

  val simhashDeleteSql: String =
    Dedup.simhashPairsSqlFor(4, 7, docWhere = "WHERE doc_id % 7 <> 3")

  /** d50: MULTI-append through a MAINTAINED signature index — base = the
    * 25% doc_id split, then three chained 25% deltas, each written back
    * into the band/count/pair artifacts ([[appendToIndex]]), each
    * reading its predecessor's state. Oracle: the UNCHANGED full-rerun
    * banded-join SQL (d42's) — k appends must change the cost model,
    * never the answer (the induction: banding is per-doc deterministic,
    * so after append k the artifacts equal a full run's over the
    * accumulated corpus).
    */
  def simhashMultiAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def sigsOf(d: DataFrame): DataFrame = d
      .select(col("doc_id"), graft.functions.SimHashSig(col("text"), 32).as("sig"))
      .where(col("sig") =!= lit(graft.functions.SimHashSig.Empty))
    // one SimHash pass for the base corpus (guide §1.2; see simhashAppend)
    val base = sigsOf(docs.where(col("doc_id") % 4 === 0))
      .transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-simmulti")
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(base, buildPairs(base, 32, 4, 7), idxDir, 32, 4, nBuckets = 8)
    var pairs: DataFrame = null
    (1 to 3).foreach { m =>
      pairs = appendToIndex(s, idxDir, sigsOf(docs.where(col("doc_id") % 4 === m)), 7)
    }
    pairs
  }

  val simhashMultiAppendSql: String = Dedup.simhashPairsSql

  /** d51's grid point: the full-pigeonhole 8-band geometry where 4-bit
    * buckets are dense enough that a cap of 64 genuinely BINDS at the
    * verify SFs — a ledger gate whose ledger is empty gates nothing.
    */
  val LedgerBands = 8
  val LedgerCap = 64
  val LedgerMaxHamming = 7

  /** d51: k CAPPED maintained appends with a persisted cap ledger (r16
    * VERDICT #2 — "capped maintained appends have no oracle-gated
    * definition"). Base = the doc_id % 4 == 0 split, then three chained
    * capped appends (epochs 1–3), every epoch's suppressed-bucket set
    * persisted beside the pairs. The answer is the accumulated pair
    * artifact. Oracle: [[simhashPairsEpochCappedSql]] — the full rerun
    * under EPOCH-CAPPED semantics, where a pair is admitted iff some
    * shared bucket's population among docs visible at the pair's birth
    * epoch (max of the endpoints' epochs) is within the cap. This is
    * exactly what the incremental capped pass computes, so the capped
    * posture now has a rerun-reproducible, oracle-gated definition —
    * not "append-consistent with unbounded drift". The Scala-side
    * ledger replay ([[rerunWithLedger]]) is additionally spec-pinned
    * equal to the artifact.
    */
  def cappedMultiAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def sigsOf(d: DataFrame): DataFrame = d
      .select(col("doc_id"), graft.functions.SimHashSig(col("text"), 32).as("sig"))
      .where(col("sig") =!= lit(graft.functions.SimHashSig.Empty))
    // one SimHash pass for the base corpus (guide §1.2; see simhashAppend)
    val base = sigsOf(docs.where(col("doc_id") % 4 === 0))
      .transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incsigled")
    val (pairs0, over0) = buildPairsWithLedger(
      base, 32, LedgerBands, LedgerMaxHamming, LedgerCap)
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(base, pairs0, idxDir, 32, LedgerBands, nBuckets = 8,
      capLedger0 = Some(over0))
    var pairs: DataFrame = null
    (1 to 3).foreach { m =>
      pairs = appendToIndex(s, idxDir, sigsOf(docs.where(col("doc_id") % 4 === m)),
        LedgerMaxHamming, bucketCap = LedgerCap)
    }
    pairs
  }

  /** The epoch-capped full-rerun oracle (see [[cappedMultiAppend]]):
    * suppression sets re-derived in SQL from running bucket populations
    * (`pop` = bucket size among docs with epoch ≤ k), pairs admitted
    * through any shared bucket within the cap at their birth epoch.
    */
  def simhashPairsEpochCappedSql(bands: Int, maxHamming: Int, cap: Int,
      epochMod: Int): String = {
    val width = 32 / bands
    val mask = (1L << width) - 1
    s"""WITH sh AS (${Dedup.simhashSqlWhere("")}),
       |e AS (SELECT doc_id, simhash, doc_id % $epochMod AS epoch FROM sh),
       |bands AS (
       |  SELECT doc_id, simhash, epoch, b AS band,
       |    (simhash >> (b * $width)) & $mask AS bsig
       |  FROM e, range(0, $bands) t(b)),
       |pop AS (
       |  SELECT x.band, x.bsig, k.k AS pe, COUNT(*) AS cnt
       |  FROM bands x JOIN range(0, $epochMod) k(k) ON x.epoch <= k.k
       |  GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming,
       |    a.band AS band, a.bsig AS bsig,
       |    greatest(a.epoch, b.epoch) AS pe
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
       |SELECT DISTINCT c.a_id, c.b_id, c.hamming
       |FROM cand c JOIN pop p
       |  ON p.band = c.band AND p.bsig = c.bsig AND p.pe = c.pe
       |WHERE p.cnt <= $cap AND c.hamming <= $maxHamming""".stripMargin
  }

  val cappedMultiAppendSql: String =
    simhashPairsEpochCappedSql(LedgerBands, LedgerMaxHamming, LedgerCap, 4)

  /** m08: incremental pHash near-dup pairs over the media corpus
    * (60-bit fingerprint, 6 bands, Hamming ≤ 5 — the pigeonhole-
    * lossless region, so the full-rerun oracle is the ALL-PAIRS SQL
    * ([[Multimodal.phashPairsSqlFor]]), which also re-proves banding
    * loses nothing through the persistence seam).
    */
  def phashAppend(s: SparkSession, dir: String): DataFrame = {
    // ONE media-decode pass (guide §1.2, the r20 one-sig-pass discipline
    // applied to this family — r21): the pHash kernel (image decode +
    // DCT) is the dominant per-row cost and fed FOUR downstream actions
    // lazily (bands write, counts write, pairs build×2 via the
    // self-join's two scans) — each recomputed the kernel over the
    // corpus. Checkpoint the tiny (doc_id, sig) frame once instead.
    val sigs = Multimodal.perceptualHash(Multimodal.mediaTable(s, dir))
      .toDF().withColumnRenamed("phash", "sig")
      .transform(graft.runtime.Ckpt.eager)
    val corpusSigs = sigs.where(col("doc_id") % 5 < 4)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incph")
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(corpusSigs, buildPairs(corpusSigs, 60, 6, 5), idxDir, 60, 6, nBuckets = 8)
    appendPairs(readIndex(s, idxDir), sigs.where(col("doc_id") % 5 >= 4), 5)
  }

  val phashAppendSql: String = Multimodal.phashPairsSqlFor(5)
}

/** Incremental corpus-append SEMANTIC dedup (d45) — the sign-LSH
  * embedding family (d16) under the d39 pattern: the corpus's
  * (table_id, bucket) table persists bucketed on the probe key, its
  * resolved component labels persist beside it, and the delta pass
  * probes buckets (corpus side scan-only), cosine-verifies only
  * candidates with ≥ 1 delta member, and resolves the TOUCHED subgraph
  * ([[DedupResolve.incrementalKept]]).
  *
  * Geometry is PINNED (8 tables × 4 bits, cosine ≥ 0.35 — d16's
  * historical fixed point): the shipped d16 derives bits from the
  * corpus COUNT ([[Similarity.AutoBits]]), which is exactly what an
  * incremental index cannot do — yesterday's 80% count and today's
  * 100% count would derive different bucket geometries and the
  * persisted bucket table would be unjoinable. A production deployment
  * re-derives bits at index REBUILD time (the scheduled decision, like
  * d44's centroid retrain), holds them fixed across appends, and that
  * is the contract the oracle enforces: the full rerun at the SAME
  * fixed geometry, hash-exact.
  */
object IncrementalSemantic {

  private val NTables = 8
  private val Bits = 4
  private val MinCos = 0.35

  private def withNrm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm",
      sqrt(graft.functions.FloatVecDot(col("embedding"), col("embedding"))))

  private[graft] def withSigs(e: DataFrame,
      nTables: Int = NTables, bits: Int = Bits): DataFrame =
    e.withColumn("sigs",
      graft.functions.SignLshBuckets(col("embedding"), nTables, bits))

  private[graft] def bucketsOf(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("sigs")))
      .withColumnRenamed("pos", "table_id")
      .withColumnRenamed("col", "bucket")

  /** Yesterday's run: bucket self-join + exact-cosine verify over the
    * corpus at the index's geometry (the same candidate/verify ladder as
    * [[Similarity.signLshPairs]] at explicit bits).
    */
  private[graft] def corpusPairs(e: DataFrame, minCos: Double = MinCos): DataFrame = {
    val buckets = bucketsOf(e).hint("shuffle_hash")
    val ids = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    Similarity.verifyCosineOn(e.select(col("vec_id"), col("embedding"), col("nrm")), ids, minCos)
  }

  final case class SemIndex(buckets: DataFrame, labels: DataFrame,
      nTables: Int = NTables, bits: Int = Bits,
      pairs: Option[DataFrame] = None,
      bucketCounts: Option[DataFrame] = None,
      nBuckets: Int = 32)

  private def tableFor(dir: String): String =
    graft.runtime.IndexStore.tableFor("graft_sem_buckets_", dir)
  private def bcntTableFor(dir: String): String =
    graft.runtime.IndexStore.tableFor("graft_sem_bcnt_", dir)

  /** Write + PUBLISH (manifest generation 0; see
    * [[IncrementalDedup.writeIndex]] — r16 VERDICT #1). A LEDGERED
    * write (`capLedger0` present — the d53 capped posture, r17 VERDICT
    * ask #3) additionally persists the per-bucket population counts
    * (the cap's delta-side evidence, one count row per (append,
    * bucket); readers SUM over delta-touched keys) and lays pairs +
    * ledger out in EPOCH directories so maintained appends
    * ([[appendToIndex]]) extend them append-only.
    */
  def writeIndex(corpusE: DataFrame, labels: DataFrame, dir: String,
      nBuckets: Int = 32, nTables: Int = NTables, bits: Int = Bits,
      pairs: Option[DataFrame] = None,
      capLedger0: Option[DataFrame] = None): Unit = {
    import graft.runtime.{IndexManifest, IndexStatePublisher}
    val s = corpusE.sparkSession
    val ledgered = capLedger0.nonEmpty
    require(!ledgered || pairs.nonEmpty,
      "a ledgered semantic index persists its pair evidence")
    val buckets = bucketsOf(corpusE)
    s.sql(s"DROP TABLE IF EXISTS ${tableFor(s"$dir/buckets")}")
    if (ledgered) s.sql(s"DROP TABLE IF EXISTS ${bcntTableFor(s"$dir/bucketcounts")}")
    // the artifact writes are INDEPENDENT actions over materialized
    // inputs — overlap them (guide §2.6; graft.runtime.Par): visibility
    // is the manifest publish below, so write ordering is unobservable
    val writes = Seq(
      () => graft.runtime.IndexStore.writeBucketed(buckets, nBuckets,
        s"$dir/buckets", tableFor(s"$dir/buckets"), "overwrite",
        "table_id", "bucket"),
      () => labels.write.mode("overwrite").parquet(s"$dir/labels/gen-0"),
      () => s.range(1).selectExpr(s"$nBuckets AS n_buckets",
          s"$nTables AS n_tables", s"$bits AS bits")
        .write.mode("overwrite").parquet(s"$dir/meta")) ++
      (if (ledgered) Seq(
        () => graft.runtime.IndexStore.writeBucketed(
          buckets.groupBy(col("table_id"), col("bucket")).agg(count(lit(1)).as("cn")),
          nBuckets, s"$dir/bucketcounts", bcntTableFor(s"$dir/bucketcounts"),
          "overwrite", "table_id", "bucket")) ++
        pairs.map(p => () => p.write.mode("overwrite").parquet(s"$dir/pairs/epoch-0")) ++
        capLedger0.map(l => () => l.select(col("table_id"), col("bucket"))
          .write.mode("overwrite").parquet(s"$dir/capledger/epoch-0"))
      else
        pairs.map(p => () => p.write.mode("overwrite").parquet(s"$dir/pairs/gen-0")).toSeq)
    graft.runtime.Par.run(writes: _*)
    graft.runtime.MetaCache.invalidate(dir) // meta just (re)written
    val entries =
      if (ledgered)
        Map("buckets" -> "buckets", "labels" -> "labels/gen-0",
          "bucketcounts" -> "bucketcounts", "pairs" -> "pairs",
          "capledger" -> "capledger")
      else
        Map("buckets" -> "buckets", "labels" -> "labels/gen-0") ++
          (if (pairs.nonEmpty) Map("pairs" -> "pairs/gen-0") else Map.empty)
    val epochs =
      if (ledgered) Map("pairs" -> 0, "capledger" -> 0)
      else Map.empty[String, Int]
    IndexStatePublisher.publish(dir, IndexManifest(0L, entries, epochs))
  }

  /** Load the index at its CURRENT published generation (one manifest
    * resolution = one consistent snapshot; see
    * [[IncrementalDedup.readIndex]]). Tombstones (see [[deleteVectors]])
    * are filtered out of the bucket table and the pair evidence with
    * broadcast anti-joins (the bucketed layout survives).
    */
  def readIndex(s: SparkSession, dir: String): SemIndex = {
    val m = graft.runtime.IndexStatePublisher.current(dir)
    val meta = graft.runtime.MetaCache.row(s, dir)
    // geometry rode into meta in r16 (the scale arm runs count-calibrated
    // bits); a pre-r16 meta has only n_buckets — fall back to the pinned
    // constants it was written under
    val nb = meta.getInt(0)
    val (nt, bits) =
      if (meta.length >= 3) (meta.getInt(1), meta.getInt(2)) else (NTables, Bits)
    val del: Option[DataFrame] = m.pathOpt("deleted")
      .map(rel => broadcast(s.read.parquet(s"$dir/$rel")))
    def minusDel(df: DataFrame, idCol: String): DataFrame = del match {
      case Some(d) =>
        df.join(d.withColumnRenamed("vec_id", idCol), Seq(idCol), "left_anti")
          .select(df.columns.map(col).toIndexedSeq: _*)
      case None => df
    }
    // pairs live in EPOCH dirs on a ledgered (maintained-append) index,
    // in a single gen-0 dir otherwise
    val pairs = m.pathOpt("pairs").map { rel =>
      val raw =
        if (m.epochs.contains("pairs"))
          s.read.parquet(m.epochPaths(dir, "pairs"): _*)
        else s.read.parquet(s"$dir/$rel")
      minusDel(minusDel(raw, "a_id"), "b_id")
    }
    val bcnt = m.pathOpt("bucketcounts").map(rel =>
      graft.runtime.IndexStore.ensureBucketedTable(s,
        bcntTableFor(s"$dir/$rel"),
        "table_id INT, bucket INT, cn BIGINT",
        "table_id, bucket", nb, s"$dir/$rel"))
    // bucket is INT: SignLshBuckets emits array<int> (≤ 32 bits of
    // bucket id by construction) — a BIGINT declaration here would read
    // the int32 parquet column as null and silently empty every probe
    SemIndex(minusDel(graft.runtime.IndexStore.ensureBucketedTable(s,
        tableFor(s"$dir/${m.path("buckets")}"),
        "vec_id BIGINT, table_id INT, bucket INT",
        "table_id, bucket", nb, s"$dir/${m.path("buckets")}"), "vec_id"),
      s.read.parquet(s"$dir/${m.path("labels")}"), nt, bits, pairs, bcnt, nb)
  }

  /** Incremental DELETION from the semantic index (d49 — the d47
    * lifecycle for the embedding family, minus the exact-hash channel
    * text has and embeddings don't): tombstone the vectors, re-resolve
    * exactly the clusters that lost a member from the PERSISTED pair
    * evidence restricted to touched clusters minus deleted endpoints
    * (connectivity splits when a bridge vector dies — labels alone
    * cannot recover that), keep untouched labels verbatim. Uncapped and
    * geometry-pinned, so the equivalence to the full rerun over
    * surviving vectors is exact (per-vector bucketing is deterministic:
    * the rerun's candidates are yesterday's restricted to survivors).
    * Returns the updated labels (checkpointed).
    *
    * LEDGERED (capped) indexes: deletion COMPOSES with the cap ledger
    * (r18 VERDICT #1 — the d56 contract): suppression sets are
    * population history, counts keep counting tombstones, and
    * [[rerunKeptWithLedger]] fed the SURVIVING vectors (original epoch
    * tags) reproduces the maintained answer — gated by d56 at three
    * SFs (an interleaved delete between capped appends) and
    * spec-pinned.
    */
  def deleteVectors(s: SparkSession, dir: String,
      deleteIds0: DataFrame): DataFrame = {
    import graft.runtime.IndexStatePublisher
    IndexStatePublisher.withWriterLock(dir) {
      val del = deleteIds0.select(col("vec_id").cast("long").as("vec_id"))
        .transform(graft.runtime.Ckpt.eager)
      val m = IndexStatePublisher.current(dir)
      val idx = readIndex(s, dir) // yesterday's view (manifest not yet advanced)
      val pairs = idx.pairs.getOrElse(
        sys.error(s"semantic index at $dir persists no pair evidence; deletion needs it"))
      val touched = idx.labels.join(del.select(col("vec_id").as("id")), Seq("id"))
        .select(col("cluster")).distinct()
        .transform(graft.runtime.Ckpt.eager)
      // guard probe ONCE per delete; both joins below reuse it (r16 ADVICE)
      val tJoin = DedupResolve.guardedByCluster(touched)
      val touchedLabels = idx.labels
        .join(tJoin, Seq("cluster"))
        .select(col("id"), col("cluster"))
      val survPairs = pairs
        .join(touchedLabels.select(col("id").as("a_id")), Seq("a_id"), "left_semi")
        .join(del.withColumnRenamed("vec_id", "a_id"), Seq("a_id"), "left_anti")
        .join(del.withColumnRenamed("vec_id", "b_id"), Seq("b_id"), "left_anti")
      // the touched-cluster re-resolution is this mutation's HEAVY
      // compute (an iterative multi-job resolve); run it to completion
      // BEFORE any artifact write and overlap only the two cheap writes
      // below (r20 VERDICT #1: overlapping the resolve with the
      // tombstone rewrite was the prime suspect for d49's intermittent
      // 7× blowup at 32-way task concurrency — two concurrent heavy
      // jobs sharing local-mode's one unified memory pool, guide §5 —
      // and the serial order also closes the torn-state window r20
      // ADVICE flagged: nothing irreversible happens until the
      // failure-prone step has succeeded). Wall cost of serializing:
      // ≈ 0 — the tombstone union job now hides under the label write
      // instead of under the resolve.
      val subLabels =
        DedupResolve.resolveClusters(survPairs.select(col("a_id"), col("b_id")))
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
  }

  /** The incremental pass: delta buckets probe the bucketed corpus
    * bucket table (corpus side: scan, no exchange) plus a delta-sized
    * self-join; only candidates with ≥ 1 delta member reach the cosine
    * verify (embeddings semi-join-pruned inside
    * [[Similarity.verifyCosineOn]]); components resolve over the
    * touched subgraph.
    */
  def appendKept(allE: DataFrame, idx: SemIndex, delta: DataFrame,
      minCos: Double = MinCos): DataFrame = {
    // one checkpoint, not two (see appendToIndex — r20)
    val db = bucketsOf(withSigs(delta, idx.nTables, idx.bits))
      .transform(graft.runtime.Ckpt.eager)
    val candCD = idx.buckets.alias("a")
      .join(db.hint("shuffle_hash").alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(
        least(col("a.vec_id"), col("b.vec_id")).as("a_id"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("b_id"))
    val candDD = db.hint("shuffle_hash").alias("a")
      .join(db.alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
    val candIds = candCD.unionByName(candDD).distinct().transform(graft.runtime.Ckpt.eager)
    // endpoint semi-join prune before the verify (see [[appendToIndex]])
    val candEnds = candIds.select(col("a_id").as("vec_id"))
      .unionByName(candIds.select(col("b_id").as("vec_id")))
      .distinct()
    val eCand = allE.select(col("vec_id"), col("embedding"), col("nrm"))
      .join(candEnds, Seq("vec_id"), "left_semi")
      .transform(graft.runtime.Ckpt.eager)
    val verified = Similarity.verifyCosineOn(eCand, candIds, minCos)
    DedupResolve.incrementalKept(
        allE.select(col("vec_id").as("doc_id")), idx.labels, verified)
      .select(col("doc_id").as("vec_id"))
  }

  /** The scale-adaptive d53 cap: 75% of the MEAN (table, bucket)
    * population `n / 2^bits` — under it at the 25% base epoch, over it
    * once the accumulated corpus approaches full size, so the ledger
    * BINDS at every verify SF instead of going vacuous (the d51
    * lesson) or suppressing everything (a fixed small cap at sf0.1).
    * The DuckDB oracle computes the same expression from `COUNT(*)`,
    * so the derivation itself is oracle-gated (the d24 AutoBits
    * discipline).
    */
  def semLedgerCap(n: Long, bits: Int = Bits): Int =
    math.max(1, math.floor(0.75 * n / (1L << bits)).toInt)

  /** The CAPPED build arm with its epoch-0 suppression set (the
    * d51/d52 ledger pattern on (table_id, bucket) — r17 VERDICT ask
    * #3): same candidate/verify ladder as [[corpusPairs]] minus the
    * over-cap buckets, which are returned for persistence.
    */
  private[graft] def corpusPairsWithLedger(e: DataFrame, bucketCap: Int,
      minCos: Double = MinCos): (DataFrame, DataFrame) = {
    require(bucketCap > 0, s"ledger build requires a finite positive cap, got $bucketCap")
    val buckets0 = bucketsOf(e)
    val over = buckets0.groupBy(col("table_id"), col("bucket"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") > bucketCap)
      .select(col("table_id"), col("bucket"))
      .transform(graft.runtime.Ckpt.eager)
    val buckets = buckets0.join(over, Seq("table_id", "bucket"), "left_anti")
      .hint("shuffle_hash")
    val ids = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    (Similarity.verifyCosineOn(e.select(col("vec_id"), col("embedding"), col("nrm")),
      ids, minCos), over)
  }

  /** One MAINTAINED append on the semantic index (the d46/d51 lifecycle
    * for the embedding family — r17 VERDICT ask #3: before this, the
    * capped posture on embeddings was either impossible or
    * drift-unbounded). Under the writer lock: capped delta candidates
    * (suppression from the PERSISTED per-bucket counts summed over
    * delta-touched keys + the delta's own counts — population among
    * vectors visible this epoch, examined for delta-touched buckets
    * only), cosine verify, touched-subgraph label resolution; then the
    * write-back — delta bucket rows appended in the bucket layout, one
    * count row per (append, bucket), verified pairs + the epoch's
    * suppressed-bucket set in fresh epoch dirs, labels rewritten to a
    * fresh generation — and the manifest CAS. Requires a LEDGERED index
    * ([[writeIndex]] with `capLedger0`): the epoch layout is what makes
    * the capped answer rerun-reproducible ([[rerunKeptWithLedger]]).
    * Returns the kept vec_ids of `allE` (the accumulated corpus).
    */
  def appendToIndex(s: SparkSession, dir: String, allE: DataFrame,
      delta: DataFrame, minCos: Double = MinCos,
      bucketCap: Int = Dedup.NoBucketCap): DataFrame = {
    import graft.runtime.IndexStatePublisher
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      require(m.epochs.contains("pairs") && m.pathOpt("capledger").nonEmpty,
        s"semantic index at $dir is not ledgered — maintained appends need " +
          "the epoch layout (writeIndex with capLedger0)")
      val idx = readIndex(s, dir)
      // one checkpoint, not two: bucketsOf is the signature projection's
      // only consumer, so materializing the pre-explode frame separately
      // was a pure extra job (r20)
      val db0 = bucketsOf(withSigs(delta, idx.nTables, idx.bits))
        .transform(graft.runtime.Ckpt.eager)
      var overLedger: Option[DataFrame] = None
      val (cb, db) =
        if (bucketCap == Dedup.NoBucketCap) (idx.buckets, db0)
        else {
          require(bucketCap > 0,
            s"bucketCap must be positive or NoBucketCap, got $bucketCap")
          val cCnt0 = idx.bucketCounts.getOrElse(
            idx.buckets.groupBy(col("table_id"), col("bucket")).agg(count(lit(1)).as("cn")))
          val dCnt = db0.groupBy(col("table_id"), col("bucket"))
            .agg(count(lit(1)).as("dn"))
            .transform(graft.runtime.Ckpt.eager)
          val cCnt = cCnt0
            .join(dCnt.select(col("table_id"), col("bucket")).hint("shuffle_hash"),
              Seq("table_id", "bucket"))
            .groupBy(col("table_id"), col("bucket")).agg(sum(col("cn")).as("cn"))
          val over = dCnt
            .join(cCnt, Seq("table_id", "bucket"), "left_outer")
            .filter(coalesce(col("cn"), lit(0L)) + col("dn") > bucketCap)
            .select(col("table_id"), col("bucket"))
            .transform(graft.runtime.Ckpt.eager)
          overLedger = Some(over)
          (idx.buckets.join(over, Seq("table_id", "bucket"), "left_anti"),
            db0.join(over, Seq("table_id", "bucket"), "left_anti"))
        }
      val candCD = cb.alias("a")
        .join(db.hint("shuffle_hash").alias("b"),
          col("a.table_id") === col("b.table_id") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(
          least(col("a.vec_id"), col("b.vec_id")).as("a_id"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("b_id"))
      val candDD = db.hint("shuffle_hash").alias("a")
        .join(db.alias("b"),
          col("a.table_id") === col("b.table_id") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      val candIds = candCD.unionByName(candDD).distinct().transform(graft.runtime.Ckpt.eager)
      // semi-join-prune the vector table to candidate ENDPOINTS before
      // the cosine verify (the verifyJaccardDf discipline): without it
      // every append re-broadcast the FULL corpus embedding table twice
      // — measured at ×500 (1.02M vecs): append walls ≈ the full-rerun
      // wall (~175 s vs 154 s) instead of delta-proportional
      val candEnds = candIds.select(col("a_id").as("vec_id"))
        .unionByName(candIds.select(col("b_id").as("vec_id")))
        .distinct()
      val eCand = allE.select(col("vec_id"), col("embedding"), col("nrm"))
        .join(candEnds, Seq("vec_id"), "left_semi")
        .transform(graft.runtime.Ckpt.eager)
      val verified = Similarity.verifyCosineOn(eCand, candIds, minCos)
        .transform(graft.runtime.Ckpt.eager) // materialize BEFORE mutating its input tables
      // label resolution reads only IMMUTABLE inputs (the checkpointed
      // verified evidence + the labels/gen-N parquet this mutation never
      // touches), so it can overlap the four artifact writes below that
      // depend only on db0/verified/ledgerRows (guide §2.6) — the labels
      // write itself chains inside the resolving thunk.
      // RECOVERY NOTE (r20 ADVICE #2): see IncrementalDedup.appendToIndex
      // — mode-append probe-table writes overlapping the resolution widen
      // the torn window on failure; the writer-lock + rebuild contract is
      // the recovery path, and the delete path (deleteVectors) resolves
      // BEFORE writing.
      @volatile var newLabels: DataFrame = null
      // write-back (delta-proportional; labels ∝ dup-cluster membership):
      // five INDEPENDENT actions over materialized frames — overlap them
      // (guide §2.6; graft.runtime.Par); visibility is the manifest CAS
      val epoch = m.epochs("pairs") + 1
      val ledgerRows = overLedger.getOrElse {
        import org.apache.spark.sql.types._
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("table_id", IntegerType),
            StructField("bucket", IntegerType))))
      }
      graft.runtime.Par.run(
        () => graft.runtime.IndexStore.writeBucketed(db0, idx.nBuckets,
          s"$dir/${m.path("buckets")}", tableFor(s"$dir/${m.path("buckets")}"),
          "append", "table_id", "bucket"),
        () => graft.runtime.IndexStore.writeBucketed(
          db0.groupBy(col("table_id"), col("bucket")).agg(count(lit(1)).as("cn")),
          idx.nBuckets, s"$dir/${m.path("bucketcounts")}",
          bcntTableFor(s"$dir/${m.path("bucketcounts")}"), "append",
          "table_id", "bucket"),
        () => verified.write.mode("overwrite")
          .parquet(s"$dir/${m.path("pairs")}/epoch-$epoch"),
        () => ledgerRows.select(col("table_id"), col("bucket"))
          .write.mode("overwrite")
          .parquet(s"$dir/${m.path("capledger")}/epoch-$epoch"),
        () => {
          newLabels = DedupResolve.incrementalLabels(idx.labels, verified,
              edgesMaterialized = true)
            .transform(graft.runtime.Ckpt.eager)
          newLabels.write.mode("overwrite").parquet(s"$dir/labels/gen-${m.gen + 1}")
        })
      IndexStatePublisher.publish(dir, m
        .withEntry("labels", s"labels/gen-${m.gen + 1}")
        .withEpoch("pairs", epoch)
        .withEpoch("capledger", epoch)
        .copy(gen = m.gen + 1))
      DedupResolve.keptFromLabels(
          allE.select(col("vec_id").as("doc_id")), newLabels)
        .select(col("doc_id").as("vec_id"))
    }
  }

  /** The persisted cap ledger as one frame: (epoch, table_id, bucket). */
  def readCapLedger(s: SparkSession, dir: String): DataFrame = {
    val m = graft.runtime.IndexStatePublisher.current(dir)
    require(m.pathOpt("capledger").nonEmpty, s"index at $dir has no cap ledger")
    m.epochPaths(dir, "capledger").zipWithIndex
      .map { case (p, e) => s.read.parquet(p).withColumn("epoch", lit(e)) }
      .reduce(_.unionByName(_))
      .select(col("epoch"), col("table_id"), col("bucket"))
  }

  /** The LEDGER-AWARE RERUN for the semantic family (the
    * [[IncrementalSig.rerunWithLedger]] contract plus this family's
    * cosine verify and component resolution): given every vector tagged
    * with its arrival epoch, recompute from scratch the exact KEPT set
    * the capped maintained appends produced. Same monotonicity
    * identity — visible bucket populations only grow, so suppression
    * collapses to the row filter `epoch < firstOver(bucket)` and a
    * mega-bucket suppressed from epoch 0 contributes ZERO rows to the
    * self-join. Spec-pinned equal to the maintained answer; d53 gates
    * the same semantics against the DuckDB epoch-capped oracle.
    */
  def rerunKeptWithLedger(s: SparkSession, dir: String,
      vecsWithEpoch: DataFrame, minCos: Double = MinCos): DataFrame = {
    val m = graft.runtime.IndexStatePublisher.current(dir)
    val meta = graft.runtime.MetaCache.row(s, dir)
    val (nt, bits) =
      if (meta.length >= 3) (meta.getInt(1), meta.getInt(2)) else (NTables, Bits)
    val e = withSigs(vecsWithEpoch, nt, bits).transform(graft.runtime.Ckpt.eager)
    val firstOver = readCapLedger(s, dir)
      .groupBy(col("table_id"), col("bucket"))
      .agg(min(col("epoch")).as("first_over"))
    val b = e.select(col("vec_id"), col("epoch"), posexplode(col("sigs")))
      .withColumnRenamed("pos", "table_id")
      .withColumnRenamed("col", "bucket")
      .join(broadcast(firstOver), Seq("table_id", "bucket"), "left_outer")
      .filter(col("first_over").isNull || col("epoch") < col("first_over"))
      .drop("first_over")
      .transform(graft.runtime.Ckpt.eager)
    val cand = b.alias("a")
      .join(b.hint("shuffle_hash").alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    val verified = Similarity.verifyCosineOn(
      e.select(col("vec_id"), col("embedding"), col("nrm")), cand, minCos)
    DedupResolve.keptFromLabels(
        vecsWithEpoch.select(col("vec_id").as("doc_id")),
        DedupResolve.resolveClusters(verified))
      .select(col("doc_id").as("vec_id"))
  }

  /** The LEDGERED family's compaction: a REBUILD (r18 VERDICT ask #2;
    * see [[IncrementalSig.rebuildLedgered]] for the contract — a
    * scheduled, loud re-derivation over survivors with a fresh epoch-0
    * ledger, never a silent drift). Embeddings are NOT recoverable
    * from the bucket table (buckets are a lossy projection), so the
    * caller supplies `allE` — the surviving vectors as
    * (vec_id, embedding, nrm); a count guard cross-checks it against
    * the tombstone-filtered artifact. Everything re-derives via
    * [[corpusPairsWithLedger]] at the index's pinned geometry into
    * FRESH generation-suffixed directories; the switch is the manifest
    * CAS (tombstone entry dropped) under the writer lock.
    */
  def rebuildLedgered(s: SparkSession, dir: String, allE: DataFrame,
      bucketCap: Int, minCos: Double = MinCos): Unit = {
    import graft.runtime.{IndexManifest, IndexStatePublisher}
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      require(m.pathOpt("capledger").nonEmpty,
        s"semantic index at $dir is not ledgered — use compactIndex")
      val meta = graft.runtime.MetaCache.row(s, dir)
      val (nb, nt, bits) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
      val idx = readIndex(s, dir) // tombstone-filtered views
      val survN = idx.buckets.select(col("vec_id")).distinct().count()
      val gotN = allE.select(col("vec_id")).distinct().count()
      require(gotN == survN,
        s"rebuildLedgered($dir): caller passed $gotN vectors but the index " +
          s"has $survN survivors — the rebuild corpus must be exactly the " +
          "surviving vectors")
      val e = withSigs(allE, nt, bits).transform(graft.runtime.Ckpt.eager)
      val (pairs, over0) = corpusPairsWithLedger(e, bucketCap, minCos)
      val pairsC = pairs.transform(graft.runtime.Ckpt.eager)
      val labels = DedupResolve.resolveClusters(pairsC).transform(graft.runtime.Ckpt.eager)
      val g = m.gen + 1
      val buckets = bucketsOf(e)
      s.sql(s"DROP TABLE IF EXISTS ${tableFor(s"$dir/buckets-g$g")}")
      s.sql(s"DROP TABLE IF EXISTS ${bcntTableFor(s"$dir/bucketcounts-g$g")}")
      graft.runtime.Par.run( // independent writes — overlap (guide §2.6)
        () => graft.runtime.IndexStore.writeBucketed(buckets, nb,
          s"$dir/buckets-g$g", tableFor(s"$dir/buckets-g$g"), "overwrite",
          "table_id", "bucket"),
        () => graft.runtime.IndexStore.writeBucketed(
          buckets.groupBy(col("table_id"), col("bucket")).agg(count(lit(1)).as("cn")),
          nb, s"$dir/bucketcounts-g$g", bcntTableFor(s"$dir/bucketcounts-g$g"),
          "overwrite", "table_id", "bucket"),
        () => labels.write.mode("overwrite").parquet(s"$dir/labels/gen-$g"),
        () => pairsC.write.mode("overwrite").parquet(s"$dir/pairs-g$g/epoch-0"),
        () => over0.select(col("table_id"), col("bucket"))
          .write.mode("overwrite").parquet(s"$dir/capledger-g$g/epoch-0"))
      IndexStatePublisher.publish(dir, IndexManifest(g,
        Map("buckets" -> s"buckets-g$g", "bucketcounts" -> s"bucketcounts-g$g",
          "labels" -> s"labels/gen-$g", "pairs" -> s"pairs-g$g",
          "capledger" -> s"capledger-g$g"),
        Map("pairs" -> 0, "capledger" -> 0)))
    }
  }

  /** Rebuild-time compaction (see [[IncrementalDedup.compactIndex]]):
    * rewrite the bucket table and pair evidence minus tombstoned rows
    * into FRESH generation-suffixed directories, drop the tombstone
    * entry, switch with the manifest CAS. Labels were already rewritten
    * at delete time. Answer-invariant. REFUSED on a ledgered index:
    * the cap ledger is suppression HISTORY — no epoch-collapsed rewrite
    * can preserve the rerun contract (epoch tags in
    * [[rerunKeptWithLedger]] align with the persisted epochs). The
    * ledgered path's compaction is [[rebuildLedgered]] — engine code
    * since r19.
    */
  def compactIndex(s: SparkSession, dir: String): Unit = {
    import graft.runtime.IndexStatePublisher
    IndexStatePublisher.withWriterLock(dir) {
      val m = IndexStatePublisher.current(dir)
      require(m.pathOpt("capledger").isEmpty,
        s"semantic index at $dir is ledgered; compaction would discard the " +
          "cap ledger and break the rerun contract — use " +
          "rebuildLedgered(dir, allE, bucketCap) instead")
      if (m.pathOpt("deleted").nonEmpty) {
        val nb = graft.runtime.MetaCache.row(s, dir).getInt(0)
        val idx = readIndex(s, dir)
        val buckets = idx.buckets.transform(graft.runtime.Ckpt.eager)
        val pairs = idx.pairs.map(_.transform(graft.runtime.Ckpt.eager))
        val g = m.gen + 1
        s.sql(s"DROP TABLE IF EXISTS ${tableFor(s"$dir/buckets-g$g")}")
        graft.runtime.IndexStore.writeBucketed(buckets, nb,
          s"$dir/buckets-g$g", tableFor(s"$dir/buckets-g$g"), "overwrite",
          "table_id", "bucket")
        pairs.foreach(_.write.mode("overwrite").parquet(s"$dir/pairs-g$g"))
        IndexStatePublisher.publish(dir, m.copy(gen = g,
          entries = (m.entries - "deleted") +
            ("buckets" -> s"buckets-g$g") ++
            (if (pairs.nonEmpty) Map("pairs" -> s"pairs-g$g") else Map.empty)))
      }
    }
  }

  /** d45: the oracle-gated composition — corpus = the 80% vec_id split,
    * delta = the 20%; build + persist the bucketed index, reload, run
    * the incremental pass. Oracle = the FULL-corpus rerun at the same
    * pinned geometry ([[semanticAppendSql]]) — hash-matching it is the
    * incremental ≡ full equivalence proof (exact here: fixed bits make
    * corpus buckets count-independent, and the family is uncapped).
    */
  def semanticAppend(s: SparkSession, dir: String): DataFrame = {
    val all = withNrm(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .transform(graft.runtime.Ckpt.eager)
    val corpusE = withSigs(all.filter(col("vec_id") % 5 < 4)).transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incsem")
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(corpusE, DedupResolve.resolveClusters(corpusPairs(corpusE)),
      idxDir, nBuckets = 8)
    appendKept(all, readIndex(s, idxDir), all.filter(col("vec_id") % 5 >= 4))
  }

  /** d49: DELETION from the semantic index — yesterday's index over the
    * whole vector corpus at the pinned geometry (pairs persisted beside
    * the labels: deletion's evidence), then every vec_id ≡ 3 (mod 7) is
    * taken down. Oracle: the full rerun over surviving vectors at the
    * same geometry ([[semanticDeleteSql]]), hash-exact.
    */
  def semanticDelete(s: SparkSession, dir: String): DataFrame = {
    val all = withNrm(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .transform(graft.runtime.Ckpt.eager)
    val corpusE = withSigs(all).transform(graft.runtime.Ckpt.eager)
    val pairs = corpusPairs(corpusE).transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-semdel")
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(corpusE, DedupResolve.resolveClusters(pairs), idxDir,
      nBuckets = 8, pairs = Some(pairs))
    val newLabels = deleteVectors(s, idxDir,
      all.where(col("vec_id") % 7 === 3).select(col("vec_id")))
    DedupResolve.keptFromLabels(
        all.where(col("vec_id") % 7 =!= 3).select(col("vec_id").as("doc_id")),
        newLabels)
      .select(col("doc_id").as("vec_id"))
  }

  /** The frozen-geometry full rerun over survivors: d45's closure shape
    * with the takedown predicate threaded through both the pair CTE and
    * the kept select.
    */
  val semanticDeleteSql: String = {
    val pairsSql = Similarity.signLshPairsSqlFor(8, 4, 0.35,
      vecWhere = "WHERE vec_id % 7 <> 3")
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id % 7 <> 3
       |  AND vec_id NOT IN (SELECT id FROM lbl WHERE id <> cluster)
       |ORDER BY vec_id""".stripMargin
  }

  /** The frozen-geometry full rerun: d16's recursive-closure shape over
    * [[Similarity.signLshPairsSqlFor]] at the pinned (8, 4, 0.35).
    */
  val semanticAppendSql: String = {
    val pairsSql = Similarity.signLshPairsSqlFor(8, 4, 0.35)
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT id FROM lbl WHERE id <> cluster)
       |ORDER BY vec_id""".stripMargin
  }

  /** d53: k CAPPED maintained appends on the SEMANTIC family with a
    * persisted cap ledger — the d51/d52 contract carried to embeddings
    * (r17 VERDICT ask #3: the one family where the capped posture was
    * previously impossible-or-drifting). Base = the vec_id % 4 == 0
    * split built capped ([[corpusPairsWithLedger]]), then three chained
    * capped appends through the maintained index ([[appendToIndex]]),
    * every epoch's suppressed (table_id, bucket) set persisted beside
    * the pairs. The cap is SCALE-ADAPTIVE ([[semLedgerCap]]) so it
    * binds without blanket-suppressing at every verify SF. Answer: the
    * kept vec_ids. Oracle: [[cappedSemanticMultiAppendSql]] — the full
    * rerun under EPOCH-CAPPED semantics (suppression re-derived from
    * running bucket populations, cap re-derived from COUNT(*)),
    * resolved by the recursive-CTE closure. The Scala-side ledger
    * replay ([[rerunKeptWithLedger]]) is additionally spec-pinned
    * equal to the maintained answer.
    */
  def cappedSemanticMultiAppend(s: SparkSession, dir: String): DataFrame = {
    val all = withNrm(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .transform(graft.runtime.Ckpt.eager)
    val cap = semLedgerCap(all.count())
    val base = withSigs(all.filter(col("vec_id") % 4 === 0)).transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incsemled")
    val (pairs0, over0) = corpusPairsWithLedger(base, cap)
    val pairs0c = pairs0.transform(graft.runtime.Ckpt.eager)
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(base, DedupResolve.resolveClusters(pairs0c), idxDir, nBuckets = 8,
      pairs = Some(pairs0c), capLedger0 = Some(over0))
    var kept: DataFrame = null
    (1 to 3).foreach { m =>
      kept = appendToIndex(s, idxDir, all, all.filter(col("vec_id") % 4 === m),
        bucketCap = cap)
    }
    kept
  }

  /** d56: DELETION composed with the capped LEDGERED posture on the
    * SEMANTIC family (r18 VERDICT ask #1 — the embedding half of the
    * d55 contract; see [[IncrementalDedup.cappedLedgerDeleteDedup]] for
    * the full argument). Ledgered capped build (epoch 0 = the
    * vec_id % 3 == 0 split), one capped maintained append (epoch 1), a
    * TAKEDOWN of every already-arrived vec_id ≡ 3 (mod 7) — interleaved
    * between appends, certifying that capped appends AFTER a delete
    * stay rerun-reproducible — then a second capped append (epoch 2).
    * The suppression ledger is population history (the persisted
    * bucket counts keep counting tombstoned rows by design), so the
    * oracle derives suppression from the FULL arrival history and only
    * then restricts pair endpoints and the kept set to survivors; no
    * exact-star channel exists here, so restriction alone is the whole
    * repair. Answer: the kept vec_ids over survivors. The Scala-side
    * ledger replay over survivors is additionally spec-pinned equal.
    */
  def cappedSemanticLedgerDelete(s: SparkSession, dir: String): DataFrame = {
    val all = withNrm(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .transform(graft.runtime.Ckpt.eager)
    val cap = semLedgerCap(all.count())
    val deadPred = col("vec_id") % 7 === 3 && col("vec_id") % 3 <= 1
    val base = withSigs(all.filter(col("vec_id") % 3 === 0)).transform(graft.runtime.Ckpt.eager)
    val idxDir = graft.runtime.IndexStore.tempIndexDir("graft-incsemdl")
    val (pairs0, over0) = corpusPairsWithLedger(base, cap)
    val pairs0c = pairs0.transform(graft.runtime.Ckpt.eager)
    // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
    writeIndex(base, DedupResolve.resolveClusters(pairs0c), idxDir, nBuckets = 8,
      pairs = Some(pairs0c), capLedger0 = Some(over0))
    appendToIndex(s, idxDir, all.filter(col("vec_id") % 3 <= 1),
      all.filter(col("vec_id") % 3 === 1), bucketCap = cap)
    deleteVectors(s, idxDir, all.where(deadPred).select(col("vec_id")))
    appendToIndex(s, idxDir, all.filter(!deadPred),
      all.filter(col("vec_id") % 3 === 2), bucketCap = cap)
  }

  /** The d56 oracle: [[cappedSemanticSqlFor]] at epochMod = 3 with the
    * takedown predicate threaded through (suppression from full
    * history; endpoints and kept set restricted to survivors).
    */
  val cappedSemanticLedgerDeleteSql: String =
    cappedSemanticSqlFor(3, Some("(@ % 7 = 3 AND @ % 3 <= 1)"))

  /** The epoch-capped full-rerun kept-set oracle (see
    * [[cappedSemanticMultiAppend]]): the d45 plane/bucket arithmetic at
    * the pinned (8, 4, 0.35) with vectors carrying `vec_id % epochMod`
    * arrival epochs; a candidate pair is admitted iff some shared
    * (table, bucket)'s population among vectors visible at the pair's
    * birth epoch is within the cap (`pop` re-derives the suppression
    * sets the engine persists — over the FULL arrival history, later
    * deletions included; `cap` re-derives [[semLedgerCap]] from
    * COUNT(*)); admitted candidates run the unchanged cosine verify,
    * components close recursively, kept = min per component. When
    * `deadTemplate` is set (d56 — a predicate with `@` standing for
    * the id column, e.g. `"(@ % 7 = 3 AND @ % 3 <= 1)"`), pair
    * ENDPOINTS and the kept set are restricted to survivors AFTER
    * suppression derives — deletion is an event in the index's life,
    * not a rewrite of its history.
    */
  def cappedSemanticSqlFor(epochMod: Int, deadTemplate: Option[String] = None): String = {
    val (nTables, bits, minCos) = (NTables, Bits, MinCos)
    def dead(ref: String): Option[String] = deadTemplate.map(_.replace("@", ref))
    val candDead = deadTemplate.map(_ =>
      s"\n    AND NOT ${dead("a.vec_id").get} AND NOT ${dead("b.vec_id").get}").getOrElse("")
    val keptDead = deadTemplate.map(_ => s"NOT ${dead("vec_id").get}\n  AND ").getOrElse("")
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings),
       |cap AS (
       |  SELECT GREATEST(1, CAST(FLOOR(0.75 * COUNT(*) / ${1 << bits}) AS BIGINT)) AS cap
       |  FROM embeddings),
       |planes AS MATERIALIZED (
       |  SELECT j, i,
       |    (((${Hashing.sqlHash60("j||':'||i")}) % 2000) - 1000)/1000.0 AS w
       |  FROM range(0, ${nTables * bits}) t1(j), range(0, 64) t2(i)),
       |dots AS (
       |  SELECT e.vec_id, p.j, SUM(e.v[p.i + 1] * p.w) AS d
       |  FROM e, planes p GROUP BY e.vec_id, p.j),
       |buckets AS (
       |  SELECT vec_id, vec_id % $epochMod AS epoch, j // $bits AS table_id,
       |    SUM(CASE WHEN d >= 0 THEN (1 << (j % $bits)) ELSE 0 END) AS bucket
       |  FROM dots GROUP BY vec_id, j // $bits),
       |pop AS (
       |  SELECT x.table_id, x.bucket, kk.k AS pe, COUNT(*) AS cnt
       |  FROM buckets x JOIN range(0, $epochMod) kk(k) ON x.epoch <= kk.k
       |  GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM buckets a
       |  JOIN buckets b
       |    ON a.table_id = b.table_id AND a.bucket = b.bucket
       |      AND a.vec_id < b.vec_id
       |  JOIN pop p ON p.table_id = a.table_id AND p.bucket = a.bucket
       |    AND p.pe = greatest(a.epoch, b.epoch)
       |  WHERE p.cnt <= (SELECT cap FROM cap)$candDead),
       |pairs AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.a_id
       |  JOIN e eb ON eb.vec_id = c.b_id
       |  WHERE list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm) >= $minCos),
       |edges AS (
       |  SELECT a_id AS a, b_id AS b FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
       |SELECT vec_id FROM embeddings
       |WHERE ${keptDead}vec_id NOT IN (SELECT id FROM lbl WHERE id <> cluster)
       |ORDER BY vec_id""".stripMargin
  }

  /** The d53 oracle: [[cappedSemanticSqlFor]] at epochMod = 4, no
    * takedown.
    */
  val cappedSemanticMultiAppendSql: String = cappedSemanticSqlFor(4)
}

/** Incremental corpus-append decontamination (d36's sketch ladder with
  * persisted artifacts — see [[IncrementalSig]]'s class doc).
  */
object IncrementalContam {

  /** The persisted artifacts: the benchmark's Bloom sketch (bytes on
    * disk — `BloomFilter.writeTo`), the exact gram table bucketed by gk
    * (the verify join's build side arrives pre-clustered), and
    * yesterday's per-document spans.
    */
  final case class ContamIndex(
      bloom: org.apache.spark.util.sketch.BloomFilter,
      grams: DataFrame,
      spans: DataFrame)

  private def tableFor(dir: String): String =
    graft.runtime.IndexStore.tableFor("graft_contam_grams_", dir)

  def writeIndex(idx: ContamIndex, dir: String, nBuckets: Int = 32): Unit = {
    val s = idx.grams.sparkSession
    val out = new java.io.FileOutputStream(s"$dir/bloom.bin")
    try idx.bloom.writeTo(out) finally out.close()
    s.sql(s"DROP TABLE IF EXISTS ${tableFor(dir)}")
    graft.runtime.Par.run( // independent writes — overlap (guide §2.6)
      () => graft.runtime.IndexStore.writeBucketed(idx.grams, nBuckets,
        s"$dir/grams", tableFor(dir), "overwrite", "gk"),
      () => idx.spans.write.mode("overwrite").parquet(s"$dir/spans"),
      () => s.range(1).selectExpr(s"$nBuckets AS n_buckets")
        .write.mode("overwrite").parquet(s"$dir/meta"))
    graft.runtime.MetaCache.invalidate(dir) // meta just (re)written
  }

  def readIndex(s: SparkSession, dir: String): ContamIndex = {
    val nb = graft.runtime.MetaCache.row(s, dir).getInt(0)
    val in = new java.io.FileInputStream(s"$dir/bloom.bin")
    val bloom =
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      finally in.close()
    ContamIndex(bloom,
      graft.runtime.IndexStore.ensureBucketedTable(s, tableFor(dir),
        "gk BIGINT", "gk", nb, s"$dir/grams"),
      s.read.parquet(s"$dir/spans"))
  }

  /** d43: incremental corpus-append decontamination under the d29/d36
    * split (every 10th doc is the benchmark stand-in). Yesterday's
    * corpus = the non-bench docs with doc_id % 5 ≠ 4; today's delta =
    * doc_id % 5 == 4 (never a bench doc). Spans are per-document
    * independent, so yesterday's spans ∪ the delta's spans through the
    * LOADED sketch + bucketed gram table is exactly the full rerun —
    * oracle = d29's exact-span SQL ([[SpanDedup.contamSpansSqlFor]]),
    * the same one d36 is gated on (three plans, one answer).
    */
  def appendDecontam(s: SparkSession, dir: String, minTokens: Int = 8): DataFrame = {
    val k = minTokens
    val docs = Tables.documents(s, dir)
    val bench = docs.where(col("doc_id") % 10 === 0)
    val trainOld = docs.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 5 =!= 4)
    val delta = docs.where(col("doc_id") % 5 === 4)
    val bgrams = SpanDedup.benchGrams(bench, k)
    bgrams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxDir =
      try {
        val bloom = bgrams.stat.bloomFilter("gk", math.max(bgrams.count(), 1L), 0.01)
        val spansOld = SpanDedup.contamIslands(
          SpanDedup.contamHitsWithSketch(trainOld, bloom, bgrams, k), k)
        val d = graft.runtime.IndexStore.tempIndexDir("graft-inccontam")
        // nBuckets = 8 at the gate (layout knob; see IncrementalDedup.appendDedup)
        writeIndex(ContamIndex(bloom, bgrams, spansOld), d, nBuckets = 8)
        d
      } finally bgrams.unpersist(false)
    val idx = readIndex(s, idxDir)
    idx.spans.unionByName(
      SpanDedup.contamIslands(
        SpanDedup.contamHitsWithSketch(delta, idx.bloom, idx.grams, k), k))
  }

  val appendDecontamSql: String = SpanDedup.contamSpansSqlFor(8)
}
