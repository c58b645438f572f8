package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mr.TestSession

/** Semantics of the incremental corpus-append dedup (d39): the
  * incremental pass over persisted corpus artifacts must produce the
  * EXACT kept-set of a full-corpus rerun — including the hard case
  * where a delta doc bridges two previously-distinct corpus clusters.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  // fixture: two corpus clusters {A=0, B=1} and {C=2, D=3} (the shared
  // base makes within-cluster Jaccard ≥ 0.8 while the distinct suffixes
  // hold the cross-cluster Jaccard ≈ 0.75 < 0.8), a delta bridge E=4
  // (the bare base: ≈ 0.85 to both clusters — legal by the Jaccard
  // triangle inequality only because 0.85 < 0.9), an exact corpus
  // duplicate F=9 of G=5, a unique delta doc H=14, and a delta-only
  // near-dup pair I1=19/I2=24. 8 bands of 4 rows (the d19 grid point)
  // so banding recall at J ≈ 0.85 is ≈ 1 − (1 − 0.85⁴)⁸ ≈ 0.998.
  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seventeen green turtles carry shiny pebbles across the quiet river " +
    "bank at dawn"
  private val base2 = "nine silver airships drift slowly beneath amber " +
    "clouds carrying quiet passengers toward the distant harbor lights " +
    "of an old coastal town"
  private val fixture = Seq(
    (0L, base + " alpha beta gamma tree"),
    (1L, base + " alpha beta gamma tree!"),
    (2L, base + " bravo charlie delta two"),
    (3L, base + " bravo charlie delta two ok"),
    (4L, base),
    (5L, "completely unrelated corpus document about cooking bread"),
    (9L, "completely unrelated corpus document about cooking bread"),
    (14L, "a unique delta document that resembles nothing else here"),
    (19L, base2),
    (24L, base2 + " xx")
  )
  private def docsDf = fixture.toDF("doc_id", "text")
  private def corpusDf = docsDf.where(col("doc_id") % 5 < 4)
  private def deltaDf = docsDf.where(col("doc_id") % 5 >= 4)

  private def keptIncremental(idx: IncrementalDedup.CorpusIndex): Set[Long] =
    IncrementalDedup.appendKept(docsDf, idx, deltaDf, rowsPerBand = 4)
      .as[Long].collect().toSet

  private def keptFull: Set[Long] = {
    val pairs = Dedup.lshVerifiedPairsDf(docsDf, rowsPerBand = 4)
      .select(col("a_id"), col("b_id"))
    DedupResolve.dedupedDocIds(spark, docsDf, pairs).as[Long].collect().toSet
  }

  test("incremental == full rerun on the bridge fixture, and the bridge merges clusters") {
    val idx = IncrementalDedup.buildIndex(corpusDf, rowsPerBand = 4).checkpointed()
    // yesterday's corpus run really did see TWO clusters ({5} pairs with
    // nothing corpus-side: its exact twin 9 arrives in the DELTA)
    val corpusClusters = idx.labels.select("cluster").as[Long].collect().toSet
    assert(corpusClusters == Set(0L, 2L),
      s"corpus resolution should be {0,1},{2,3}: got reps $corpusClusters")
    val inc = keptIncremental(idx)
    // E bridges {0,1} and {2,3}: one component keeps 0 only; F drops
    // with keeper 5; H survives alone; I2 drops with keeper 19
    assert(inc == Set(0L, 5L, 14L, 19L), s"kept: $inc")
    assert(inc == keptFull, "incremental and full-rerun kept sets diverged")
  }

  test("artifacts round-trip through parquet and serve the same answer") {
    val tmp = java.nio.file.Files.createTempDirectory("incdedup").toString
    try {
      IncrementalDedup.writeIndex(
        IncrementalDedup.buildIndex(corpusDf, rowsPerBand = 4), tmp, rowsPerBand = 4)
      val loaded = IncrementalDedup.readIndex(spark, tmp)
      // the loaded index carries the bucketed probe tables + geometry
      assert(loaded.bands.nonEmpty && loaded.bandCounts.nonEmpty)
      assert(loaded.bandK == 32 && loaded.bandRows == 4)
      assert(keptIncremental(loaded) == Set(0L, 5L, 14L, 19L),
        "loaded-artifact path diverged from the in-memory path")
      // a mismatched band geometry must fall back to sigs, not mis-join:
      // rowsPerBand = 8 over the same loaded index still equals the
      // full rerun at that geometry
      val inc8 = IncrementalDedup.appendKept(docsDf, loaded, deltaDf)
        .as[Long].collect().toSet
      val full8 = {
        val pairs = Dedup.lshVerifiedPairsDf(docsDf)
          .select(col("a_id"), col("b_id"))
        DedupResolve.dedupedDocIds(spark, docsDf, pairs).as[Long].collect().toSet
      }
      assert(inc8 == full8,
        "mismatched-geometry fallback diverged from the full rerun")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("capped incremental pass with persisted band counts equals capped full semantics on a clean fixture") {
    // no bucket here exceeds cap=32, so the capped pass must equal the
    // uncapped answer exactly — through the PERSISTED bandcounts path
    val tmp = java.nio.file.Files.createTempDirectory("incdedupcap").toString
    try {
      IncrementalDedup.writeIndex(
        IncrementalDedup.buildIndex(corpusDf, rowsPerBand = 4), tmp, rowsPerBand = 4)
      val loaded = IncrementalDedup.readIndex(spark, tmp)
      val kept = IncrementalDedup.appendKept(docsDf, loaded, deltaDf,
          rowsPerBand = 4, bucketCap = 32)
        .as[Long].collect().toSet
      assert(kept == Set(0L, 5L, 14L, 19L), s"capped kept: $kept")
      // and a cap of 1 drops every multi-member bucket: banded evidence
      // vanishes, only exact-hash stars remain (F=9 still drops)
      val kept1 = IncrementalDedup.appendKept(docsDf, loaded, deltaDf,
          rowsPerBand = 4, bucketCap = 1)
        .as[Long].collect().toSet
      assert(!kept1.contains(9L), "exact-dup star must survive any cap")
      assert(kept1.contains(24L), "cap=1 should drop the banded near-dup evidence")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("persisted band table joins bucket-aware: corpus side is exchange-free") {
    // the r15 delta-proportionality claim, pinned at the plan level: the
    // corpus–delta band join reads the BUCKETED persisted table directly
    // (no Exchange above the corpus scan); only the delta side shuffles
    val tmp = java.nio.file.Files.createTempDirectory("incdedupplan").toString
    try {
      IncrementalDedup.writeIndex(
        IncrementalDedup.buildIndex(corpusDf, rowsPerBand = 4), tmp, rowsPerBand = 4)
      val loaded = IncrementalDedup.readIndex(spark, tmp)
      val deltaBands = Dedup.bandsOf(
        deltaDf.select(col("doc_id"),
          graft.functions.MinHashSig(col("text"), 5, 32).as("sig")), 32, 4)
      val j = loaded.bands.get.alias("a")
        .join(deltaBands.hint("shuffle_hash").alias("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
            col("a.doc_id") =!= col("b.doc_id"))
      val p = j.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("ReusedExchange"))
      assert(exchanges == 1, s"expected ONE exchange (the delta side), plan:\n$p")
      assert(p.contains("Bucketed: true"),
        s"corpus band scan is not a bucketed read, plan:\n$p")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("d39 on the shipped corpus: incremental equals the full d14 pipeline") {
    val inc = IncrementalDedup.appendDedup(spark, sf).as[Long].collect().toSeq
    val full = DedupResolve.corpusDedupPipeline(spark, sf).as[Long].collect().toSeq
    assert(inc == full, "d39 diverged from the full-corpus rerun")
  }
}
