package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mr.TestSession

/** Semantics of the incremental bit-signature append arms (d42/m08) and
  * the incremental decontamination (d43): persisted-probe answers must
  * equal the full rerun exactly, and the persisted band table must join
  * bucket-aware (the delta-proportionality claim at the plan level).
  */
class IncrementalSigSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def simSigs(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id"), graft.functions.SimHashSig(col("text"), 32).as("sig"))
    .where(col("sig") =!= lit(graft.functions.SimHashSig.Empty))

  test("d42: incremental simhash pairs equal the full-rerun banded join") {
    val docs = graft.Tables.documents(spark, sf)
    val inc = IncrementalSig.simhashAppend(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    val full = IncrementalSig.buildPairs(simSigs(docs), 32, 4, 7)
      .as[(Long, Long, Int)].collect().toSet
    assert(inc == full)
  }

  test("m08: incremental phash pairs equal the full-rerun (all-pairs by pigeonhole)") {
    val sigs = Multimodal.perceptualHash(Multimodal.mediaTable(spark, sf))
      .toDF().withColumnRenamed("phash", "sig")
    val inc = IncrementalSig.phashAppend(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    val full = IncrementalSig.buildPairs(sigs, 60, 6, 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(inc == full)
  }

  test("sig index: persisted band table joins bucket-aware (one exchange, the delta side)") {
    val docs = graft.Tables.documents(spark, sf)
    val corpusSigs = simSigs(docs.where(col("doc_id") % 5 < 4))
    val tmp = java.nio.file.Files.createTempDirectory("incsigplan").toString
    try {
      IncrementalSig.writeIndex(corpusSigs,
        IncrementalSig.buildPairs(corpusSigs, 32, 4, 7), tmp, 32, 4)
      val idx = IncrementalSig.readIndex(spark, tmp)
      assert(idx.bits == 32 && idx.nBands == 4)
      val p = IncrementalSig.appendPairs(idx,
          simSigs(docs.where(col("doc_id") % 5 >= 4)), 7)
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"),
        s"corpus band scan is not a bucketed read:\n$p")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("capped append with persisted band counts equals the capped full rerun on a clean fixture") {
    // at a cap no fixture bucket exceeds, the capped incremental pass
    // (persisted-counts path) must equal both the uncapped answer and
    // the capped full rerun exactly
    val docs = graft.Tables.documents(spark, sf)
    val corpusSigs = simSigs(docs.where(col("doc_id") % 5 < 4))
    val tmp = java.nio.file.Files.createTempDirectory("incsigcap").toString
    try {
      IncrementalSig.writeIndex(corpusSigs,
        IncrementalSig.buildPairs(corpusSigs, 32, 4, 7, bucketCap = 1000), tmp, 32, 4)
      val idx = IncrementalSig.readIndex(spark, tmp)
      assert(idx.bandCounts.nonEmpty)
      val deltaSigs = simSigs(docs.where(col("doc_id") % 5 >= 4))
      val capped = IncrementalSig.appendPairs(idx, deltaSigs, 7, bucketCap = 1000)
        .as[(Long, Long, Int)].collect().toSet
      val fullCapped = IncrementalSig.buildPairs(simSigs(docs), 32, 4, 7, bucketCap = 1000)
        .as[(Long, Long, Int)].collect().toSet
      assert(capped == fullCapped)
      // and a tight cap drops banded evidence on BOTH arms' semantics:
      // the capped append is a subset of the uncapped answer
      val tight = IncrementalSig.appendPairs(idx, deltaSigs, 7, bucketCap = 1)
        .as[(Long, Long, Int)].collect().toSet
      assert(tight.subsetOf(capped))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("d48: tombstoned docs leave every artifact, and appends cannot resurrect them") {
    val docs = graft.Tables.documents(spark, sf)
    val sigs = simSigs(docs)
    val tmp = java.nio.file.Files.createTempDirectory("sigdel").toString
    try {
      IncrementalSig.writeIndex(sigs, IncrementalSig.buildPairs(sigs, 32, 4, 7),
        tmp, 32, 4, nBuckets = 8)
      val del = docs.where(col("doc_id") % 7 === 3).select(col("doc_id"))
      IncrementalSig.deleteDocs(spark, tmp, del)
      val idx = IncrementalSig.readIndex(spark, tmp)
      // deletion == full rerun on survivors (uncapped banding is
      // per-doc deterministic, so survivor pairs are exactly the
      // restriction)
      val survivors = docs.where(col("doc_id") % 7 =!= 3)
      val full = IncrementalSig.buildPairs(simSigs(survivors), 32, 4, 7)
        .as[(Long, Long, Int)].collect().toSet
      val inc = idx.pairs.as[(Long, Long, Int)].collect().toSet
      assert(inc == full, "tombstone-filtered pairs diverged from the survivor rerun")
      // the band table no longer serves deleted docs: a later APPEND of
      // a delta cannot pair against them
      assert(idx.bands.filter(col("doc_id") % 7 === 3).count() == 0)
      val appended = IncrementalSig.appendPairs(idx,
          simSigs(docs.where(col("doc_id") % 7 =!= 3)
            .limit(0)) // empty delta: append must return exactly the filtered state
          , 7)
        .as[(Long, Long, Int)].collect().toSet
      assert(appended == full, "empty append changed the tombstone-filtered answer")
      // compaction: same answer, tombstones physically gone
      IncrementalSig.compactIndex(spark, tmp)
      assert(graft.runtime.IndexStatePublisher.current(tmp).pathOpt("deleted").isEmpty)
      val idx2 = IncrementalSig.readIndex(spark, tmp)
      assert(idx2.pairs.as[(Long, Long, Int)].collect().toSet == full,
        "compaction changed the pair answer")
      assert(idx2.bands.filter(col("doc_id") % 7 === 3).count() == 0,
        "compaction left tombstoned band rows on disk")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("d43: incremental decontamination equals the exact full-rerun spans") {
    val docs = graft.Tables.documents(spark, sf)
    val inc = IncrementalContam.appendDecontam(spark, sf)
      .as[(Long, Int, Int, Int)].collect().toSet
    val full = SpanDedup.contamSpans8(spark, sf)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(inc == full)
  }
}
