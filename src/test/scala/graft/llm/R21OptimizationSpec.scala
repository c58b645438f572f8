package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mr.TestSession

/** Focused pins for the round-21 optimization internals: the per-dir
  * meta-read cache ([[graft.runtime.MetaCache]]), the enriched
  * [[graft.runtime.Par]] failure contract (suppressed siblings), the
  * resolve-before-write delete paths (deleteVectors / deleteFromIndex
  * return labels identical to the published artifact), and the
  * CpSlot-compatible checkpoint clamp (clamped frames keep the bare
  * LogicalRDD plan the BPE release machinery pattern-matches).
  */
class R21OptimizationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("MetaCache: caches per dir, invalidate picks up a rewrite") {
    val dir = graft.runtime.IndexStore.tempIndexDir("graft-metacache")
    spark.range(1).selectExpr("42 AS n_buckets", "8 AS n_tables", "4 AS bits")
      .write.mode("overwrite").parquet(s"$dir/meta")
    graft.runtime.MetaCache.invalidate(dir)
    val r1 = graft.runtime.MetaCache.row(spark, dir)
    assert(r1.getInt(0) == 42 && r1.getInt(1) == 8 && r1.getInt(2) == 4)
    // second read is served from the cache: the SAME Row instance
    val r2 = graft.runtime.MetaCache.row(spark, dir)
    assert(r1 eq r2, "second meta read must hit the cache")
    // a rewrite + invalidate is visible; without invalidate it would not be
    spark.range(1).selectExpr("7 AS n_buckets", "8 AS n_tables", "4 AS bits")
      .write.mode("overwrite").parquet(s"$dir/meta")
    assert(graft.runtime.MetaCache.row(spark, dir).getInt(0) == 42,
      "stale-by-design until invalidated")
    graft.runtime.MetaCache.invalidate(dir)
    assert(graft.runtime.MetaCache.row(spark, dir).getInt(0) == 7)
  }

  test("Par.run: sibling failures are attached as suppressed, not swallowed") {
    val e = intercept[RuntimeException] {
      graft.runtime.Par.run(
        () => throw new RuntimeException("first"),
        () => { Thread.sleep(30); throw new IllegalStateException("second") },
        () => ())
    }
    val all = (e.getMessage +: e.getSuppressed.toSeq.map(_.getMessage)).toSet
    assert(all == Set("first", "second"),
      s"one failure rethrown, the other suppressed; got $all")
  }

  test("deleteVectors: returned labels equal the published artifact (resolve-before-write)") {
    val sf = "/root/testdata/sf0.001"
    val all = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.functions.FloatVecDot(col("embedding"), col("embedding"))))
      .transform(graft.runtime.Ckpt.eager)
    val corpusE = all
      .withColumn("sigs", graft.functions.SignLshBuckets(col("embedding"), 8, 4))
      .transform(graft.runtime.Ckpt.eager)
    val pairs = IncrementalSemantic.corpusPairs(corpusE).transform(graft.runtime.Ckpt.eager)
    val tmp = java.nio.file.Files.createTempDirectory("semdelr21").toString
    try {
      IncrementalSemantic.writeIndex(corpusE, DedupResolve.resolveClusters(pairs),
        tmp, nBuckets = 8, pairs = Some(pairs))
      val ret = IncrementalSemantic.deleteVectors(spark, tmp,
        all.where(col("vec_id") % 7 === 3).select(col("vec_id")))
      val m = graft.runtime.IndexStatePublisher.current(tmp)
      assert(m.gen == 1 && m.pathOpt("deleted").nonEmpty,
        "delete must advance the manifest and record tombstones")
      val onDisk = spark.read.parquet(s"$tmp/${m.path("labels")}")
      val retSet = ret.as[(Long, Long)].collect().toSet
      val diskSet = onDisk.as[(Long, Long)].collect().toSet
      assert(retSet == diskSet,
        "returned labels must be exactly the published label artifact")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("clamped checkpoint keeps the bare-LogicalRDD shape CpSlot releases") {
    import org.apache.spark.sql.execution.LogicalRDD
    // build a frame whose inherited estimate EXCEEDS the cap (chained
    // checkpointed self-joins — the compounding shape), so the clamp's
    // rebuild branch actually fires, then verify the released contract
    var cur = spark.range(64).toDF("id").transform(graft.runtime.Ckpt.eager)
    (1 to 4).foreach { _ =>
      val r = cur.select(col("id").as("rid"))
      cur = cur.join(r, col("id") === col("rid"))
        .select(col("id"))
        .transform(graft.runtime.Ckpt.eager)
    }
    cur.queryExecution.logical match {
      case lr: LogicalRDD =>
        assert(lr.stats.sizeInBytes <= graft.runtime.Ckpt.CapBytes)
        // the BPE CpSlot release path: unpersist through the plan's own RDD
        lr.rdd.unpersist(false)
        assert(lr.rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
          "clamped checkpoint's RDD must be releasable through the plan")
      case other => fail(s"clamped checkpoint must stay a bare LogicalRDD, got $other")
    }
  }
}
