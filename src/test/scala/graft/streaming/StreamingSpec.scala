package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.mr.TestSession
import graft.queries.Relational

/** Streaming ≡ batch equivalence: drive each continuous query to
  * completion over the parquet-backed source (memory sink +
  * processAllAvailable) and compare with the batch plan over the same
  * data.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts equal the batch time-window query") {
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select($"window_start", $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      val batch = Relational.timeWindow(spark, sf)
        .select($"window_start", $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup collapses a doubled source to unique events") {
    // stage a source dir with TWO links to the same file: every event is
    // delivered twice, like an at-least-once source redelivery
    val d = java.nio.file.Files.createTempDirectory("graft-dup-stream")
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    java.nio.file.Files.createSymbolicLink(d.resolve("b.parquet"), src)
    val physical = EventStream.physicalTsType(spark, s"$sf/events.parquet")
    val doubled = EventStream.normalizeTs(
      spark.readStream
        .schema(EventStream.eventsRawSchema(physical))
        .parquet(d.toString),
      physical)
    val q = EventStream.dedupedEvents(doubled)
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[Long].head()
      val expected = graft.Tables.events(spark, sf).count()
      assert(got == expected, s"got $got, expected $expected unique events")
    } finally q.stop()
  }

  test("checkpointed file sink restarts exactly-once (no duplicate output)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ckpt-src")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString + "/data"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt-meta").toString
    val physical = EventStream.physicalTsType(spark, s"$sf/events.parquet")
    def start() = spark.readStream
      .schema(EventStream.eventsRawSchema(physical))
      .parquet(srcDir.toString)
      .select($"event_id", $"user_id")
      .writeStream
      .option("checkpointLocation", ckptDir)
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val expected = graft.Tables.events(spark, sf).count()
    assert(spark.read.parquet(outDir).count() == expected)
    // restart from the checkpoint over the same (fully-consumed) source:
    // the commit log must prevent reprocessing — still exactly one copy
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(outDir).count() == expected)
  }

  test("stream-static join enriches every event with its dimension row") {
    val dim = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment")
    val q = EventStream.enrichedEvents(EventStream.readEvents(spark, sf), dim)
      .groupBy($"c_mktsegment").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .as[(String, Long)].collect().toMap
      val batch = graft.Tables.events(spark, sf)
        .join(dim, $"user_id" === $"c_custkey", "left")
        .groupBy($"c_mktsegment").count()
        .as[(String, Long)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful streaming sessionization equals the batch window query") {
    val q = EventStream.sessionCountsStream(spark, sf)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .start()
    try {
      q.processAllAvailable()
      // append mode may emit one row per trigger per user; keep the last
      // (max) session count per user
      val streamed = spark.table("sess_out")
        .groupBy($"user_id").agg(max($"n_sessions").as("n_sessions"))
        .as[(Long, Long)].collect().toSet
      val batch = Relational.sessionize(spark, sf)
        .select($"user_id", $"n_sessions")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermarked corpus dedup drops cross-batch re-deliveries within the horizon") {
    // two links to the same corpus file, one file per micro-batch: the
    // second batch's docs are pure re-deliveries and must dedup via the
    // WATERMARKED state (dropDuplicatesWithinWatermark), not batch-local
    // distinct — this is the bounded-state form the module documents
    val d = java.nio.file.Files.createTempDirectory("graft-docs-wm")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    java.nio.file.Files.createSymbolicLink(d.resolve("b.parquet"), src)
    val doubled = spark.readStream
      .schema(DocStream.docsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(d.toString)
      // off-epoch base: a doc_id-0 timestamp of exactly epoch 0 would be
      // filtered as late against the operator's initial zero watermark
      .withColumn("ingest_ts", timestamp_micros(($"doc_id" + 86400L) * 1000000L))
    val q = DocStream.ingestedBounded(doubled)
      .select($"doc_id", $"char_gini")
      .writeStream.outputMode("append")
      .format("memory").queryName("docs_wm_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("docs_wm_out").count()
      val expected = graft.Tables.documents(spark, sf)
        .select(md5($"text".cast("binary"))).distinct().count()
      assert(got == expected, s"got $got, expected $expected")
    } finally q.stop()
  }

  test("streaming curation scrub equals the batch scrub across micro-batches (planted PII)") {
    // two links, one file per trigger -> TWO micro-batches of the same
    // planted-PII corpus; scrubbed() is stateless, so the stream output
    // must be exactly two copies of the batch scrub, value-identical
    val d = java.nio.file.Files.createTempDirectory("graft-docs-scrub")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    java.nio.file.Files.createSymbolicLink(d.resolve("b.parquet"), src)
    def planted(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("text", graft.llm.Pii.plantCol)
    val stream = DocStream.scrubbed(planted(
      spark.readStream.schema(DocStream.docsSchema)
        .option("maxFilesPerTrigger", 1).parquet(d.toString)))
    val q = stream.select($"doc_id", $"n_pii", $"quality", $"text")
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_out")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("scrub_out")
      val batch = DocStream.scrubbed(planted(graft.Tables.documents(spark, sf)))
        .select($"doc_id", $"n_pii", $"quality", $"text")
      assert(out.count() == 2 * batch.count(),
        s"stream ${out.count()} vs 2x batch ${batch.count()}")
      val streamedSet = out.distinct().as[(Long, Int, Double, String)].collect().toSet
      val batchSet = batch.as[(Long, Int, Double, String)].collect().toSet
      assert(streamedSet == batchSet, "scrubbed rows differ between stream and batch")
      // the planted PII actually exercised the scrub in-stream
      assert(batchSet.exists(_._2 > 0), "no PII redacted — planting broken")
      assert(batchSet.forall(r => !r._4.contains("@mail.example.com")),
        "redaction left a planted email in the stream")
    } finally q.stop()
  }

  test("streaming repetition cut equals batch and drops an injected repeater") {
    // corpus file + one crafted file: a quality-passing doc whose bigram
    // repetition trips the cut, and a clean control that must survive
    val d = java.nio.file.Files.createTempDirectory("graft-docs-repgate")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    // the landing dir holds PLAIN parquet files (documents.parquet is a
    // single file, not a Spark output dir), so stage the injected docs'
    // part file as a sibling plain file
    val stage = java.nio.file.Files.createTempDirectory("graft-docs-repgate-stage")
    Seq(
      (900001L, "the fox is near a stone wall and the fox runs to a big tree now", "en", "inj", 64L),
      (900002L, "the red owl sat on a tall oak and then flew to this far barn", "en", "inj", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = java.nio.file.Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    java.nio.file.Files.copy(part, d.resolve("b.parquet"))
    val stream = DocStream.repetitionGated(
      spark.readStream.schema(DocStream.docsSchema)
        .option("maxFilesPerTrigger", 1).parquet(d.toString),
      repK = 2, repMax = 0.1)
    val q = stream.select($"doc_id", $"dup_covered", $"quality")
      .writeStream.outputMode("append")
      .format("memory").queryName("repgate_out")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("repgate_out").as[(Long, Int, Double)].collect()
      val batch = DocStream.repetitionGated(
          graft.Tables.documents(spark, sf), repK = 2, repMax = 0.1)
        .select($"doc_id", $"dup_covered", $"quality")
        .as[(Long, Int, Double)].collect()
      // parity on the corpus part (stateless stage: same rows, any batching)
      assert(out.filterNot(_._1 >= 900000L).toSet == batch.toSet,
        "repetition-gated rows differ between stream and batch")
      // the repeater ("the fox" x2 = 4 of 16 tokens > 0.1) died in-stream;
      // the control survived with zero coverage
      assert(!out.exists(_._1 == 900001L), "repetitive doc passed the cut")
      assert(out.exists(r => r._1 == 900002L && r._2 == 0), "control doc lost")
    } finally q.stop()
  }

  test("scrub composes with lifetime dedup in-stream (scrubbedIngested)") {
    val d = java.nio.file.Files.createTempDirectory("graft-docs-scrubdedup")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    java.nio.file.Files.createSymbolicLink(d.resolve("b.parquet"), src)
    val stream = DocStream.scrubbedIngested(
      spark.readStream.schema(DocStream.docsSchema)
        .option("maxFilesPerTrigger", 1).parquet(d.toString)
        .withColumn("text", graft.llm.Pii.plantCol))
    val q = stream.select($"doc_id", $"n_pii", $"quality")
      .writeStream.outputMode("append")
      .format("memory").queryName("scrubdedup_out")
      .start()
    try {
      q.processAllAvailable()
      // the doubled deliveries collapse on the SCRUBBED content hash:
      // one survivor per distinct redacted text that passed the gate
      val expected = DocStream.scrubbed(
        graft.Tables.documents(spark, sf).withColumn("text", graft.llm.Pii.plantCol))
        .select(md5($"text".cast("binary"))).distinct().count()
      assert(spark.table("scrubdedup_out").count() == expected)
    } finally q.stop()
  }

  test("streaming contamination gate: no false negatives vs d29, parity with batch") {
    val docs = graft.Tables.documents(spark, sf)
    val bench = docs.where($"doc_id" % 10 === 0)
    val k = 8
    // the sketch a production ingest would build once per benchmark drop
    val bgrams = bench
      .select(graft.llm.Hashing.tokens($"text").as("t"))
      .where(size($"t") >= k)
      .select(explode(transform(sequence(lit(1), size($"t") - (k - 1)),
        i => graft.llm.Hashing.hash60(concat_ws(" ", slice($"t", i, lit(k))))))
        .as("gk")).distinct()
    val bloom = bgrams.stat.bloomFilter("gk", math.max(bgrams.count(), 1L), 0.01)

    val d = java.nio.file.Files.createTempDirectory("graft-docs-contam")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    val stream = DocStream.contamFlagged(
      spark.readStream.schema(DocStream.docsSchema).parquet(d.toString)
        .where($"doc_id" % 10 =!= 0), bloom, k)
    val q = stream.select($"doc_id", $"n_contam_cand")
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("contam_out")
        .as[(Long, Int)].collect().toMap
      // parity: the same expression tree over the same rows in batch
      val batch = DocStream.contamFlagged(docs.where($"doc_id" % 10 =!= 0), bloom, k)
        .select($"doc_id", $"n_contam_cand").as[(Long, Int)].collect().toMap
      assert(got == batch, "stream/batch contamination gate disagree")
      // zero false negatives: every doc d29 finds spans in is flagged here
      val flaggedTruth = graft.llm.SpanDedup.contamSpans(spark, sf, k)
        .select($"doc_id").as[Long].collect().toSet
      assert(flaggedTruth.nonEmpty, "fixture has no contamination — gate untested")
      flaggedTruth.foreach(id =>
        assert(got(id) > 0, s"doc $id contaminated but not flagged"))
      // and the clean path is the common path (the gate filters for real)
      val flagged = got.count(_._2 > 0)
      assert(flagged < got.size / 2, s"$flagged of ${got.size} flagged")
    } finally q.stop()
  }

  test("streaming corpus ingestion dedups a doubled source; fused exprs run in-stream") {
    // two links to the same corpus file = every document delivered twice
    val d = java.nio.file.Files.createTempDirectory("graft-docs-dup")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    java.nio.file.Files.createSymbolicLink(d.resolve("b.parquet"), src)
    val doubled = spark.readStream.schema(DocStream.docsSchema).parquet(d.toString)
    val q = DocStream.ingested(doubled)
      .select($"doc_id", $"minhash_sig", $"char_gini")
      .writeStream.outputMode("append")
      .format("memory").queryName("docs_out")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("docs_out")
      // exact dedup: one survivor per distinct text (the batch oracle count)
      val expected = graft.Tables.documents(spark, sf)
        .select(md5($"text".cast("binary"))).distinct().count()
      assert(out.count() == expected, s"got ${out.count()}, expected $expected")
      // the fused expressions computed real values inside the stream and
      // agree with their batch forms for the surviving docs
      val batchSig = graft.Tables.documents(spark, sf)
        .select($"doc_id", graft.functions.MinHashSig($"text", 5, 16).as("sig"),
          graft.functions.CharGini($"text").as("g"))
      val joined = out.join(batchSig, "doc_id")
      assert(joined.filter($"minhash_sig" =!= $"sig" || $"char_gini" =!= $"g").count() == 0)
    } finally q.stop()
  }

  test("streaming quota admits exactly the batch quota's per-source counts") {
    val q = DocStream.quotaAdmitted(DocStream.readDocs(spark, sf), quota = 12)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("quota_out")
        .groupBy($"source").count().as[(String, Long)].collect().toMap
      val batch = graft.llm.Mixture.sourceQuota(spark, sf, quota = 12)
        .groupBy($"source").count().as[(String, Long)].collect().toMap
      // different representatives BY DESIGN (draw vs admission) — the
      // parity is the per-source cardinality: both emit min(quota, n)
      assert(streamed == batch, s"per-source counts differ: $streamed vs $batch")
      // and the admitted rows are real corpus rows of the right source
      val corpus = graft.Tables.documents(spark, sf)
        .select($"doc_id", $"source").as[(Long, String)].collect().toSet
      spark.table("quota_out").as[DocStream.AdmittedDoc].collect()
        .foreach(a => assert(corpus.contains((a.doc_id, a.source))))
    } finally q.stop()
  }

  test("streaming quota state persists across micro-batches (gate stays closed)") {
    // doubled at-least-once source, one file per trigger ⇒ two
    // micro-batches of 500 rows each; the second batch must admit ZERO
    // rows into already-full sources (25 docs/source ≥ quota 12 fills
    // every gate in batch one)
    val d = java.nio.file.Files.createTempDirectory("graft-quota-stream")
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src)
    java.nio.file.Files.createSymbolicLink(d.resolve("b.parquet"), src)
    val doubled = spark.readStream.schema(DocStream.docsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString)
    val q = DocStream.quotaAdmitted(doubled, quota = 12)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota2_out")
      .start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "staging did not produce multiple micro-batches")
      val perSource = spark.table("quota2_out")
        .groupBy($"source").count().as[(String, Long)].collect().toMap
      assert(perSource.values.forall(_ == 12),
        s"a source exceeded its quota across batches: $perSource")
    } finally q.stop()
  }

  test("streaming learned-quality scoring equals batch document-for-document") {
    // train batch-side, score the stream with the literal-map model
    val model = graft.llm.LearnedQuality.trainModel(spark, sf)
    val q = DocStream.learnedQualityScored(DocStream.readDocs(spark, sf), model)
      .select($"doc_id", $"nb_score", $"nb_keep")
      .writeStream.outputMode("append")
      .format("memory").queryName("nb_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nb_out")
        .as[(Long, Long, Int)].collect().toSet
      val batch = DocStream.learnedQualityScored(
          graft.Tables.documents(spark, sf), model)
        .select($"doc_id", $"nb_score", $"nb_keep")
        .as[(Long, Long, Int)].collect().toSet
      assert(streamed == batch)
      // the model discriminates in-stream too: both keep decisions occur
      assert(streamed.exists(_._3 == 0) && streamed.exists(_._3 == 1))
    } finally q.stop()
  }

  test("streaming BPE token counts equal batch AND the word-table join path") {
    val merges = graft.llm.Bpe.mergeList(spark, sf)
    assert(merges.nonEmpty)
    val q = DocStream.bpeSegmented(DocStream.readDocs(spark, sf), merges)
      .select($"doc_id", $"n_bpe_tokens")
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("bpe_out")
        .as[(Long, Long)].collect().toMap
      // parity 1: same function over the batch frame (stateless chain)
      val batch = DocStream.bpeSegmented(
          graft.Tables.documents(spark, sf), merges)
        .select($"doc_id", $"n_bpe_tokens").as[(Long, Long)].collect().toMap
      assert(streamed == batch)
      // parity 2: a DIFFERENT evaluation strategy — t23's word-table
      // join — must produce the same per-doc counts (whole-text replay
      // with boundary symbols ≡ per-word segmentation lookup)
      val viaJoin = graft.llm.Bpe.docTokens(spark, sf)
        .as[(Long, Long)].collect().toMap
      assert(streamed == viaJoin)
    } finally q.stop()
  }

  test("streaming mixture throttle equals the batch sample document-for-document") {
    val thresholds = graft.llm.Mixture.sampleThresholds(
      graft.Tables.documents(spark, sf), targetPerSource = 18L)
      .localCheckpoint(true) // calibrated once, static for the stream
    val q = DocStream.mixtureThrottled(DocStream.readDocs(spark, sf), thresholds)
      .writeStream.outputMode("append")
      .format("memory").queryName("mix_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("mix_out")
        .as[(Long, String)].collect().toSet
      val batch = graft.llm.Mixture.mixtureSample(spark, sf, targetPerSource = 18L)
        .as[(Long, String)].collect().toSet
      // stateless row-local decision ⇒ EXACT same kept documents
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static ANN serving: per-micro-batch answers equal the one-shot batch serve") {
    import graft.llm.Similarity
    val idxDir = java.nio.file.Files.createTempDirectory("graft-annserve-idx").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-annserve-src").toString
    try {
      // the static side: the persisted index, written and reloaded
      Similarity.writeIvfSq8Index(Similarity.buildIvfSq8Index(spark, sf), idxDir)
      val idx = Similarity.readIvfSq8Index(spark, idxDir)
      val queries = graft.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
        .where(col("vec_id") < 50)
      val batchAnswer = Similarity.ivfSq8KnnFromIndex(
          queries.withColumn("nrm",
            sqrt(graft.functions.FloatVecDot(col("embedding"), col("embedding")))),
          idx, nProbe = 2)
        .as[(Long, Long, Int, Long)].collect().toSet
      // the request stream: 3 part files, one micro-batch each
      queries.repartition(3).write.mode("overwrite").parquet(srcDir)
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int, Long)]()
      val q = VecStream.annServed(
        spark.readStream.schema(VecStream.vecSchema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        idx, nProbe = 2) { (res, _) =>
        res.as[(Long, Long, Int, Long)].collect().foreach(got.add)
      }
      try {
        q.processAllAvailable()
        val streamed = got.asScala.toSet
        assert(streamed == batchAnswer,
          s"stream served ${streamed.size} rows != batch ${batchAnswer.size}")
        assert(streamed.nonEmpty && streamed.map(_._1).size > 1)
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    }
  }

  test("stream-static corpus-append dedup: stream survivors equal the batch twin across micro-batches") {
    import graft.llm.IncrementalDedup
    // the IncrementalDedupSpec bridge fixture: corpus clusters {0,1} and
    // {2,3}, delta bridge 4 (near-dup of both), exact delta dup 9 of
    // corpus 5, unique 14, delta-internal near-dup pair 19/24 (which
    // this STAGE must keep — delta-internal dedup is the batch
    // compaction's job, d39)
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen green turtles carry shiny pebbles across the quiet river " +
      "bank at dawn"
    val base2 = "nine silver airships drift slowly beneath amber " +
      "clouds carrying quiet passengers toward the distant harbor lights " +
      "of an old coastal town"
    val docs = Seq(
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
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val corpus = docs.where(col("doc_id") % 5 < 4)
    val delta = docs.where(col("doc_id") % 5 >= 4)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-incstream-idx").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-incstream-src").toString
    try {
      IncrementalDedup.writeIndex(
        IncrementalDedup.buildIndex(corpus, rowsPerBand = 4), idxDir, rowsPerBand = 4)
      val idx = IncrementalDedup.readIndex(spark, idxDir)
      val batchKept = DocStream.corpusDeduped(delta, idx, rowsPerBand = 4)
        .select("doc_id").as[Long].collect().toSet
      // multi-batch stream: 3 part files, one per trigger — the probe
      // joins replan against the static bucketed index each micro-batch
      delta.repartition(3).write.mode("overwrite").parquet(srcDir)
      val q = DocStream.corpusDeduped(
          spark.readStream.schema(DocStream.docsSchema)
            .option("maxFilesPerTrigger", 1).parquet(srcDir),
          idx, rowsPerBand = 4)
        .select("doc_id")
        .writeStream.outputMode("append")
        .format("memory").queryName("incdedup_stream_out")
        .start()
      try {
        q.processAllAvailable()
        val streamKept = spark.table("incdedup_stream_out").as[Long].collect().toSet
        assert(streamKept == batchKept, s"stream $streamKept != batch $batchKept")
        // and the stage did real work at signature precision: the exact
        // corpus duplicate AND the banded bridge dropped; the unique doc
        // and the delta-internal pair (out of scope) survived
        assert(streamKept == Set(14L, 19L, 24L), s"survivors: $streamKept")
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    }
  }

  /** Land `df` as one new parquet file in a streaming source dir (the
    * file stream picks up exactly one new file → one micro-batch).
    */
  private def landFile(df: org.apache.spark.sql.DataFrame, srcDir: String,
      name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-land").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written to $tmp"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("maintained-index doc serve: an append landing between micro-batches changes the served dedup exactly as batch would") {
    import graft.llm.IncrementalDedup
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen green turtles carry shiny pebbles across the quiet river " +
      "bank at dawn"
    val base2 = "nine silver airships drift slowly beneath amber " +
      "clouds carrying quiet passengers toward the distant harbor lights " +
      "of an old coastal town"
    val mkDocs = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val corpus = mkDocs(Seq(
      (0L, base + " alpha beta gamma tree"),
      (1L, base + " alpha beta gamma tree!"),
      (2L, base + " bravo charlie delta two"),
      (3L, base + " bravo charlie delta two ok"),
      (5L, "completely unrelated corpus document about cooking bread")))
    val batch1 = mkDocs(Seq(
      (9L, "completely unrelated corpus document about cooking bread"), // exact twin of 5
      (14L, "a unique delta document that resembles nothing else here")))
    val appended = mkDocs(Seq((19L, base2)))
    val batch2 = mkDocs(Seq((24L, base2 + " xx"))) // near-dup of 19
    val idxDir = java.nio.file.Files.createTempDirectory("graft-maintserve-idx").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-maintserve-src").toString
    try {
      IncrementalDedup.writeIndex(
        IncrementalDedup.buildIndex(corpus, rowsPerBand = 4), idxDir, rowsPerBand = 4)
      val staleIdx = IncrementalDedup.readIndex(spark, idxDir) // gen 0, held by a reader
      val phases = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
      val q = DocStream.corpusDedupedMaintained(
        spark.readStream.schema(DocStream.docsSchema).parquet(srcDir),
        idxDir, rowsPerBand = 4) { (out, id) =>
        phases.add((id, out.select("doc_id").collect().map(_.getLong(0)).toSet))
      }
      try {
        landFile(batch1, srcDir, "b1")
        q.processAllAvailable()
        val phase1 = phases.asScala.flatMap(_._2).toSet
        assert(phase1 == Set(14L), s"batch-1 survivors: $phase1 (9 must drop as 5's twin)")
        // the append lands BETWEEN micro-batches (d46 maintained write-back)
        IncrementalDedup.appendToIndex(spark, idxDir,
          corpus.unionByName(appended), appended).count()
        landFile(batch2, srcDir, "b2")
        q.processAllAvailable()
        val phase2 = phases.asScala.flatMap(_._2).toSet -- phase1
        // the batch path over a FRESH readIndex: 24 drops against the
        // newly appended 19
        val batchFresh = DocStream.corpusDeduped(batch2,
            IncrementalDedup.readIndex(spark, idxDir), rowsPerBand = 4)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(phase2 == batchFresh,
          s"stream $phase2 != fresh-index batch path $batchFresh")
        assert(phase2.isEmpty, s"24 should drop against the appended 19: $phase2")
        // without the re-resolution the stale generation would have kept
        // it — the re-resolve is what changed the answer
        val batchStale = DocStream.corpusDeduped(batch2, staleIdx, rowsPerBand = 4)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(batchStale == Set(24L),
          s"stale gen-0 index should keep 24 (it never saw 19): $batchStale")
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    }
  }

  test("maintained-index doc serve over a LEDGERED index: a mid-stream CAPPED append advances the generation and the serve tracks it") {
    // r18 VERDICT ask #5: the serving twin had never been exercised
    // over a ledgered (capledger epoch-layout) index — this drives a
    // capped maintained append between micro-batches and pins parity
    // with the batch path over a fresh readIndex
    import graft.llm.IncrementalDedup
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen green turtles carry shiny pebbles across the quiet river " +
      "bank at dawn"
    val base2 = "nine silver airships drift slowly beneath amber " +
      "clouds carrying quiet passengers toward the distant harbor lights " +
      "of an old coastal town"
    val mkDocs = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val corpus = mkDocs(Seq(
      (0L, base + " alpha beta gamma tree"),
      (1L, base + " alpha beta gamma tree!"),
      (2L, base + " bravo charlie delta two"),
      (3L, base + " bravo charlie delta two ok"),
      (5L, "completely unrelated corpus document about cooking bread")))
    val batch1 = mkDocs(Seq(
      (14L, "a unique delta document that resembles nothing else here")))
    val appended = mkDocs(Seq((19L, base2)))
    val batch2 = mkDocs(Seq((24L, base2 + " xx"))) // near-dup of appended 19
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ledgerserve-idx").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ledgerserve-src").toString
    try {
      val (idx0, over0) = IncrementalDedup.buildIndexWithLedger(
        corpus, rowsPerBand = 4, bucketCap = 3)
      IncrementalDedup.writeIndex(idx0, idxDir, rowsPerBand = 4,
        capLedger0 = Some(over0))
      val phases = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
      val q = DocStream.corpusDedupedMaintained(
        spark.readStream.schema(DocStream.docsSchema).parquet(srcDir),
        idxDir, rowsPerBand = 4) { (out, id) =>
        phases.add((id, out.select("doc_id").collect().map(_.getLong(0)).toSet))
      }
      try {
        landFile(batch1, srcDir, "b1")
        q.processAllAvailable()
        val phase1 = phases.asScala.flatMap(_._2).toSet
        assert(phase1 == Set(14L), s"batch-1 survivors: $phase1")
        // a CAPPED maintained append lands between micro-batches: the
        // generation advances AND a capledger epoch appears
        IncrementalDedup.appendToIndex(spark, idxDir,
          corpus.unionByName(appended), appended, bucketCap = 3).count()
        val m = graft.runtime.IndexStatePublisher.current(idxDir)
        assert(m.epochs("capledger") == 1,
          s"capped append must record a ledger epoch: ${m.epochs}")
        landFile(batch2, srcDir, "b2")
        q.processAllAvailable()
        val phase2 = phases.asScala.flatMap(_._2).toSet -- phase1
        val batchFresh = DocStream.corpusDeduped(batch2,
            IncrementalDedup.readIndex(spark, idxDir), rowsPerBand = 4)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(phase2 == batchFresh,
          s"stream $phase2 != fresh-ledgered-index batch path $batchFresh")
        assert(phase2.isEmpty, s"24 should drop against the appended 19: $phase2")
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    }
  }

  test("maintained-index ANN serve across a mid-stream REBUILD: retrained+retuned generation served by the next batch at the derived probe count") {
    import graft.llm.Similarity
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.functions.FloatVecDot(col("embedding"), col("embedding"))))
      .localCheckpoint(true)
    val corpus = all.filter(col("vec_id") < 400).localCheckpoint(true)
    val query = all.filter(col("vec_id") === 3L).localCheckpoint(true)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-rebuildserve-idx").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-rebuildserve-src").toString
    try {
      Similarity.writeIvfSq8Index(
        Similarity.buildIvfSq8IndexFrom(corpus, nCells = 16, sampleN = 200), idxDir)
      val served = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
      // nProbe = 0: derive the probe count from each loaded generation
      // (the serving mode that tracks a retuned rebuild)
      val q = VecStream.annServedMaintained(
        spark.readStream.schema(VecStream.vecSchema).parquet(srcDir),
        idxDir, nProbe = 0) { (out, id) =>
        served.add((id, out.select("nid").collect().map(_.getLong(0)).toSet))
      }
      try {
        landFile(query.select(col("vec_id"), col("embedding")), srcDir, "q1")
        q.processAllAvailable()
        val phase1 = served.asScala.flatMap(_._2).toSet
        assert(phase1.nonEmpty, "first serve returned nothing")
        // append past the rebuild ratio, then the composed maintenance
        // (trigger → retrain → re-tune → republish) lands mid-stream
        val delta = all.filter(col("vec_id") >= 400)
          .unionByName(query.select(lit(100000L).as("vec_id"),
            col("embedding"), col("nrm")))
        Similarity.appendVectorsToIndexDir(spark, idxDir, delta)
        val r = Similarity.maintainIvfSq8IndexDir(spark, idxDir,
          corpus.unionByName(delta))
        assert(r.rebuilt, s"the append ratio must trigger the rebuild: $r")
        landFile(query.select(col("vec_id"), col("embedding")), srcDir, "q2")
        q.processAllAvailable()
        val phase2 = served.asScala.toSeq.filter(_._1 > 0).flatMap(_._2).toSet
        assert(phase2.contains(100000L),
          s"appended twin not served after the rebuild: $phase2")
        // exact parity with the batch path over the fresh rebuilt index
        // at the SAME derived probe count
        val batchFresh = Similarity.ivfSq8KnnFromIndex(query,
            Similarity.readIvfSq8Index(spark, idxDir), r.nProbe)
          .select("nid").collect().map(_.getLong(0)).toSet
        assert(phase2 == batchFresh, s"stream $phase2 != batch $batchFresh")
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    }
  }

  test("maintained-index ANN serve: vectors appended between micro-batches are served by the next batch") {
    import graft.llm.Similarity
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.functions.FloatVecDot(col("embedding"), col("embedding"))))
      .localCheckpoint(true)
    val corpus = all.filter(col("vec_id") < 800)
    val query = all.filter(col("vec_id") === 3L).localCheckpoint(true)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-vecserve-idx").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-vecserve-src").toString
    try {
      Similarity.writeIvfSq8Index(
        Similarity.buildIvfSq8IndexFrom(corpus, nCells = 16, sampleN = 200), idxDir)
      val served = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
      val q = VecStream.annServedMaintained(
        spark.readStream.schema(VecStream.vecSchema).parquet(srcDir),
        idxDir, nProbe = 2) { (out, id) =>
        served.add((id, out.select("nid").collect().map(_.getLong(0)).toSet))
      }
      try {
        landFile(query.select(col("vec_id"), col("embedding")), srcDir, "q1")
        q.processAllAvailable()
        val phase1 = served.asScala.flatMap(_._2).toSet
        assert(phase1.nonEmpty, "first serve returned nothing")
        assert(!phase1.contains(100000L))
        // append an exact copy of the query vector with a fresh id: by
        // construction its quantized dot is maximal, so the NEXT batch
        // must surface it — iff the serve re-resolved the manifest
        Similarity.appendVectorsToIndexDir(spark, idxDir,
          query.select(lit(100000L).as("vec_id"), col("embedding"), col("nrm")))
        landFile(query.select(col("vec_id"), col("embedding")), srcDir, "q2")
        q.processAllAvailable()
        val phase2 = served.asScala.toSeq.filter(_._1 > 0).flatMap(_._2).toSet
        assert(phase2.contains(100000L),
          s"appended twin not served after the append: $phase2")
        // exact parity with the batch path over the fresh loaded index
        val batchFresh = Similarity.ivfSq8KnnFromIndex(query,
            Similarity.readIvfSq8Index(spark, idxDir), nProbe = 2)
          .select("nid").collect().map(_.getLong(0)).toSet
        assert(phase2 == batchFresh, s"stream $phase2 != batch $batchFresh")
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    }
  }
}
