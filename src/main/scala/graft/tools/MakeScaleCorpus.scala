package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up corpus generator: replicates the driver's sf0.1
  * `documents`/`embeddings` tables R× with id offsets, so the d-family
  * pipelines can be MEASURED at 10-50× the largest driver-provided scale
  * point instead of arguing from sf0.1 (VERDICT r7 "what's missing" #1).
  *
  * Construction (all deterministic, engine-builtin expressions only):
  *
  *  - **Replica texts are rotated through a per-rep substitution cipher**
  *    (`translate` over [a-z0-9], rotation = rep index). A bijective
  *    per-char map preserves every within-rep equality — shingle sets,
  *    token structure, exact-duplicate relations, and hence the TRUE
  *    near-dup pair structure of each replica is exactly the base
  *    corpus's — while cross-rep 5-gram Jaccard collapses to the few
  *    punctuation-only shingles (est << the 0.6 prefilter), so replicas
  *    don't pair with each other. True pairs therefore scale EXACTLY
  *    linearly in R: the measured candidate/verified/cluster counts have
  *    a known ground-truth growth law to be judged against.
  *  - **Embeddings rotate component-wise** by rep (cyclic `slice`+`concat`):
  *    within-rep cosines are exactly preserved (rotation is orthogonal),
  *    cross-rep cosines are the autocorrelation of near-random vectors
  *    (≈ 0 << the 0.35 verify threshold).
  *  - **Controlled near-dup injection**: every 50th base doc (2%) gains a
  *    same-rep twin (id offset +500k) with two single-char `overlay` edits
  *    (~10 of ~500 shingles differ, J ≈ 0.95 — above the 0.8 verify
  *    threshold with LSH recall ≈ 0.99 at the shipped 4×8 banding, so the
  *    injected pairs double as a recall gate). Embedding twins perturb one
  *    component (+0.05, cos ≈ 0.999).
  *  - **skew variant**: the first 2% of each rep's docs become copies of
  *    one boilerplate template with a tiny unique tail — a per-rep
  *    mega-cluster that floods LSH buckets (the capBuckets ladder's
  *    workload) with C(block, 2) candidate pairs per rep if uncapped.
  *
  * Ids: `rep * 1_000_000 + base_id` (injected twins `+ 500_000`), so
  * "same rep" is `id / 1_000_000` — the no-cross-rep invariant ScaleBench
  * gates on. Usage:
  *   sbt "runMain graft.tools.MakeScaleCorpus <R> <clean|skew> <outDir>"
  */
object MakeScaleCorpus {
  val Stride = 1000000L
  val InjectOffset = 500000L
  /** Every Nth base doc/vec gets an injected near-dup twin. */
  val InjectEvery = 50

  private val alpha = "abcdefghijklmnopqrstuvwxyz"
  private val digits = "0123456789"

  /** Deterministic per-rep random permutation of `s` (Fisher–Yates over a
    * seeded LCG). A plain ROTATION has period 26 on the letter block, so
    * reps 26 apart would share a cipher and become near-exact cross-rep
    * copies — the x50 invariant run caught exactly that (139k cross-rep
    * pairs). Independent random permutations agree on ~1 character, so
    * cross-rep shingle overlap collapses for every rep pair.
    */
  private def perm(s: String, seed: Int): String = {
    val a = s.toCharArray
    var x = (seed * 2654435761L + 1013904223L) & 0x7fffffffL
    var i = a.length - 1
    while (i > 0) {
      x = (x * 48271L) % 2147483647L
      val j = (x % (i + 1)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    new String(a)
  }

  /** Per-rep bijective char map over [a-z0-9]: preserves within-rep string
    * equality (and inequality), destroys cross-rep shingle overlap.
    */
  def cipher(text: org.apache.spark.sql.Column, rep: Int): org.apache.spark.sql.Column =
    if (rep == 0) text
    else translate(text, alpha + digits,
      perm(alpha, rep * 2 + 1) + perm(digits, rep * 2 + 2))

  /** The id layout (body at `rep·Stride + id`, twins at `+ InjectOffset`)
    * is collision-free only while base ids stay below InjectOffset — a
    * larger base would silently alias body ids with twin ids and corrupt
    * the ground-truth pair structure, so fail loudly instead.
    */
  private def requireIdsBelowInjectOffset(ids: DataFrame, idCol: String): Unit = {
    val maxId = ids.agg(max(col(idCol))).first().getAs[Number](0).longValue()
    require(maxId < InjectOffset,
      s"base $idCol max $maxId >= InjectOffset $InjectOffset: replica ids would collide")
  }

  def replicateDocs(s: SparkSession, dir: String, reps: Int, skewBlock: Boolean): DataFrame = {
    val base = graft.Tables.documents(s, dir)
    requireIdsBelowInjectOffset(base, "doc_id")
    val nBase = base.count()
    val blockN = math.max(1L, nBase / 50L) // 2% template block (skew variant)
    val parts = (0 until reps).flatMap { r =>
      val cip = cipher(col("text"), r)
      val bodyText =
        if (skewBlock)
          when(col("doc_id") < blockN,
            concat(cipher(
              lit("template boilerplate header the quick brown corpus fox jumps over the lazy shard " * 6), r),
              lit(" #"), col("doc_id")))
            .otherwise(cip)
        else cip
      val body = base.select(
        (col("doc_id") + lit(r * Stride)).as("doc_id"),
        bodyText.as("text"),
        col("lang"), col("source"),
        length(bodyText).as("n_chars"))
      // injected near-dup twin: two single-char edits ⇒ J ≈ 0.95 vs its
      // same-rep original — a known true pair (orig, orig + InjectOffset).
      // Edits apply to bodyText, not the pre-template cip: inside the skew
      // variant's template block the body IS the template, and a twin of
      // the replaced original would break the injected-pair invariant.
      val twinText = overlay(
        overlay(bodyText, lit("q"), (length(bodyText) / 3) + 1, lit(1)),
        lit("q"), (length(bodyText) * 2 / 3) + 1, lit(1))
      val twins = base
        .filter(col("doc_id") % InjectEvery === 0)
        .select(
          (col("doc_id") + lit(r * Stride + InjectOffset)).as("doc_id"),
          twinText.as("text"),
          col("lang"), col("source"),
          length(twinText).as("n_chars"))
      Seq(body, twins)
    }
    parts.reduce(_ unionByName _)
  }

  /** Deterministic per-rep permutation of [0, dim): Fisher–Yates over a
    * seeded LCG (the index twin of [[perm]]). A plain ROTATION (`r % dim`)
    * has period dim = 64, so reps 64 apart shared a rotation and the
    * decorrelation rested on sign flips alone — the ×200 invariant run
    * caught exactly that (237k cross-rep pairs at cos ≥ 0.8 from
    * same-rotation rep couples whose sign patterns agree on the clustered
    * vectors' energy support). Independent permutations have no period.
    */
  private def idxPerm(dim: Int, seed: Int): Array[Int] = {
    val a = Array.tabulate(dim)(identity)
    var x = (seed * 2654435761L + 1013904223L) & 0x7fffffffL
    var i = a.length - 1
    while (i > 0) {
      x = (x * 48271L) % 2147483647L
      val j = (x % (i + 1)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  def replicateEmbeddings(s: SparkSession, dir: String, reps: Int): DataFrame = {
    val base = graft.Tables.embeddings(s, dir)
    requireIdsBelowInjectOffset(base, "vec_id")
    val dim = 64
    val parts = (0 until reps).flatMap { r =>
      // per-rep component PERMUTATION + per-rep random SIGN FLIPS: both
      // orthogonal, so every within-rep cosine is exactly preserved; the
      // combination is what decorrelates reps — these embeddings cluster
      // by label, so sign flips alone leave cross-rep correlations on the
      // clusters' energy support (the ×200 finding above), and a plain
      // rotation alone left centroid correlations above 0.35 (measured:
      // 104k cross-rep pairs at ×10 without flips). Permuted + signed,
      // cross-rep cos concentrates at 0 ± 1/√dim; pairs above the 0.8
      // invariant threshold are ~6σ tail events.
      val pi = idxPerm(dim, r * 2 + 1)
      val permuted =
        if (r == 0) col("embedding")
        else array((0 until dim).map(i => element_at(col("embedding"), pi(i) + 1)): _*)
      val signs = array((0 until dim).map { i =>
        lit(if (r == 0 || Integer.bitCount(r * 73856093 ^ i * 19349663) % 2 == 0) 1.0f else -1.0f)
      }: _*)
      val rotated = if (r == 0) permuted else zip_with(permuted, signs, (x, sg) => x * sg)
      val body = base.select(
        (col("vec_id") + lit(r * Stride)).as("vec_id"),
        rotated.as("embedding"), col("label"))
      // near-identical twin: one component nudged ⇒ cosine ≈ 0.999
      val twins = base
        .filter(col("vec_id") % InjectEvery === 0)
        .select(
          (col("vec_id") + lit(r * Stride + InjectOffset)).as("vec_id"),
          concat(
            array(element_at(rotated, 1) + lit(0.05f)),
            slice(rotated, 2, dim - 1)).as("embedding"),
          col("label"))
      Seq(body, twins)
    }
    parts.reduce(_ unionByName _)
  }

  /** Chain corpus: documents c_0..c_{L-1} where c_j has j cumulative
    * single-char edits at distinct positions — consecutive docs are
    * near-dups (J ≈ 0.98) and the ≥0.8-threshold graph connects nodes up
    * to ~11 edits apart, so each chain is ONE component of diameter
    * ≈ L/11. Replication (xN corpora) can't grow component diameter, so
    * this is the workload that measures the pointer-jumping O(log
    * diameter) round claim directly. Chains of different lengths use
    * different cipher rotations so they cannot cross-pair. Ids:
    * L * 10000 + j.
    */
  def chainDocs(s: SparkSession, lengths: Seq[Int]): DataFrame = {
    import s.implicits._
    val baseStr = ("spark corpus shard lorem word vector join scan hash " * 10).take(509)
    def rotChar(c: Char, k: Int): Char =
      if (c >= 'a' && c <= 'z') (((c - 'a' + k) % 26) + 'a').toChar else c
    val rows = lengths.zipWithIndex.flatMap { case (len, ci) =>
      val chars = baseStr.map(rotChar(_, ci * 7)).toCharArray
      (0 until len).map { j =>
        if (j > 0) chars((17 * (j - 1) + 3) % chars.length) = 'z'
        (len.toLong * 10000L + j, new String(chars), "en", s"chain$len", chars.length.toLong)
      }
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val variant = args(1) // clean | skew | chain
    val outDir = args(2)
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (variant == "chain") {
      chainDocs(spark, Seq(4, 16, 64, 256))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    } else {
      replicateDocs(spark, baseDir, reps, variant == "skew")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      if (variant == "clean")
        replicateEmbeddings(spark, baseDir, reps)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    println(s"[makescale] wrote $outDir (reps=$reps, variant=$variant)")
    spark.stop()
  }
}
