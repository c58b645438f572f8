package graft.llm

/** Banding calibration for the MinHash/SimHash/sign-LSH family.
  *
  * With a signature of `k = bands × rowsPerBand` hashes, a pair with true
  * similarity `s` shares any given band with probability `s^rowsPerBand`
  * and becomes a candidate with probability `1 − (1 − s^r)^b` — the
  * S-curve from the LSH literature (Broder; Leskovec–Rajaraman–Ullman
  * ch. 3). These helpers make the d02-vs-d13 calibration lesson
  * (SCALING.md §3: banding at midpoint 0.71 flooded the 0.8-threshold
  * verifier 605k:256; re-banding to midpoint ≈ 0.84 cut it 25×) a
  * computation instead of a comment.
  *
  * All functions are pure and driver-side: calibration happens once per
  * job, never per row.
  */
object LshCalibration {

  /** P[pair with similarity `s` becomes a candidate]: 1 − (1 − s^r)^b. */
  def candidateProb(s: Double, bands: Int, rowsPerBand: Int): Double = {
    require(bands >= 1 && rowsPerBand >= 1, s"bad banding ($bands x $rowsPerBand)")
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)
  }

  /** The similarity at which candidateProb = 1/2, exactly:
    * (1 − 2^(−1/b))^(1/r).
    */
  def midpoint(bands: Int, rowsPerBand: Int): Double = {
    require(bands >= 1 && rowsPerBand >= 1, s"bad banding ($bands x $rowsPerBand)")
    math.pow(1.0 - math.pow(0.5, 1.0 / bands), 1.0 / rowsPerBand)
  }

  /** The standard rough S-curve midpoint (1/b)^(1/r) — the form quoted in
    * the code comments and most texts; within a few percent of [[midpoint]]
    * for the band counts used here.
    */
  def midpointApprox(bands: Int, rowsPerBand: Int): Double = {
    require(bands >= 1 && rowsPerBand >= 1, s"bad banding ($bands x $rowsPerBand)")
    math.pow(1.0 / bands, 1.0 / rowsPerBand)
  }

  /** The band count (a divisor of `k`) whose S-curve midpoint sits closest
    * to `threshold` — how the shipped defaults were chosen:
    * bandsFor(0.8, 32) = 4 (midpoint ≈ 0.84, d13's banding) and
    * bandsFor(0.8, 48) = 6 (midpoint ≈ 0.80, the higher-recall variant
    * d17 runs end-to-end).
    *
    * Note the precision/recall trade the caller still owns: a midpoint
    * ABOVE the verify threshold under-generates candidates near it —
    * at 4×8 a true pair at j = 0.8 is surfaced with probability
    * candidateProb(0.8, 4, 8) ≈ 0.52 (each missed pair is a kept
    * duplicate downstream), in exchange for ~25× fewer j ≈ 0.45 template
    * collisions reaching the verifier. Pick k = 48 when recall at the
    * threshold matters more than verifier volume.
    */
  def bandsFor(threshold: Double, k: Int): Int = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold must be in (0,1), got $threshold")
    require(k >= 1, s"k must be >= 1, got $k")
    val divisors = (1 to k).filter(k % _ == 0)
    divisors.minBy(b => math.abs(midpointApprox(b, k / b) - threshold))
  }

  /** Sign-LSH bucket-width calibration: the bit count that keeps the
    * expected bucket population near `targetBucket` as the corpus grows —
    * bits = round(log₂(n / targetBucket)), floored at `minBits` (round,
    * not ceil: the nearest power keeps the bucket closest to target on
    * both sides — the measured ×1/×10/×50 points are 4/7/10 bits).
    *
    * This is the knob that turns the sign-LSH self-join from quadratic to
    * linear: a (table, bucket) key holds ~n/2^bits vectors and emits
    * ~C(n/2^bits, 2) candidate pairs, so FIXED bits mean candidates grow
    * ∝ n² (measured, SCALING.md §3b: 75 s vs 5.8 s at ×10 corpus size)
    * while bits that track log₂(n) hold the per-bucket population — and
    * hence candidates per vector — constant. The default targetBucket is
    * the shipped sf0.1 operating point (2 000 vectors / 2⁴ buckets ≈ 125).
    */
  def bitsFor(n: Long, targetBucket: Int = 125, minBits: Int = 4): Int = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(targetBucket >= 1 && minBits >= 1, s"bad calibration ($targetBucket, $minBits)")
    math.max(minBits,
      math.round(math.log(n.toDouble / targetBucket) / math.log(2)).toInt)
  }

  /** LSH index REBUILD trigger — the geometry twin of
    * [[graft.llm.Similarity.shouldRebuild]] (which covers the trained
    * IVF quantizer): an incremental LSH index holds its bucket width
    * FIXED across appends (a persisted bucket table at a different
    * width is unjoinable — IncrementalSemantic's pinned-geometry
    * contract), while [[bitsFor]] says the width a FRESH build would
    * choose tracks log₂(corpus). The rebuild is due exactly when those
    * diverge: the moment appended mass moves the count-derived width
    * off the indexed one, E[bucket] has drifted ≥ ~2× from target and
    * the self-join volume per delta grows with it (the measured
    * quadratic-at-fixed-bits regime, SCALING.md §3b). Pure and
    * driver-side, like everything in this object — the production
    * append loop's guard is one integer comparison.
    */
  def rebuildNeeded(indexedBits: Int, indexedN: Long, appendedN: Long,
      targetBucket: Int = 125, minBits: Int = 4): Boolean = {
    require(indexedBits >= 1, s"indexedBits must be >= 1, got $indexedBits")
    require(indexedN >= 1 && appendedN >= 0, s"bad counts ($indexedN, $appendedN)")
    bitsFor(indexedN + appendedN, targetBucket, minBits) != indexedBits
  }

  /** Oversized-bucket cap calibration — SCALING.md §3b's prescription
    * (production pipelines cap at O(10·E[bucket])) as code: `factor`× the
    * expected bucket population, floored at `floor` so tiny corpora don't
    * cap real structure. A bucket an order of magnitude over expectation
    * is a template flood (or a KM anchor bucket), not similarity
    * structure — the measured calibrated-banding point (E[bucket] ≈ 1 ⇒
    * cap 32) lost zero verified output at every scale point.
    */
  def capFor(expectedBucket: Double, factor: Int = 10, floor: Int = 32): Int = {
    require(expectedBucket >= 0.0, s"expectedBucket must be >= 0, got $expectedBucket")
    require(factor >= 1 && floor >= 1, s"bad calibration ($factor, $floor)")
    math.max(floor.toLong, math.ceil(factor * expectedBucket).toLong)
      .min(Int.MaxValue.toLong).toInt
  }
}
