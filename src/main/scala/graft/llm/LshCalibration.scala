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
}
