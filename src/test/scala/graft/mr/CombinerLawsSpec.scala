package graft.mr

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the combiner/aggregation laws the reference never
  * checked (explicit TODO, /root/reference/mrtest/testing.go:56). These run
  * without Spark — they verify the algebra that makes map-side combining
  * safe under ANY partitioning of a distributed input.
  */
object CombinerLawsSpec extends Properties("CombinerLaws") {

  private val dirtyValue: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(_.toString), // valid int64
    Gen.alphaStr.map(s => "\"" + s + "\""),          // string → skip
    Gen.choose(0.0, 1.0).map(_.toString),            // non-integral → skip
    Gen.const("not json at all"))                    // garbage → skip

  private def noopCounters: Counters = new Counters(new CounterAccumulator)

  /** Sum(values) must equal Sum over any partition of values with partials
    * re-summed — i.e. combine-then-reduce ≡ reduce (associativity +
    * commutativity of the lenient sum, including skip semantics).
    */
  property("lenientSum is partition-invariant (combiner law)") =
    Prop.forAll(Gen.listOf(dirtyValue), Gen.choose(1, 8)) { (vs, nChunks) =>
      val direct = BuiltinSteps.lenientSum(vs.iterator, noopCounters)
      val chunks = if (vs.isEmpty) Seq(Seq.empty[String])
        else vs.grouped(math.max(1, vs.size / nChunks)).toSeq
      val partials = chunks.map(c => BuiltinSteps.lenientSum(c.iterator, noopCounters).toString)
      val recombined = BuiltinSteps.lenientSum(partials.iterator, noopCounters)
      direct == recombined
    }

  /** Exact decimal aggregation (MrQueries.ExactSumAgg) is merge-order
    * invariant — the property that keeps results identical from local[4]
    * to a 1000-executor cluster.
    */
  property("ExactSumAgg merge is order/partition invariant") =
    Prop.forAll(Gen.listOf(Gen.choose(-1e6, 1e6)), Gen.choose(1, 8)) { (vs, nChunks) =>
      val agg = new MrQueries.ExactSumAgg[Double](identity)
      def total(xs: Seq[Double]) = xs.foldLeft(agg.zero)(agg.reduce)
      val direct = agg.finish(total(vs))
      val chunks = if (vs.isEmpty) Seq(Seq.empty[Double])
        else vs.grouped(math.max(1, vs.size / nChunks)).toSeq
      val merged = agg.finish(chunks.map(total).reduceLeft(agg.merge))
      val mergedRev = agg.finish(chunks.map(total).reverse.reduceLeft(agg.merge))
      direct == merged && merged == mergedRev
    }

  /** KV round-trip: first-tab split semantics
    * (/root/reference/mrproto/protocol.go:94) — values may contain tabs,
    * keys are everything before the first tab.
    */
  property("KV line round-trip splits on first tab only") =
    Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (k0, v) =>
      val k = k0.replace("\t", "").replace("\n", "")
      val vv = v.replace("\n", "")
      KV.fromLine(KV.toLine(KV(k, vv))).contains(KV(k, vv))
    }
}
