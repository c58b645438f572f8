package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.mr.TestSession
import graft.functions.TopBigram

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  // ---- TopBigram expression (t10's kernel)

  private def top(text: String): (String, Int, Int) = {
    val r = TopBigram.topBigram(UTF8String.fromString(text))
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2))
  }

  test("TopBigram counts adjacent pairs and breaks ties binary-min") {
    assert(top("a b a b a") == (("a b", 2, 4)))
    // "b a" and "a b" both occur twice; binary order picks "a b"
    assert(top("b a b a b") == (("a b", 2, 4)))
    assert(top("x y") == (("x y", 1, 1)))
    // runs of spaces produce no empty tokens (tokenizer parity)
    assert(top("  a   b  a   b ") == (("a b", 2, 3)))
  }

  test("TopBigram: fewer than two tokens means zero bigrams, never null") {
    assert(top("") == (("", 0, 0)))
    assert(top("solo") == (("", 0, 0)))
    assert(top("   ") == (("", 0, 0)))
  }

  test("TopBigram is UTF-8 clean: multi-byte tokens count and compare by bytes") {
    assert(top("héllo wörld héllo wörld héllo") == (("héllo wörld", 2, 4)))
    // 'é' (0xC3A9) > 'e' (0x65) in byte order, so the ASCII bigram wins ties
    assert(top("e x é x e x é x")._1 == "e x")
  }

  test("TopBigram codegen path agrees with the interpreted helper") {
    val texts = graft.Tables.documents(spark, sf).select($"text").as[String].take(50)
    val viaDf = texts.toSeq.toDF("text")
      .select(TopBigram(col("text")).as("tb"))
      .select($"tb.top_bigram", $"tb.top_n", $"tb.n_bigrams")
      .as[(String, Int, Int)].collect()
    assert(viaDf.toSeq == texts.toSeq.map(top))
  }

  // ---- t10 repetition operator

  test("t10: rep_ratio is top_n over bigram count, in (0, 1]") {
    val rows = TextAnalysis.repetition(spark, sf)
      .select($"doc_id", $"top_n", $"rep_ratio").as[(Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, r) => n >= 1 && r > 0.0 && r <= 1.0 })
  }

  test("t10 plan is a shuffle-free single pass over the scan") {
    val p = TextAnalysis.repetition(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("topbigram"), p)
  }

  // ---- t11 per-source quota

  test("t11: every source is capped at the quota, draws are monotone in quota") {
    val q8 = Mixture.sourceQuota(spark, sf, 8)
    val q12 = Mixture.sourceQuota(spark, sf, 12)
    val perSrc = q12.groupBy($"source").count().as[(String, Long)].collect()
    assert(perSrc.nonEmpty && perSrc.forall(_._2 <= 12))
    // the hash-order draw nests: quota 8's picks are quota 12's first 8
    val s8 = q8.select($"doc_id").as[Long].collect().toSet
    val s12 = q12.select($"doc_id").as[Long].collect().toSet
    assert(s8.subsetOf(s12), s"quota-8 draw must nest inside quota-12")
  }

  test("t11: quota above the source size keeps every document") {
    val total = graft.Tables.documents(spark, sf).count()
    assert(Mixture.sourceQuota(spark, sf, 1000000).count() == total)
  }

  // ---- t12 mixture sampling

  test("t12: kept set is monotone in target and keep-all kicks in at target >= n_src") {
    val t18 = Mixture.mixtureSample(spark, sf, 18L).select($"doc_id").as[Long].collect().toSet
    val t22 = Mixture.mixtureSample(spark, sf, 22L).select($"doc_id").as[Long].collect().toSet
    assert(t18.nonEmpty && t18.subsetOf(t22), "raising the target must only add documents")
    // every source holds 25 docs at this sf; target 25 caps every rate at 1
    val total = graft.Tables.documents(spark, sf).count()
    assert(Mixture.mixtureSample(spark, sf, 25L).count() == total)
  }

  test("t12 plan broadcasts the per-source counts, never shuffles the corpus side") {
    val p = Mixture.mixtureSample(spark, sf, 18L).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  // ---- t18 deterministic shard + training order

  private def shardMap(docs: org.apache.spark.sql.DataFrame, seed: String) =
    Mixture.shardOrderDf(docs, 8, seed)
      .as[(Long, Int, Int)].collect()
      .map { case (id, sh, o) => id -> ((sh, o)) }.toMap

  test("t18: a permutation — every doc once, shards in range, ord contiguous") {
    val docs = graft.Tables.documents(spark, sf)
    val out = Mixture.shardOrder(spark, sf, 8, "epoch0")
      .as[(Long, Int, Int)].collect()
    assert(out.length == docs.count())
    assert(out.map(_._1).distinct.length == out.length, "doc appears twice")
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // within each shard, ord is exactly 1..count
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $sh ord not contiguous")
    }
  }

  test("t18: deterministic under repartition and input order") {
    val docs = graft.Tables.documents(spark, sf)
    val a = shardMap(docs, "epoch0")
    val b = shardMap(docs.repartition(13).sortWithinPartitions($"text"), "epoch0")
    assert(a == b, "assignment must not depend on physical layout")
  }

  test("t18: a seed bump re-deals the permutation") {
    val docs = graft.Tables.documents(spark, sf)
    val e0 = shardMap(docs, "epoch0")
    val e1 = shardMap(docs, "epoch1")
    val moved = e0.count { case (id, a) => e1(id) != a }
    // a new 60-bit hash moves ~7/8 of docs to a different shard alone
    assert(moved > e0.size / 2, s"only $moved of ${e0.size} moved")
  }
}
