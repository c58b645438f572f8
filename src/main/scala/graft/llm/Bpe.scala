package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Byte-pair-encoding vocabulary induction — the first step of every
  * training-data pipeline (token-budget decisions need a LEARNED
  * subword vocabulary, not a whitespace guess), and the one the
  * reference's multi-step agg-of-agg machinery is shaped for
  * (reference runner.go:352-356: chained steps where one stage's
  * aggregate feeds the next stage's map).
  *
  * Distributed shape (the published Sennrich 2016 optimization): learning
  * runs over the WORD-FREQUENCY table, never the corpus. One corpus pass
  * builds `(word, cnt)` — at 100 TB that table is vocabulary-sized
  * (~10⁷–10⁸ rows), 5–6 orders smaller than the corpus — then every merge
  * round is a narrow per-word map + a small pair aggregation over it. The
  * per-round argmax is a `limit(1)` collect: BPE's merge decision is
  * globally sequential BY DEFINITION (merge k+1 depends on the corpus
  * state after merge k), so one driver-side row per round is the
  * irreducible coordination cost, not a scale smell.
  *
  * Deterministic spec (both engines implement THIS, independently):
  *   - tokens = whitespace split ([[Hashing.tokens]]), empties dropped;
  *   - a word's symbol sequence is encoded as `~s1~s2~…~sn~` — every
  *     symbol carries a leading `~` marker and the string ends with one.
  *     A `~` inside a corpus token degrades GRACEFULLY: both engines
  *     split symbols on `~` and drop empties identically, so it acts as
  *     one more separator, never a cross-engine divergence (learned
  *     symbols are additionally require()-checked marker-free);
  *   - pair counts weight each word's adjacent symbol pairs by word
  *     frequency; SELF-pairs (x,x) are ineligible for merging — a
  *     documented variant choice that removes the overlapping-occurrence
  *     ambiguity of run merging (BPE variants already differ here);
  *   - the winning pair is argmax by (count DESC, sym_a ASC, sym_b ASC)
  *     — a total order, so ties are deterministic;
  *   - applying merge (a,b) rewrites `~a~b~` → `~ab~` with [[Passes]]
  *     chained left-to-right non-overlapping `replace` calls. One
  *     replace pass can miss an occurrence whose leading `~` was
  *     consumed as the trailing `~` of the immediately-preceding match;
  *     each pass merges at least every other occurrence of a contiguous
  *     run, so ⌈log₂ maxWordLen⌉ passes reach the fixpoint — 8 covers
  *     words to 256 chars. For x≠y (guaranteed by self-pair exclusion)
  *     occurrences never overlap, so the fixpoint equals the standard
  *     simultaneous merge.
  *
  * The DuckDB oracle replays the identical algorithm as a chain of
  * MATERIALIZED CTEs, one (pairs → best → rewritten-words) stage per
  * merge round — materialization is load-bearing: DuckDB inlines plain
  * CTEs, which re-evaluates every prior round per round (exponential).
  */
object Bpe {

  /** Shipped merge-round count. 12 is enough for the corpus to
    * reconstruct whole high-frequency words (round 12 learns `join`
    * at sf0.01) while keeping the oracle's CTE chain readable.
    */
  val Merges = 12

  /** Chained-replace passes per merge application (see the fixpoint
    * argument above: ⌈log₂ maxWordLen⌉ suffices; 8 ⇒ words ≤ 256 chars).
    */
  val Passes = 8

  /** `(word, cnt, seq)` — the word-frequency table with the initial
    * character-level symbol encoding. The ONE corpus-scale pass.
    */
  private def wordSeqs(docs: DataFrame): DataFrame =
    docs
      .select(explode(Hashing.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      // '~c1~c2~…~cn~': $1-backreference inserts a trailing ~ per char.
      // (?s) DOTALL is load-bearing for cross-engine parity: without it,
      // Java's '.' skips \r, U+0085, U+2028, U+2029 while RE2's skips only
      // \n — a token containing \r would be marker-encoded differently
      // by the two engines. With DOTALL both mark EVERY codepoint.
      .select(col("word"), col("cnt"),
        concat(lit("~"), regexp_replace(col("word"), "(?s)(.)", "$1~")).as("seq"))

  private def symsOf(seq: Column): Column =
    filter(split(seq, "~"), x => x =!= "")

  private final case class Learned(round: Int, a: String, b: String, cnt: Long)

  /** The merge loop. Returns the learned merges and the word table in its
    * final segmentation. Each round localCheckpoints the (vocab-sized)
    * word table: truncating lineage so the plan doesn't accumulate
    * `Merges × Passes` nested replace expressions, and materializing the
    * state each subsequent round's pair count reads.
    */
  private def learn(s: SparkSession, dir: String): (Seq[Learned], DataFrame) =
    learnDf(s, Tables.documents(s, dir))

  private def learnDf(s: SparkSession, docs: DataFrame): (Seq[Learned], DataFrame) = {
    val sc = s.sparkContext
    // checkpoint ROTATION: each round's localCheckpoint supersedes the
    // previous round's — without unpersisting it, one learn() call
    // retains Merges+1 copies of the word table in the block manager
    // (at a web-scale 10⁷–10⁸-row vocabulary that is real memory), and
    // t20/t21/t23 each run learn(). Track the RDD ids each checkpoint
    // creates and release the superseded generation.
    var prevIds: Set[Int] = Set.empty
    def rotate(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      val created = sc.getPersistentRDDs.keySet.toSet -- before
      prevIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      prevIds = created
      out
    }
    var seqDf = rotate(wordSeqs(docs))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Learned]
    var k = 1
    var exhausted = false
    while (k <= Merges && !exhausted) {
      val syms = symsOf(col("seq"))
      val best = seqDf
        .select(col("cnt"), explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1))).as("pr"))
        .select(col("cnt"), col("pr.0").as("a"), col("pr.1").as("b"))
        .where(col("a") =!= col("b"))
        .groupBy("a", "b").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        require(!a.contains("~") && !b.contains("~"),
          s"marker char leaked into a symbol: '$a','$b'")
        merges += Learned(k, a, b, c)
        var sq: Column = col("seq")
        for (_ <- 1 to Passes)
          sq = replace(sq, lit(s"~$a~$b~"), lit(s"~$a$b~"))
        seqDf = rotate(seqDf.select(col("word"), col("cnt"), sq.as("seq")))
      }
      k += 1
    }
    (merges.toSeq, seqDf)
  }

  /** t20: the learned merge table — `(merge_round, sym_a, sym_b, merged,
    * pair_freq)`, one row per round in learning order. The output is
    * driver-assembled because each row IS a global decision (see the
    * class doc); the distributed work is the per-round pair aggregation.
    */
  def merges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    learn(s, dir)._1
      .map(m => (m.round, m.a, m.b, m.a + m.b, m.cnt))
      .toDF("merge_round", "sym_a", "sym_b", "merged", "pair_freq")
  }

  /** t21: the corpus token histogram under the LEARNED segmentation —
    * the apply path (what a token-budget or packing decision consumes).
    */
  def vocab(s: SparkSession, dir: String): DataFrame = {
    val (_, finalSeqs) = learn(s, dir)
    finalSeqs
      .select(col("cnt"), explode(symsOf(col("seq"))).as("token"))
      .groupBy("token").agg(sum("cnt").as("freq"))
  }

  /** t23: per-document token counts under the LEARNED vocabulary — the
    * apply surface a token-budget or packing decision (t15) actually
    * consumes. The word→symbol-count map is vocabulary-sized, so the
    * join is left UNHINTED (the t14 posture): AQE broadcasts while the
    * vocab fits and degrades to a shuffle join instead of OOM on a
    * heavy-tailed web vocabulary.
    */
  def docTokens(s: SparkSession, dir: String): DataFrame = {
    val (_, finalSeqs) = learn(s, dir)
    val counts = finalSeqs.select(col("word"), size(symsOf(col("seq"))).as("n_syms"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(Hashing.tokens(col("text"))).as("word"))
      .join(counts, Seq("word"))
      .groupBy("doc_id")
      .agg(sum(col("n_syms")).as("n_bpe_tokens"))
  }

  /** The learned merge list in application order, collected (Merges
    * rows) — the artifact a serving/streaming tokenizer ships (the
    * literal-model posture of `LearnedQuality.trainModel`, applied to
    * the tokenizer; consumed by
    * [[graft.streaming.DocStream.bpeSegmented]]).
    */
  def mergeList(s: SparkSession, dir: String): Seq[(String, String)] =
    learn(s, dir)._1.map(m => (m.a, m.b))

  /** Per-row token count under a learned merge list, as ONE codegen
    * expression chain over the WHOLE text — no explode, no join, no
    * state, so it drops into a streaming micro-batch plan as-is.
    *
    * Construction: collapse space runs to a `|` boundary symbol, marker-
    * encode every char, then replay the merge chain globally. `|` can
    * never participate in a merge (learned symbols come from words,
    * which contain no `|`), so boundaries block cross-word merges and
    * each word's rewrite equals the per-word replay exactly. Every
    * merge application removes exactly one `~`, so the final count is
    * pure arithmetic: tokens = (#`~` − 1) − #`|`.
    */
  def tokenCountWithMerges(text: Column, merges: Seq[(String, String)]): Column = {
    var enc: Column = concat(lit("~"),
      regexp_replace(regexp_replace(text, " +", "|"), "(?s)(.)", "$1~"))
    for ((a, b) <- merges; _ <- 1 to Passes)
      enc = replace(enc, lit(s"~$a~$b~"), lit(s"~$a$b~"))
    def cntOf(ch: String) = length(enc) - length(replace(enc, lit(ch), lit("")))
    (cntOf("~") - 1 - cntOf("|")).cast("long")
  }

  /** t24: the BPE train/apply SPLIT — learn on the 80% doc_id split,
    * segment the HELD-OUT 20% by replaying the learned merge list in
    * order (the real tokenizer-inference surface: unseen words segment
    * by merge replay, not by lookup in a seen-word table — the one
    * thing [[docTokens]]'s same-corpus join cannot demonstrate).
    * Segmentation runs over the DISTINCT held-out words (vocab-sized),
    * then joins back per occurrence — the merge replay is a
    * `Merges × Passes` chain of codegen `replace` calls, paid once per
    * distinct word, not per token.
    */
  def heldoutTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (learned, _) = learnDf(s, docs.where(col("doc_id") % 5 < 4))
    val testTok = docs.where(col("doc_id") % 5 >= 4)
      .select(col("doc_id"), explode(Hashing.tokens(col("text"))).as("word"))
    var seq: Column =
      concat(lit("~"), regexp_replace(col("word"), "(?s)(.)", "$1~"))
    for (m <- learned; _ <- 1 to Passes)
      seq = replace(seq, lit(s"~${m.a}~${m.b}~"), lit(s"~${m.a}${m.b}~"))
    val segmented = testTok.select(col("word")).distinct()
      .select(col("word"), size(symsOf(seq)).as("n_syms"))
    testTok.join(segmented, Seq("word"))
      .groupBy("doc_id")
      .agg(sum(col("n_syms")).as("n_bpe_tokens"))
  }

  // ---------------------------------------------------------------- oracle

  /** One (pairs → best → rewrite) CTE stage per round; all MATERIALIZED.
    * `docsWhere` restricts the LEARNING corpus (t24 trains on a split).
    */
  private def oracleChain(n: Int, docsWhere: String = ""): String = {
    val toks = Hashing.sqlTokens("text")
    val stages = new StringBuilder
    stages ++= s"WITH w0 AS MATERIALIZED (SELECT w AS word, COUNT(*) AS cnt FROM (SELECT unnest($toks) AS w FROM documents$docsWhere) GROUP BY w), "
    // \1-backreference: DuckDB's regexp_replace spelling of Spark's $1;
    // 's' flag = the DOTALL of the Spark side's (?s) (see wordSeqs)
    stages ++= raw"s0 AS MATERIALIZED (SELECT word, cnt, '~' || regexp_replace(word, '(.)', '\1~', 'gs') AS seq FROM w0)"
    for (k <- 1 to n) {
      val prev = s"s${k - 1}"
      stages ++= s", p$k AS MATERIALIZED (SELECT pr[1] AS a, pr[2] AS b, CAST(SUM(cnt) AS BIGINT) AS pc FROM (" +
        s"SELECT cnt, unnest([[y[i], y[i+1]] for i in range(1, greatest(len(y),1))]) AS pr " +
        s"FROM (SELECT cnt, list_filter(string_split(seq,'~'), x -> x <> '') AS y FROM $prev)" +
        s") WHERE pr[1] <> pr[2] GROUP BY 1, 2)"
      stages ++= s", b$k AS MATERIALIZED (SELECT $k AS merge_round, a, b, pc FROM p$k ORDER BY pc DESC, a ASC, b ASC LIMIT 1)"
      val rewritten = (1 to Passes).foldLeft("seq") { (e, _) =>
        s"replace($e, '~'||m.a||'~'||m.b||'~', '~'||m.a||m.b||'~')"
      }
      // the UNION ALL arm guards pair exhaustion: with an EMPTY b$k a
      // bare CROSS JOIN would annihilate the word table and every later
      // stage — while the Spark side keeps the final table on exhaustion
      // (the `exhausted` break). Exactly one arm is ever non-empty.
      stages ++= s", s$k AS MATERIALIZED (SELECT s.word, s.cnt, $rewritten AS seq FROM $prev s CROSS JOIN b$k m" +
        s" UNION ALL SELECT word, cnt, seq FROM $prev WHERE NOT EXISTS (SELECT 1 FROM b$k))"
    }
    stages.toString
  }

  val mergesSql: String = {
    val union = (1 to Merges).map(k => s"SELECT * FROM b$k").mkString(" UNION ALL ")
    oracleChain(Merges) +
      s" SELECT CAST(merge_round AS INT) AS merge_round, a AS sym_a, b AS sym_b, a||b AS merged, pc AS pair_freq FROM ($union)"
  }

  val vocabSql: String =
    oracleChain(Merges) +
      s" SELECT y AS token, CAST(SUM(cnt) AS BIGINT) AS freq FROM (SELECT cnt, unnest(list_filter(string_split(seq,'~'), x -> x <> '')) AS y FROM s$Merges) GROUP BY y"

  val docTokensSql: String =
    oracleChain(Merges) +
      s" SELECT doc_id, CAST(SUM(len(list_filter(string_split(m.seq,'~'), x -> x <> ''))) AS BIGINT) AS n_bpe_tokens" +
      s" FROM (SELECT doc_id, unnest(${Hashing.sqlTokens("text")}) AS word FROM documents) t" +
      s" JOIN s$Merges m ON t.word = m.word GROUP BY doc_id"

  /** [[heldoutTokens]] mirror: the learn chain over the train split,
    * then the merge REPLAY over the distinct held-out words (u-stages,
    * same empty-b$k exhaustion guard), joined back per occurrence.
    */
  val heldoutTokensSql: String = {
    val toks = Hashing.sqlTokens("text")
    val sb = new StringBuilder(oracleChain(Merges, " WHERE doc_id % 5 < 4"))
    sb ++= raw", twd AS MATERIALIZED (SELECT DISTINCT w AS word FROM (SELECT unnest($toks) AS w FROM documents WHERE doc_id % 5 >= 4))"
    sb ++= raw", u0 AS MATERIALIZED (SELECT word, '~' || regexp_replace(word, '(.)', '\1~', 'gs') AS seq FROM twd)"
    for (k <- 1 to Merges) {
      val rewritten = (1 to Passes).foldLeft("u.seq") { (e, _) =>
        s"replace($e, '~'||m.a||'~'||m.b||'~', '~'||m.a||m.b||'~')"
      }
      sb ++= s", u$k AS MATERIALIZED (SELECT u.word, $rewritten AS seq FROM u${k - 1} u CROSS JOIN b$k m" +
        s" UNION ALL SELECT word, seq FROM u${k - 1} WHERE NOT EXISTS (SELECT 1 FROM b$k))"
    }
    sb ++= s" SELECT doc_id, CAST(SUM(len(list_filter(string_split(u.seq,'~'), x -> x <> ''))) AS BIGINT) AS n_bpe_tokens" +
      s" FROM (SELECT doc_id, unnest($toks) AS word FROM documents WHERE doc_id % 5 >= 4) t" +
      s" JOIN u$Merges u ON t.word = u.word GROUP BY doc_id"
    sb.toString
  }
}
