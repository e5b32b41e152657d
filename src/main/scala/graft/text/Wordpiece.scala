package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenizer training (r14) — the second tokenizer
  * family a training pipeline meets (the BERT lineage): same
  * word-internal merge machinery as [[Bpe]], but merges are chosen by
  * the LIKELIHOOD-GAIN objective instead of raw pair frequency:
  *
  *   score(a,b) = count(ab) / (count(a) · count(b))
  *
  * (the pair that most exceeds its independence expectation — rare
  * symbol pairs that almost always co-occur merge before frequent
  * but incidental ones). To keep the argmax ENGINE-EXACT the score
  * is quantized to the integer floor(count(ab)·10¹² /
  * (count(a)·count(b))) computed as Decimal(38,0) integral `div` on
  * the Spark side and HUGEINT `//` in the oracle — the qsInterp
  * pattern (Sketches.scala, ADVICE r12) — with ties broken
  * (score desc, l asc, r asc). The quantized score IS the objective
  * both engines share; counts ≤ ~10¹³ stay overflow-free.
  *
  * Same module PRECONDITION as [[Bpe]] (no reserved `(`, `)`, `_` in
  * corpus text), same paren-encoded dictionary, same left-to-right
  * non-overlapping merge application, same early stop. The trained
  * artifact is the merge table + the final dictionary segmentation;
  * per-doc subword counts come from the dictionary join exactly like
  * the BPE path.
  *
  * 100 TB posture: identical to [[Bpe]] — one corpus scan to the
  * vocab-bounded dictionary; the plan-expressible trajectory
  * ([[train]], one job per merge — the twin the oracle CTEs mirror)
  * for the gate, and the driver-local [[trainLocalMerges]] for
  * production budgets (incremental pair/symbol counts; the argmax is
  * a vocab-bounded scan per merge — no lazy heap here because a
  * merge changes the DENOMINATORS of every pair sharing a symbol
  * with it, so cached heap entries can go stale UPWARD, which a
  * lazy-deletion heap cannot see).
  */
object Wordpiece {

  /** Score quantization: floor(c·Scale / (ca·cb)). */
  val Scale = 1000000000000L // 1e12

  /** Per-symbol occurrence counts of a word frame: (sym, c). */
  private def symCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"), explode(Bpe.symbolsOf).as("sym"))
      .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))

  /** Exact quantized likelihood score (the qsInterp Decimal
    * pattern): floor(c·Scale/(ca·cb)) with every operand exact. */
  private def qscoreCol(c: Column, ca: Column, cb: Column): Column =
    call_function("div",
      c.cast("decimal(38,0)") * lit(Scale).cast("decimal(38,0)"),
      ca.cast("decimal(38,0)") * cb.cast("decimal(38,0)")).cast("long")

  /** Pair candidates of a word frame with their quantized scores:
    * (l, r, c, score). */
  private def scoredPairs(words: DataFrame): DataFrame = {
    val pc = Bpe.pairCounts(words)
    val sc = symCounts(words)
    pc.join(sc.select(col("sym").as("l"), col("c").as("ca")), Seq("l"))
      .join(sc.select(col("sym").as("r"), col("c").as("cb")), Seq("r"))
      .select(col("l"), col("r"), col("c"),
        qscoreCol(col("c"), col("ca"), col("cb")).as("score"))
  }

  private def trainLoop(dict: DataFrame, m: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var w = dict
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (e <- 1 to m if !exhausted) {
      val top = scoredPairs(w)
        .orderBy(col("score").desc, col("l"), col("r"))
        .select(col("l"), col("r"), col("score")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, s) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((e, l, r, s))
        w = Bpe.applyMerge(w, l, r)
      }
    }
    (merges.result(), w)
  }

  /** Train `m` merges; returns (rank, l, r, score) — the
    * plan-expressible trajectory the oracle CTEs replay. */
  def train(spark: SparkSession, docs: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = Bpe.wordFrame(docs).persist(MEMORY_AND_DISK)
    val (merges, _) = trainLoop(dict, m)
    import spark.implicits._
    graft.api.Materialize.releasing(
      merges.toDF("rank", "l", "r", "score"), Seq(dict))
  }

  /** Per-doc subword counts under the trained wordpiece dictionary —
    * the same skew-safe hybrid dictionary join as the BPE path. */
  def docTokenCounts(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = Bpe.wordFrame(docs).persist(MEMORY_AND_DISK)
    val (_, merged) = trainLoop(dict, m)
    graft.api.Materialize.releasing(
      Bpe.docTokenCountsOf(docs, merged), Seq(dict))
  }

  // ---- driver-local production trainer ---------------------------------

  /** Quantized score on driver longs, BigInt fallback when a product
    * would overflow (counts past ~3·10⁹ or c past ~9·10⁶). */
  private def qscore(c: Long, ca: Long, cb: Long): Long = {
    if (ca <= Long.MaxValue / cb && c <= Long.MaxValue / Scale)
      (c * Scale) / (ca * cb)
    else (BigInt(c) * Scale / (BigInt(ca) * BigInt(cb))).toLong
  }

  /** Driver-local WordPiece training over the collected word
    * histogram — the [[Bpe.trainLocalMerges]] sibling. Incremental
    * pair and symbol counts; per-merge argmax is a full scan of the
    * live pair map (vocab-bounded) because denominators drift under
    * every merge. Returns the trajectory and the final segmentation. */
  def trainLocalMerges(vocab: Seq[(String, Long)], m: Int)
      : (Seq[(Int, String, String, Long)], Array[(String, Array[String], Long)]) = {
    import scala.collection.mutable
    val mm = new MergeMachine(vocab)
    // symbol occurrence counts (the score denominators), re-folded on
    // every word rewrite via the applyMerge hook — the interning/
    // rewrite machinery itself is MergeMachine, shared with the BPE
    // twin (ADVICE r14 #4)
    val symCount: mutable.LongMap[Long] = mutable.LongMap.empty[Long]
    locally {
      var wi = 0
      while (wi < mm.words.length) {
        val s = mm.words(wi); val c = mm.cnts(wi)
        var i = 0
        while (i < s.length) {
          symCount.update(s(i), symCount.getOrElse(s(i).toLong, 0L) + c)
          i += 1
        }
        wi += 1
      }
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var e = 1
    var done = false
    while (e <= m && !done) {
      // argmax scan: score desc, then (l, r) CODE-POINT order asc —
      // the UTF-8-binary collation of the distributed twins
      // (ADVICE r14 #2, via MergeMachine.symCompare)
      var bestP = -1L; var bestS = -1L
      mm.pairCount.foreach { case (p, c) =>
        val li = mm.left(p); val ri = mm.right(p)
        val s = qscore(c, symCount(li), symCount(ri))
        if (s > bestS) { bestS = s; bestP = p }
        else if (s == bestS && bestP >= 0L) {
          val cl = mm.symCompare(li, mm.left(bestP))
          if (cl < 0 || (cl == 0 && mm.symCompare(ri, mm.right(bestP)) < 0))
            bestP = p
        }
      }
      if (bestP < 0L) done = true
      else {
        val l = mm.left(bestP); val r = mm.right(bestP)
        merges += ((e, mm.symbol(l), mm.symbol(r), bestS))
        val lr = mm.intern(mm.symbol(l) + mm.symbol(r))
        mm.applyMerge(l, r, lr,
          onPair = (_, _) => (),
          onWordRewrite = (old, ns, c0) => {
            var i = 0
            while (i < old.length) {
              val n = symCount(old(i)) - c0
              if (n <= 0L) symCount.remove(old(i))
              else symCount.update(old(i), n)
              i += 1
            }
            i = 0
            while (i < ns.length) {
              symCount.update(ns(i), symCount.getOrElse(ns(i).toLong, 0L) + c0)
              i += 1
            }
          })
        e += 1
      }
    }
    (merges.result(), mm.segmentation)
  }

  /** [[train]] on the production path (histogram collect + local
    * trainer) — bit-identical trajectory, pinned in WordpieceSpec. */
  def trainFast(spark: SparkSession, docs: DataFrame, m: Int): DataFrame = {
    import spark.implicits._
    trainLocalMerges(Bpe.collectHistogram(docs), m)._1
      .toDF("rank", "l", "r", "score")
  }

  /** [[docTokenCounts]] on the production path. */
  def docTokenCountsFast(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import spark.implicits._
    val (_, dict) = trainLocalMerges(Bpe.collectHistogram(docs), m)
    Bpe.docTokenCountsFromLens(docs, dict.toSeq
      .map { case (tok, syms, c) => (tok, syms.length.toLong, c) }
      .toDF("tok", "n_sub", "cnt"))
  }

  // ---- oracle twins ----------------------------------------------------

  /** Trajectory CTEs: per epoch, symbol counts s{e-1}, scored pairs,
    * the quantized-score argmax b$e, and the rewritten dictionary
    * w$e — exhausted epochs are no-ops exactly like the BPE twin. */
  private def sqlTrainCtes(m: Int): String = {
    val epochs = (1 to m).map { e =>
      val p = e - 1
      s"""sy$e AS (SELECT sym, CAST(SUM(cnt) AS HUGEINT) AS c
           FROM (SELECT unnest(string_split(s[2:-2], ')(')) AS sym, cnt
                 FROM w$p)
           GROUP BY 1),
         p$e AS (SELECT ss[i] AS l, ss[i+1] AS r,
             CAST(SUM(cnt) AS HUGEINT) AS c
           FROM (SELECT unnest(generate_series(1, len(ss) - 1)) AS i, ss, cnt
                 FROM (SELECT string_split(s[2:-2], ')(') AS ss, cnt FROM w$p))
           GROUP BY 1, 2),
         b$e AS MATERIALIZED (
           SELECT $e AS rank, p.l AS l, p.r AS r,
             CAST(p.c * $Scale // (sa.c * sb.c) AS BIGINT) AS score
           FROM p$e p JOIN sy$e sa ON sa.sym = p.l
             JOIN sy$e sb ON sb.sym = p.r
           ORDER BY score DESC, l, r LIMIT 1),
         w$e AS MATERIALIZED (
           SELECT tok, replace(s,
               '(' || COALESCE((SELECT l FROM b$e), '') || ')(' ||
                 COALESCE((SELECT r FROM b$e), '') || ')',
               '(' || COALESCE((SELECT l || r FROM b$e), '') || ')') AS s, cnt
           FROM w$p)"""
    }
    s"""${Bpe.sqlWordFrameCte},
       ${epochs.mkString(",\n       ")}"""
  }

  /** SQL twin of [[train]]/[[trainFast]]. */
  def sqlTrain(m: Int): String = {
    val sel = (1 to m).map(e => s"SELECT rank, l, r, score FROM b$e")
      .mkString("\n       UNION ALL ")
    s"""WITH ${sqlTrainCtes(m)}
       $sel"""
  }

  /** SQL twin of [[docTokenCounts]]/[[docTokenCountsFast]]. */
  def sqlDocTokenCounts(m: Int): String =
    s"""WITH ${sqlTrainCtes(m)},
       dt AS (SELECT doc_id,
           CAST(SUM(len(string_split(w.s[2:-2], ')('))) AS BIGINT)
             AS n_subwords
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents) d
         JOIN w$m w USING (tok)
         GROUP BY doc_id)
       SELECT doc_id, n_subwords FROM dt"""
}
