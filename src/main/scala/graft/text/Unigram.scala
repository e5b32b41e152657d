package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unigram-LM (SentencePiece-style) tokenizer training (r15) — the
  * third production tokenizer family (Kudo 2018 lineage), completing
  * the triad next to [[Bpe]] (frequency merges) and [[Wordpiece]]
  * (likelihood-gain merges): instead of growing a vocabulary by
  * merging, a LARGE SEED of candidate pieces (every word substring up
  * to [[MaxPieceLen]]) is fit as a unigram language model and pruned
  * by EM — each round segments every word into its most probable
  * piece sequence under the current model, re-estimates piece counts
  * from those segmentations, and drops pieces the model stopped
  * using; the final vocabulary keeps the top-K surviving multi-char
  * pieces plus every single character (so segmentation totality is
  * structural, never data-dependent).
  *
  * ENGINE-EXACT EM: upstream SentencePiece runs soft EM
  * (forward-backward expected counts) over float log-probs and prunes
  * by lattice likelihood loss — none of which two engines reproduce
  * bit-for-bit. This module implements the HARD-EM (Viterbi) variant
  * with an INTEGER objective, so the whole trajectory — scores, DP,
  * tie-breaks, pruning, top-K — is replayed exactly by the DuckDB
  * oracle:
  *
  *  - piece cost = qlog(total) − qlog(count): a quantized −log₂
  *    probability in 1/65536 bits, where [[qlog]] is a pure
  *    shift-and-square integer algorithm (16 fraction bits, 30-bit
  *    truncated mantissa — both engines run the SAME integer ops, so
  *    the value is defined by the algorithm, overflow-free in Long);
  *  - Viterbi minimizes total cost over a word's segmentations,
  *    ties broken toward the SMALLEST predecessor position (longest
  *    final piece) via the packed key `cand·1024 + j` — one integer
  *    min, no float anywhere;
  *  - counts below 1 never exist: single-char pieces that fall out
  *    of use are floored to count 1 (they must stay scorable — they
  *    are the totality fallback), multi-char pieces at count 0 are
  *    pruned.
  *
  * All positions/lengths are CODE POINTS (DuckDB's character
  * semantics; the Scala side walks `codePoints()` — `String.length`
  * would diverge on supplementary planes, the MergeMachine lesson).
  *
  * 100 TB posture: identical to the [[Bpe]] production path — ONE
  * corpus scan folds to the vocab-bounded (word, count) histogram
  * (Zipf-bounded, [[Bpe.collectHistogram]]) and training runs
  * driver-local: O(rounds × Σ|w|·MaxPieceLen) hash-map work, corpus
  * size only enters through the scan. Serving (per-doc token counts)
  * is the shared skew-safe dictionary join
  * ([[Bpe.docTokenCountsFromLens]]). There is deliberately NO
  * per-iteration distributed trajectory twin: unlike the merge
  * families, an EM round is not a single plan-expressible rewrite —
  * the oracle replays the trajectory instead (Viterbi as a recursive
  * CTE, qlog as unrolled integer steps), which is the stronger
  * cross-engine check.
  */
object Unigram {

  /** Longest candidate piece (code points). */
  val MaxPieceLen = 4

  /** Seed floor: multi-char substrings must occur this often. */
  val MinSeedCount = 2L

  /** EM rounds before the top-K cut. */
  val Rounds = 2

  /** Multi-char vocabulary budget (singles ride along for free). */
  val VocabK = 512

  /** Quantized log₂ in 1/65536 bits: integer exponent from the bit
    * length, 16 fraction bits by shift-and-square over a 30-bit
    * truncated mantissa. Deterministic BY ALGORITHM (the truncation
    * is part of the definition, mirrored in SQL) — not claimed to be
    * the exactly-rounded floor(2¹⁶·log₂ n), just the same integer in
    * both engines. Monotone nondecreasing in n. */
  def qlog(n: Long): Long = {
    require(n > 0, s"qlog of non-positive $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var m = if (e <= 30) n << (30 - e) else n >> (e - 30)
    var acc = e.toLong << 16
    var k = 1
    while (k <= 16) {
      m = (m * m) >> 30
      if (m >= (1L << 31)) { m >>= 1; acc |= 1L << (16 - k) }
      k += 1
    }
    acc
  }

  private[text] def cps(tok: String): Array[Int] = tok.codePoints().toArray

  private def pieceOf(c: Array[Int], from: Int, until: Int): String =
    new String(c, from, until - from)

  /** Viterbi-segment one word under piece costs: returns the piece
    * sequence of the minimum-cost segmentation, ties toward the
    * smallest predecessor j (packed key `cand·1024 + j` — word
    * length < 1024 enforced). Total because every single char is
    * live. */
  private[text] def viterbi(c: Array[Int], cost: collection.Map[String, Long])
      : Seq[String] = {
    val L = c.length
    require(L < 1024, s"word of ${L} code points exceeds the DP key bound")
    val dp = new Array[Long](L + 1)
    val bestJ = new Array[Int](L + 1)
    val bestPiece = new Array[String](L + 1)
    var i = 1
    while (i <= L) {
      var bestKey = Long.MaxValue
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        cost.get(pieceOf(c, j, i)) match {
          case Some(pc) =>
            val key = (dp(j) + pc) * 1024 + j
            if (key < bestKey) {
              bestKey = key; bestJ(i) = j; bestPiece(i) = pieceOf(c, j, i)
            }
          case None => ()
        }
        j += 1
      }
      require(bestKey != Long.MaxValue,
        s"no live piece covers position $i of '${new String(c, 0, L)}'")
      dp(i) = bestKey / 1024
      i += 1
    }
    var out = List.empty[String]
    var p = L
    while (p > 0) { out = bestPiece(p) :: out; p = bestJ(p) }
    out
  }

  private[text] def costsOf(live: collection.Map[String, Long])
      : collection.Map[String, Long] = {
    val total = live.valuesIterator.sum
    val qTotal = qlog(total)
    live.map { case (p, n) => (p, qTotal - qlog(n)) }
  }

  /** The full driver-local trajectory over a word histogram:
    * (finalVocab sorted (cnt desc, piece asc code-point),
    *  per-word final piece counts (tok, nPieces, cnt)). */
  def trainLocal(vocab: Seq[(String, Long)])
      : (Seq[(String, Long)], Seq[(String, Long, Long)]) = {
    import scala.collection.mutable
    val words = vocab.map { case (t, n) => (t, cps(t), n) }
    // seed: every substring up to MaxPieceLen, overlapping
    // occurrences each counted, weighted by word count
    val seed = mutable.HashMap.empty[String, Long]
    words.foreach { case (_, c, n) =>
      var s = 0
      while (s < c.length) {
        var l = 1
        while (l <= MaxPieceLen && s + l <= c.length) {
          val p = pieceOf(c, s, s + l)
          seed.update(p, seed.getOrElse(p, 0L) + n)
          l += 1
        }
        s += 1
      }
    }
    val singles: Seq[String] =
      seed.keysIterator.filter(s => s.codePointCount(0, s.length) == 1).toSeq
    var live: mutable.HashMap[String, Long] = seed.filter { case (p, n) =>
      p.codePointCount(0, p.length) == 1 || n >= MinSeedCount
    }
    // EM rounds: Viterbi counts -> prune unused multis, floor singles
    for (_ <- 1 to Rounds) {
      val cost = costsOf(live)
      val counts = mutable.HashMap.empty[String, Long]
      words.foreach { case (_, c, n) =>
        viterbi(c, cost).foreach(p =>
          counts.update(p, counts.getOrElse(p, 0L) + n))
      }
      val next = mutable.HashMap.empty[String, Long]
      counts.foreach { case (p, n) =>
        if (p.codePointCount(0, p.length) > 1) next.update(p, n)
      }
      singles.foreach(s => next.update(s, math.max(counts.getOrElse(s, 0L), 1L)))
      live = next
    }
    // top-K multis by (cnt desc, piece asc code-point) + all singles
    val multis = live.iterator
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .toSeq
      .sortWith { case ((pa, na), (pb, nb)) =>
        if (na != nb) na > nb else MergeMachine.cpCompare(pa, pb) < 0
      }
      .take(VocabK)
    val finalVocab = (multis ++ singles.map(s => (s, live(s))))
      .sortWith { case ((pa, na), (pb, nb)) =>
        if (na != nb) na > nb else MergeMachine.cpCompare(pa, pb) < 0
      }
    // final tokenization pass under the cut vocabulary
    val finalCost = costsOf(finalVocab.toMap)
    val lens = words.map { case (t, c, n) =>
      (t, viterbi(c, finalCost).length.toLong, n)
    }
    (finalVocab, lens)
  }

  /** Train over the corpus (one histogram scan + local EM): the final
    * vocabulary (piece, cnt). */
  def trainFast(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    trainLocal(Bpe.collectHistogram(docs))._1.toDF("piece", "cnt")
  }

  /** Per-doc token counts under the trained unigram vocabulary — the
    * shared skew-safe dictionary join. */
  def docTokenCountsFast(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val lens = trainLocal(Bpe.collectHistogram(docs))._2
    Bpe.docTokenCountsFromLens(docs, lens.toDF("tok", "n_sub", "cnt"))
  }

  // ---- oracle twins ----------------------------------------------------

  /** qlog over a value column as SQL: the identical shift-and-square
    * integer steps, unrolled as 16 chained CTE stages over
    * `(src)`'s `v BIGINT` column. Emits CTEs `{p}0..{p}16`; read
    * `SELECT v, acc FROM {p}16`. */
  private def sqlQlogCtes(p: String, src: String): String = {
    val init =
      s"""${p}0q AS (SELECT v, length(printf('%b', v)) - 1 AS e FROM $src),
         ${p}0 AS (SELECT v,
             CASE WHEN e <= 30 THEN v * (CAST(1 AS BIGINT) << (30 - e))
                  ELSE v >> (e - 30) END AS m,
             CAST(e AS BIGINT) * 65536 AS acc
           FROM ${p}0q)"""
    val steps = (1 to 16).map { k =>
      s"""${p}$k AS (SELECT v,
           CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
                THEN ((m * m) >> 30) >> 1 ELSE (m * m) >> 30 END AS m,
           acc + CASE WHEN ((m * m) >> 30) >= (CAST(1 AS BIGINT) << 31)
                      THEN CAST(1 AS BIGINT) << ${16 - k} ELSE 0 END AS acc
         FROM ${p}${k - 1})"""
    }
    (init +: steps).mkString(",\n       ")
  }

  /** One EM/tokenization stage as CTEs: from live piece counts
    * `$live(piece, cnt)`, derive costs (`${p}cost`) and the Viterbi
    * result per word (`${p}vit`: tok, cnt, seg LIST(VARCHAR)) over
    * the word frame `uw(tok, cnt)`. */
  private def sqlViterbiCtes(p: String, live: String): String =
    s"""${p}tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS v FROM $live),
       ${sqlQlogCtes(p + "qt", s"${p}tot")},
       ${sqlQlogCtes(p + "qc",
        s"(SELECT DISTINCT CAST(cnt AS BIGINT) AS v FROM $live)")},
       ${p}cost AS MATERIALIZED (
         SELECT l.piece AS piece,
           (SELECT acc FROM ${p}qt16) - q.acc AS cost
         FROM $live l JOIN ${p}qc16 q ON q.v = l.cnt),
       ${p}vit AS MATERIALIZED (
         WITH RECURSIVE vv(tok, cnt, i, dp, segs) AS (
           SELECT tok, cnt, 0, [CAST(0 AS BIGINT)],
             [CAST([] AS VARCHAR[])]
           FROM uw
           UNION ALL
           SELECT vv.tok, vv.cnt, vv.i + 1,
             list_append(vv.dp, min(vv.dp[t.j + 1] + c.cost)),
             list_append(vv.segs,
               min_by(list_append(vv.segs[t.j + 1], c.piece),
                 (vv.dp[t.j + 1] + c.cost) * 1024 + t.j))
           FROM vv,
             unnest(generate_series(greatest(0, vv.i + 1 - $MaxPieceLen),
               vv.i)) AS t(j),
             ${p}cost c
           -- the piece lookup is a WHERE filter, not an explicit JOIN:
           -- DuckDB plans a lateral-correlated ON inside a recursive
           -- term to an empty match (observed r15); the comma-join
           -- form evaluates correctly
           WHERE vv.i < length(vv.tok)
             AND c.piece = substring(vv.tok, t.j + 1, vv.i + 1 - t.j)
           GROUP BY vv.tok, vv.cnt, vv.i, vv.dp, vv.segs
         )
         SELECT tok, cnt, segs[length(tok) + 1] AS seg
         FROM vv WHERE i = length(tok))"""

  /** The shared trajectory CTE chain: word frame `uw`, seed `live1`,
    * EM rounds to `live${Rounds+1}`-equivalent, ending in the final
    * vocabulary `uvocab(piece, cnt)` and final per-word counts
    * `ulens(tok, n_sub, cnt)`. */
  private[text] def sqlTrajectoryCtes: String = {
    val seed =
      s"""uw AS MATERIALIZED (
           -- the same <1024 guard the Scala viterbi enforces (review
           -- r15 #4): past it the packed tie key's j field would bleed
           -- into the cost field and the twins would diverge silently
           SELECT CASE WHEN length(tok) >= 1024
                  THEN error('word too long for the Viterbi tie key')
                  ELSE tok END AS tok,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           GROUP BY tok),
         useed AS (
           SELECT substring(tok, s, l) AS piece,
             CAST(SUM(cnt) AS BIGINT) AS cnt
           FROM uw,
             unnest(generate_series(1, length(tok))) AS ts(s),
             unnest(generate_series(1, $MaxPieceLen)) AS tl(l)
           WHERE s + l - 1 <= length(tok)
           GROUP BY 1),
         live1 AS MATERIALIZED (
           SELECT piece, cnt FROM useed
           WHERE length(piece) = 1 OR cnt >= $MinSeedCount)"""
    val rounds = (1 to Rounds).map { r =>
      s"""${sqlViterbiCtes(s"r$r", s"live$r")},
         rcnt$r AS MATERIALIZED (
           SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt
           FROM (SELECT unnest(seg) AS piece, cnt FROM r${r}vit)
           GROUP BY piece),
         live${r + 1} AS MATERIALIZED (
           SELECT piece, cnt FROM rcnt$r WHERE length(piece) > 1
           UNION ALL
           SELECT s.piece, greatest(COALESCE(c.cnt, 0), 1) AS cnt
           FROM (SELECT piece FROM live1 WHERE length(piece) = 1) s
           LEFT JOIN rcnt$r c ON c.piece = s.piece)"""
    }
    val fin =
      s"""uvocab AS MATERIALIZED (
           SELECT piece, cnt FROM (
             SELECT piece, cnt FROM live${Rounds + 1}
             WHERE length(piece) > 1
             ORDER BY cnt DESC, piece LIMIT $VocabK)
           UNION ALL
           SELECT piece, cnt FROM live${Rounds + 1} WHERE length(piece) = 1),
         ${sqlViterbiCtes("fin", "uvocab")},
         ulens AS MATERIALIZED (
           SELECT tok, CAST(len(seg) AS BIGINT) AS n_sub, cnt
           FROM finvit)"""
    (Seq(seed) ++ rounds ++ Seq(fin)).mkString(",\n       ")
  }

  /** SQL twin of [[trainFast]]. */
  def sqlTrain: String =
    s"""WITH $sqlTrajectoryCtes
       SELECT piece, cnt FROM uvocab"""

  /** SQL twin of [[docTokenCountsFast]]. */
  def sqlDocTokenCounts: String =
    s"""WITH $sqlTrajectoryCtes
       SELECT doc_id, CAST(SUM(l.n_sub) AS BIGINT) AS n_subwords
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents) d
       JOIN ulens l USING (tok)
       GROUP BY doc_id"""
}
