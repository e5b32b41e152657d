package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over the corpus — the merge
  * table a training pipeline learns BEFORE it can token-count, pack
  * or dedup at the subword level (Sennrich 2016 shape: word-internal
  * merges, explicit end-of-word marker).
  *
  * The corpus is scanned ONCE into a (word, count) dictionary — the
  * classic subword-nmt preprocessing step — and every merge epoch
  * then runs on that vocab-sized frame, never the corpus. Words are
  * kept in an unambiguous paren-delimited symbol string
  * (`cat` → `(c)(a)(t)(_)`): applying merge (l,r) is then a plain
  * left-to-right non-overlapping string replace of `(l)(r)` with
  * `(lr)` — exactly BPE's greedy application order, and an operation
  * whose semantics Spark and DuckDB share, so the oracle replays the
  * whole trajectory as unrolled epoch CTEs (materialized — the
  * word frame is referenced twice per epoch). Distinct words stay
  * distinct strings under merging (concatenating a string's symbols
  * recovers the word), so the dictionary never needs regrouping.
  *
  * Argmax tie-break is (count desc, l asc, r asc) — pure-ASCII
  * symbols, so lexicographic order agrees across engines.
  *
  * PRECONDITION (whole module): corpus text must not contain the
  * encoding's three reserved characters `(`, `)`, `_` — they delimit
  * symbols and mark word ends, so text containing them would make
  * the paren encoding ambiguous (and would let a learned merge's
  * left element end in `_`, breaking [[tokenCountWith]]'s cross-word
  * safety argument). The testdata corpus is lowercase a-z + space;
  * a general deployment strips or escapes the three characters in
  * its normalization pass, where the rest of the cleaning already
  * happens. All other characters (digits, newlines, unicode) are
  * fine: the char split is DOTALL on both engines.
  *
  * 100 TB posture: one corpus scan builds the dictionary (groupBy
  * word, map-side combine, Zipf-bounded result). Production training
  * ([[trainFast]]) collects that vocab-bounded histogram to the
  * driver and runs the classic incremental in-memory trainer
  * ([[trainLocalMerges]]) — m=32k merges in seconds, flat in corpus
  * size past the scan (measured, DevScaleBpe). The fully-distributed
  * trajectory ([[train]] — one explode+HashAggregate epoch per merge,
  * each finished by a TakeOrderedAndProject top-1 and a per-row
  * codegen'd string-replace rewrite) is kept as the plan-expressible
  * twin the oracle CTEs mirror; the two are trajectory-identical
  * (pinned in BpeSpec). Nothing corpus-sized moves after the first
  * scan on either path.
  */
object Bpe {

  /** (tok, s, cnt) word dictionary: each distinct whitespace token
    * with its initial symbol string (`_` end-of-word marker) and
    * corpus count. The corpus alphabet is lowercase ASCII, so `(`,
    * `)` and `_` are never part of a symbol. `tok` rides along so
    * per-document encodings can join back ([[docTokenCounts]]). */
  def wordFrame(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(col("tok"),
        concat(regexp_replace(col("tok"), "(?s)(.)", "($1)"), lit("(_)")).as("s"),
        col("cnt"))

  /** The paren-encoded symbol array of a dictionary frame's `s`
    * column — ONE definition for every consumer in this module and
    * [[Wordpiece]] (review r14 #3). */
  private[text] def symbolsOf: Column =
    split(expr("substring(s, 2, char_length(s) - 2)"), "\\)\\(")

  /** Per-doc subword counts from a TRAINED dictionary frame
    * (tok, s, cnt): per-word segmentation lengths joined to the
    * corpus explode with the skew-safe hybrid weight join — shared
    * by the BPE and WordPiece token-count paths (review r14 #3). */
  private[text] def docTokenCountsOf(docs: DataFrame, merged: DataFrame)
      : DataFrame =
    docTokenCountsFromLens(docs, merged.select(col("tok"),
      size(symbolsOf).cast("long").as("n_sub"), col("cnt")))

  /** The corpus half of the token-count join, from any
    * (tok, n_sub, cnt) length frame (distributed dict or the local
    * trainers' collected one). */
  private[text] def docTokenCountsFromLens(docs: DataFrame,
      wordLens: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    CorpusScoring.hybridWeightJoin(toks, wordLens,
        Seq("tok"), "cnt", hotN = 64, joinType = "inner")
      .groupBy(col("doc_id")).agg(sum(col("n_sub")).as("n_subwords"))
  }

  /** Byte-fallback sibling of [[wordFrame]] (r16, VERDICT r15 missing
    * #5 — the GPT-2-lineage leg): initial symbols are UTF-8 BYTES
    * spelled `b` + two lowercase hex digits, a 256-symbol alphabet
    * that segments ANY input — no OOV story, the reserved-character
    * precondition lifted (symbols never contain raw text characters).
    * Everything downstream (pair counts, merges, the `(l)(r)`→`(lr)`
    * rewrite, token counting) is representation-agnostic and reused
    * verbatim. */
  def wordFrameBytes(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(col("tok"),
        concat(regexp_replace(lower(hex(encode(col("tok"), "UTF-8"))),
          "(..)", "(b$1)"), lit("(_)")).as("s"),
        col("cnt"))

  /** Adjacent-pair counts of a word frame: (l, r, c). */
  def pairCounts(words: DataFrame): DataFrame = {
    val ss = symbolsOf
    words
      .select(col("cnt"), ss.as("ss"))
      .select(col("cnt"), explode(zip_with(
        slice(col("ss"), lit(1), size(col("ss")) - 1),
        slice(col("ss"), lit(2), size(col("ss")) - 1),
        (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** The merge-application rewrite for one learned pair. Built with
    * the Column API (literal pattern/replacement), not an interpolated
    * expr string — a learned symbol containing a quote or backslash
    * (apostrophes survive the module precondition, which only
    * reserves `(`, `)`, `_`) must not be parsed as SQL
    * ([[tokenCountWith]] already does it this way). */
  private[text] def applyMerge(w: DataFrame, l: String, r: String): DataFrame =
    w.withColumn("s", replace(col("s"), lit(s"($l)($r)"), lit(s"($l$r)")))

  /** The epoch loop over a (persisted) dictionary: at most `m`
    * (pair-count → top-1 → rewrite) rounds, each a bounded 1-row
    * driver collect. Returns the merge trajectory and the final
    * (still lazy) dictionary frame. */
  private def trainLoop(dict: DataFrame, m: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var w = dict
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (e <- 1 to m if !exhausted) {
      val top = pairCounts(w)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((e, l, r, c))
        w = applyMerge(w, l, r)
      }
    }
    (merges.result(), w)
  }

  /** The collected word histogram — the driver-local trainer's
    * input. Vocab-bounded, NOT corpus-bounded: the corpus folds to
    * (distinct word, count) in one scan with map-side combine, and
    * natural-language vocabularies are Zipf-bounded (a 100 TB crawl's
    * count>=2 vocabulary is tens of millions of short strings — a
    * few GB on a driver, the exact working set subword-nmt and every
    * production BPE trainer holds in memory). A deployment trimming
    * pathological vocabularies (random-byte spam) applies a count
    * floor in the same aggregate before the collect. */
  private[text] def collectHistogram(docs: DataFrame): Seq[(String, Long)] =
    docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .collect().iterator.map(r => (r.getString(0), r.getLong(1))).toVector

  /** Driver-local incremental BPE training over a word histogram —
    * the production-vocab path. [[trainLoop]] runs ONE Spark job per
    * merge (fine at the oracle's m=12, unusable at a real 32k-merge
    * vocab: 32k sequential jobs with O(m²) cumulative plan rewrites);
    * this trainer replays the exact same argmax trajectory in driver
    * memory with the classic incremental structure — adjacent-pair
    * counts in a hash map, a lazy-deletion max-heap for the argmax,
    * and a pair→words index so each merge touches only the words
    * that contain it (symbols interned to int ids — pair keys are a
    * single Long in a LongMap, no allocation in the update loop).
    * One merge costs O(affected words × word len): measured
    * (DevScaleBpe) m=8,000 merges train in ~4 s over a 50k-word
    * vocabulary and ~26 s over 190k words, independent of corpus
    * size — vs ONE SPARK JOB PER MERGE (~5 s for just m=12 at
    * sf0.1) on the distributed trajectory.
    *
    * Trajectory-identical to [[trainLoop]] by construction, pinned
    * by BpeSpec: same argmax tie-break (count desc, l asc, r asc in
    * CODE-POINT order — [[MergeMachine.cpCompare]], the unsigned
    * UTF-8-byte collation Spark's UTF8String and DuckDB share, so
    * the agreement holds beyond ASCII — ADVICE r14 #2), same
    * left-to-right non-overlapping merge application as the
    * `(l)(r)`→`(lr)` string replace, same early stop when the
    * dictionary is fully merged. The interning/rewrite machinery is
    * [[MergeMachine]], shared with the WordPiece twin (ADVICE r14
    * #4); only the lazy-deletion max-heap argmax lives here.
    *
    * Returns the merge trajectory and the final per-word
    * segmentation (tok, symbols, cnt). */
  def trainLocalMerges(vocab: Seq[(String, Long)], m: Int,
      segmenter: String => Array[String] = MergeMachine.codePointSegmenter)
      : (Seq[(Int, String, String, Long)], Array[(String, Array[String], Long)]) = {
    import scala.collection.mutable
    val mm = new MergeMachine(vocab, segmenter)
    // max-heap ordered exactly like the distributed argmax:
    // count desc, then l asc, r asc (code-point order of the symbols)
    val ord = new Ordering[(Long, Long)] { // (count, pairKey)
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val cl = mm.symCompare(mm.left(b._2), mm.left(a._2))
          if (cl != 0) cl
          else mm.symCompare(mm.right(b._2), mm.right(a._2))
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, Long)](ord)
    mm.pairCount.foreach { case (p, c) => heap.enqueue((c, p)) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var e = 1
    var done = false
    while (e <= m && !done) {
      // lazy deletion: pop until the entry's count matches the live
      // map (a re-attained count is equally valid — same key, same
      // count, same ordering position). Sound for THIS objective
      // because a stale frequency only ever goes stale DOWNWARD.
      var topC = -1L; var topP = -1L
      while (topC < 0L && heap.nonEmpty) {
        val t = heap.dequeue()
        if (mm.pairCount.get(t._2).contains(t._1)) { topC = t._1; topP = t._2 }
      }
      if (topC < 0L) done = true
      else {
        val l = mm.left(topP); val r = mm.right(topP)
        merges += ((e, mm.symbol(l), mm.symbol(r), topC))
        val lr = mm.intern(mm.symbol(l) + mm.symbol(r))
        mm.applyMerge(l, r, lr,
          onPair = (p, n) => heap.enqueue((n, p)),
          onWordRewrite = (_, _, _) => ())
        e += 1
      }
    }
    (merges.result(), mm.segmentation)
  }

  /** [[train]] on the production path: one corpus scan collects the
    * vocab-bounded histogram, [[trainLocalMerges]] learns the table
    * in driver memory. Bit-identical merge table (the trained table
    * is the contract, not the training plan) — BpeSpec pins
    * trainFast ≡ train on the real corpus, and the oracle SQL still
    * replays the trajectory independently. */
  def trainFast(spark: SparkSession, docs: DataFrame, m: Int): DataFrame = {
    import spark.implicits._
    trainLocalMerges(collectHistogram(docs), m)._1.toDF("rank", "l", "r", "c")
  }

  /** [[encodeVocab]] on the production path: the final segmentation
    * lives in the trainer's dictionary already weighted by corpus
    * counts, so the subword histogram folds locally over the
    * vocab-bounded dict — the corpus is still scanned exactly once
    * (the histogram collect). */
  def encodeVocabFast(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import spark.implicits._
    import scala.collection.mutable
    val (_, dict) = trainLocalMerges(collectHistogram(docs), m)
    val hist = mutable.HashMap.empty[String, Long]
    dict.foreach { case (_, syms, c) =>
      syms.foreach(s => hist.update(s, hist.getOrElse(s, 0L) + c))
    }
    hist.toSeq.toDF("sym", "cnt")
  }

  /** [[docTokenCounts]] on the production path: per-word subword
    * lengths come straight from the locally-trained dictionary (a
    * vocab-bounded local frame), joined to the corpus explode with
    * the same skew-safe hybrid weight join. */
  def docTokenCountsFast(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import spark.implicits._
    val (_, dict) = trainLocalMerges(collectHistogram(docs), m)
    docTokenCountsFromLens(docs, dict.toSeq
      .map { case (tok, syms, c) => (tok, syms.length.toLong, c) }
      .toDF("tok", "n_sub", "cnt"))
  }

  /** [[trainFast]] on the byte-fallback alphabet (r16). */
  def trainFastBytes(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import spark.implicits._
    trainLocalMerges(collectHistogram(docs), m, MergeMachine.byteSegmenter)
      ._1.toDF("rank", "l", "r", "c")
  }

  /** [[docTokenCountsFast]] on the byte-fallback alphabet (r16):
    * per-word subword lengths from the byte-segmented local dict,
    * joined with the same skew-safe hybrid weight join. */
  def docTokenCountsFastBytes(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import spark.implicits._
    val (_, dict) = trainLocalMerges(collectHistogram(docs), m,
      MergeMachine.byteSegmenter)
    docTokenCountsFromLens(docs, dict.toSeq
      .map { case (tok, syms, c) => (tok, syms.length.toLong, c) }
      .toDF("tok", "n_sub", "cnt"))
  }

  /** Distributed twin of [[trainFastBytes]] — the plan-expressible
    * byte-alphabet trajectory the oracle CTEs mirror (BpeSpec pins
    * local ≡ distributed, same as the char leg). */
  def trainBytes(spark: SparkSession, docs: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = wordFrameBytes(docs).persist(MEMORY_AND_DISK)
    val (merges, _) = trainLoop(dict, m)
    import spark.implicits._
    graft.api.Materialize.releasing(
      merges.toDF("rank", "l", "r", "c"), Seq(dict))
  }

  /** Serve a trained byte-level merge table on ONE word — the
    * no-OOV contract: any Unicode string (supplementary planes,
    * emoji, raw controls) segments to byte symbols and the merges
    * apply in rank order, exactly the greedy left-to-right
    * non-overlapping order of the training rewrite. Driver/executor
    * utility (a per-row serving head); the gate's corpus-shaped
    * paths go through the dictionary join. */
  def encodeWordBytes(merges: Seq[(String, String)], word: String)
      : Seq[String] = {
    var syms = MergeMachine.byteSegmenter(word).toVector :+ "_"
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Train `m` merges; returns the merge table
    * (rank, l, r, c) — rank 1..m in merge order, c the pair count
    * that won the rank. Stops early if the dictionary is fully
    * merged; the SQL twin mirrors the stop (exhausted epoch CTEs
    * are provable no-ops), so both sides return the same shorter
    * merge table.
    *
    * This is the fully-distributed trajectory (one job per merge) —
    * kept as the plan-expressible twin the oracle CTEs mirror and
    * BpeSpec cross-checks; production training goes through
    * [[trainFast]]. */
  def train(spark: SparkSession, docs: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = wordFrame(docs).persist(MEMORY_AND_DISK)
    val (merges, _) = trainLoop(dict, m)
    import spark.implicits._
    graft.api.Materialize.releasing(
      merges.toDF("rank", "l", "r", "c"), Seq(dict))
  }

  /** Train `m` merges and APPLY them corpus-wide: the resulting
    * subword vocabulary histogram (sym, cnt) — cnt the subword's
    * total corpus occurrence count. Encoding reuses the trained
    * dictionary (each word's final segmentation × its corpus count),
    * so the corpus is still scanned exactly once. */
  def encodeVocab(spark: SparkSession, docs: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = wordFrame(docs).persist(MEMORY_AND_DISK)
    val (_, merged) = trainLoop(dict, m)
    graft.api.Materialize.releasing(
      merged.select(explode(symbolsOf).as("sym"), col("cnt"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("cnt")),
      Seq(dict))
  }

  /** Train `m` merges and count each document's SUBWORD tokens —
    * the tokenizer-aware length a packing/budget stage actually needs
    * (whitespace counts under-budget long rare words, which BPE
    * splits). Per distinct word the final segmentation length comes
    * from the trained dictionary; the corpus explode joins it with
    * the skew-safe hybrid weight join (the word dictionary IS a
    * Zipf-frequency table, so hot words take the broadcast path and
    * only tail words enter the keyed shuffle) and sums per doc. */
  def docTokenCounts(spark: SparkSession, docs: DataFrame, m: Int)
      : DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = wordFrame(docs).persist(MEMORY_AND_DISK)
    val (_, merged) = trainLoop(dict, m)
    graft.api.Materialize.releasing(
      docTokenCountsOf(docs, merged), Seq(dict))
  }

  /** Frozen-tokenizer subword counting as a STATELESS projection:
    * the learned merge table inlines as a chain of string replaces
    * over the doc's whole paren-encoded text, so the same expression
    * tokenizes a batch frame or an unbounded stream (no dictionary
    * join, no state — "count the crawl's tokens as it arrives").
    *
    * Whole-doc encoding is safe UNDER THE MODULE PRECONDITION (no
    * reserved `( ) _` characters in text): word boundaries encode as
    * the `_` end-marker symbol, and no merge's LEFT element can end
    * with `_` (an `_`-bearing symbol is word-final, so nothing ever
    * follows it within a word) — cross-word pairs can therefore
    * never match a learned merge, and the per-doc replace chain is
    * exactly the per-word application summed. */
  def tokenCountWith(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = concat(
      replace(regexp_replace(col("text"), "(?s)(.)", "($1)"),
        lit("( )"), lit("(_)")),
      lit("(_)"))
    val merged = merges.foldLeft(enc) { case (c, (l, r)) =>
      replace(c, lit(s"($l)($r)"), lit(s"($l$r)"))
    }
    docs.select(col("doc_id"),
      (length(merged) - length(replace(merged, lit("("), lit(""))))
        .cast("long").as("n_subwords"))
  }

  /** The merge table of [[train]] as driver pairs — the frozen
    * artifact [[tokenCountWith]] serves with. */
  def mergesOf(spark: SparkSession, docs: DataFrame, m: Int)
      : Seq[(String, String)] =
    trainLocalMerges(collectHistogram(docs), m)._1
      .map { case (_, l, r, _) => (l, r) }

  /** Trajectory CTEs + the per-doc subword-count frame `dt`
    * (doc_id, n_subwords) — composable with downstream stages
    * (packing). */
  def sqlDocTokenCtes(m: Int): String = sqlDocTokenCtesFrom(m, sqlWordFrameCte)

  private def sqlDocTokenCtesFrom(m: Int, w0: String): String =
    s"""${sqlTrainCtes(m, w0)},
       dt AS (SELECT doc_id,
           CAST(SUM(len(string_split(w.s[2:-2], ')('))) AS BIGINT)
             AS n_subwords
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents) d
         JOIN w$m w USING (tok)
         GROUP BY doc_id)"""

  /** SQL twin of [[docTokenCounts]]. */
  def sqlDocTokenCounts(m: Int): String =
    s"""WITH ${sqlDocTokenCtes(m)}
       SELECT doc_id, n_subwords FROM dt"""

  /** Shared oracle CTE chain for the `m`-epoch trajectory: ends with
    * merge rows `b1..bm` and dictionaries `w0..wm`. Epoch frames are
    * MATERIALIZED (each is referenced by both the next epoch's pair
    * count and its rewrite — without it the inlined plan re-scans
    * the corpus 2^m times). Exhausted epochs (empty b$e) are no-ops:
    * the COALESCE'd empty scalars form the pattern `()()`  which can
    * never match (symbols are never empty), exactly mirroring the
    * Spark side's early stop — so the trajectory stays
    * oracle-consistent even if the dictionary fully merges before
    * epoch m. */
  /** The shared word-frame CTE (w0) — also the seed of the
    * [[Wordpiece]] trajectory. */
  private[text] val sqlWordFrameCte: String =
    s"""w0 AS MATERIALIZED (
         SELECT tok,
                '(' || list_aggr(string_split(tok, ''), 'string_agg', ')(')
                || ')(_)' AS s,
                COUNT(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY 1, 2)"""

  /** Byte-alphabet word frame (r16): the same paren string, symbols
    * spelled `b` + lowercase hex via hex(encode(tok)) — byte-for-byte
    * the [[wordFrameBytes]] synthesis. */
  private[text] val sqlWordFrameBytesCte: String =
    s"""w0 AS MATERIALIZED (
         SELECT tok,
                regexp_replace(lower(hex(encode(tok))), '(..)', '(b\\1)', 'g')
                || '(_)' AS s,
                COUNT(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY 1, 2)"""

  private def sqlTrainCtes(m: Int, w0: String = sqlWordFrameCte): String = {
    val epochs = (1 to m).map { e =>
      val p = e - 1
      s"""p$e AS (SELECT ss[i] AS l, ss[i+1] AS r,
             CAST(SUM(cnt) AS BIGINT) AS c
           FROM (SELECT unnest(generate_series(1, len(ss) - 1)) AS i, ss, cnt
                 FROM (SELECT string_split(s[2:-2], ')(') AS ss, cnt FROM w$p))
           GROUP BY 1, 2),
         b$e AS MATERIALIZED (
           SELECT $e AS rank, l, r, c FROM p$e ORDER BY c DESC, l, r LIMIT 1),
         w$e AS MATERIALIZED (
           SELECT tok, replace(s,
               '(' || COALESCE((SELECT l FROM b$e), '') || ')(' ||
                 COALESCE((SELECT r FROM b$e), '') || ')',
               '(' || COALESCE((SELECT l || r FROM b$e), '') || ')') AS s, cnt
           FROM w$p)"""
    }
    s"""$w0,
       ${epochs.mkString(",\n       ")}"""
  }

  /** SQL twin of [[train]]: the trajectory CTEs ending in the
    * unioned merge table. */
  def sqlTrain(m: Int): String = {
    val sel = (1 to m).map(e => s"SELECT rank, l, r, c FROM b$e")
      .mkString("\n       UNION ALL ")
    s"""WITH ${sqlTrainCtes(m)}
       $sel"""
  }

  /** SQL twin of [[trainBytes]]/[[trainFastBytes]] (r16): the same
    * trajectory CTEs seeded with the byte-alphabet word frame. */
  def sqlTrainBytes(m: Int): String = {
    val sel = (1 to m).map(e => s"SELECT rank, l, r, c FROM b$e")
      .mkString("\n       UNION ALL ")
    s"""WITH ${sqlTrainCtes(m, sqlWordFrameBytesCte)}
       $sel"""
  }

  /** SQL twin of [[docTokenCountsFastBytes]] (r16). */
  def sqlDocTokenCountsBytes(m: Int): String =
    s"""WITH ${sqlDocTokenCtesFrom(m, sqlWordFrameBytesCte)}
       SELECT doc_id, n_subwords FROM dt"""

  /** SQL twin of [[encodeVocab]]: the trajectory CTEs ending in the
    * symbol histogram of the final dictionary. */
  def sqlEncodeVocab(m: Int): String =
    s"""WITH ${sqlTrainCtes(m)}
       SELECT sym, CAST(SUM(cnt) AS BIGINT) AS cnt
       FROM (SELECT unnest(string_split(s[2:-2], ')(')) AS sym, cnt FROM w$m)
       GROUP BY sym"""
}
