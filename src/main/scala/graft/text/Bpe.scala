package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * word, map-side combine, Zipf-bounded result); each epoch is one
  * explode+HashAggregate over the dictionary (pair keys, partial
  * aggregation) finished by a TakeOrderedAndProject top-1 — a
  * bounded (1-row) driver collect per epoch, the kMeansCentroids
  * bounded-model pattern. The merge rewrite is a per-row codegen'd
  * string replace. Nothing corpus-sized moves after the first scan.
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

  /** Adjacent-pair counts of a word frame: (l, r, c). */
  def pairCounts(words: DataFrame): DataFrame = {
    val ss = split(expr("substring(s, 2, char_length(s) - 2)"), "\\)\\(")
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
  private def applyMerge(w: DataFrame, l: String, r: String): DataFrame =
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

  /** Train `m` merges; returns the merge table
    * (rank, l, r, c) — rank 1..m in merge order, c the pair count
    * that won the rank. Stops early if the dictionary is fully
    * merged; the SQL twin mirrors the stop (exhausted epoch CTEs
    * are provable no-ops), so both sides return the same shorter
    * merge table. */
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
    val ss = split(expr("substring(s, 2, char_length(s) - 2)"), "\\)\\(")
    graft.api.Materialize.releasing(
      merged.select(explode(ss).as("sym"), col("cnt"))
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
    val ss = split(expr("substring(s, 2, char_length(s) - 2)"), "\\)\\(")
    val wordLens = merged.select(col("tok"),
      size(ss).cast("long").as("n_sub"), col("cnt"))
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val perDoc = CorpusScoring.hybridWeightJoin(toks, wordLens,
        Seq("tok"), "cnt", hotN = 64, joinType = "inner")
      .groupBy(col("doc_id")).agg(sum(col("n_sub")).as("n_subwords"))
    graft.api.Materialize.releasing(perDoc, Seq(dict))
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
      : Seq[(String, String)] = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dict = wordFrame(docs).persist(MEMORY_AND_DISK)
    val (merges, _) = trainLoop(dict, m)
    dict.unpersist(blocking = false)
    merges.map { case (_, l, r, _) => (l, r) }
  }

  /** Trajectory CTEs + the per-doc subword-count frame `dt`
    * (doc_id, n_subwords) — composable with downstream stages
    * (packing). */
  def sqlDocTokenCtes(m: Int): String =
    s"""${sqlTrainCtes(m)},
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
  private def sqlTrainCtes(m: Int): String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
           SELECT tok,
                  '(' || list_aggr(string_split(tok, ''), 'string_agg', ')(')
                  || ')(_)' AS s,
                  COUNT(*) AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY 1, 2)"""
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

  /** SQL twin of [[encodeVocab]]: the trajectory CTEs ending in the
    * symbol histogram of the final dictionary. */
  def sqlEncodeVocab(m: Int): String =
    s"""WITH ${sqlTrainCtes(m)}
       SELECT sym, CAST(SUM(cnt) AS BIGINT) AS cnt
       FROM (SELECT unnest(string_split(s[2:-2], ')(')) AS sym, cnt FROM w$m)
       GROUP BY sym"""
}
