package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus: BM25 top-k scoring of a
  * bounded query set — the ranking half of the dataset-search /
  * retrieval-based-decontamination loop (find the training docs most
  * similar to an eval question before deciding to drop them), and the
  * lexical complement to the ANN family in [[graft.sim.Similarity]].
  *
  * BM25 is kept log-free and integer-exact so the DuckDB oracle can
  * replay it bit-for-bit (the same discipline as the tf-idf operator's
  * integer-rational score, TextOps q_tfidf_terms):
  *
  *   idf(t)    = (2N - 2df + 1) / (2df + 1)        Robertson idf,
  *               log dropped (monotone in the ratio, exact rational)
  *   tfp(t,d)  = tf(k1+1) / (tf + k1(1-b) + k1·b·dl/avgdl)
  *               with k1 = 1.2, b = 0.75 → in 1e-4 units:
  *               22000·tf / (10000·tf + 3000 + 9·ratio_m)
  *               where ratio_m = (dl·1e6) div avgdl_m  (dl/avgdl in
  *               milli-units) and avgdl_m = (T·1000) div N
  *   score(q,d) = Σ_t∈q  (tfp_ppm · idf_ppm) div 1e6
  *
  * The last product is evaluated in the overflow-safe decomposed form
  *   tfq·(idf div 1e6) + (tfq·(idf mod 1e6)) div 1e6
  * (exact: floor((q·M+r)·b/M) = q·b + floor(r·b/M)), which keeps every
  * intermediate < 2^63 up to N ≈ 2e12 docs and 1e7-token documents.
  *
  * 100 TB posture: the query set is bounded by construction (an
  * explicit limit — a benchmark suite, not a corpus), so the query
  * terms broadcast. The corpus streams through ONE narrow explode
  * whose rows are cut down by the broadcast term join BEFORE any
  * shuffle — the only shuffles are hit-sized (per-doc tf groupBy, df
  * groupBy over ≤|query terms| keys with map-side combine, and the
  * per-query rank window, which WindowGroupLimit partially evaluates
  * map-side so a stopword-matching query never sorts a corpus-sized
  * partition). Corpus length stats are one ungrouped aggregate
  * broadcast as a scalar. Nothing corpus-sized is ever broadcast,
  * collected, or re-shuffled.
  */
object Retrieval {

  /** k1 = 1.2 and b = 0.75 folded into the 1e-4-unit tf-part
    * coefficients (22000·tf) / (10000·tf + 3000 + 9·ratio_m). */
  val TfNum = 22000L
  val TfDen = 10000L
  val TfConst = 3000L
  val TfLen = 9L

  /** The shared BM25 scoring tail: postings rows (doc_id, tok, tf,
    * dl) + per-term df + the 1-row corpus stats → per-(query, doc,
    * term) integer-ppm weights (qid, doc_id, tok, w). Factored out so
    * the corpus-scan path ([[termScores]]) and the served-index path
    * ([[PostingsIndex.searchGrown]]) agree bit-for-bit by
    * construction — both feed the same expressions, only the postings
    * SOURCE differs. `dfreq` and `queries` are term-bounded (both
    * broadcast); `stats` must be a single row. */
  private[text] def scorePostings(postings: DataFrame, dfreq: DataFrame,
      stats: DataFrame, queries: DataFrame): DataFrame =
    postings.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("ratio_m",
        expr(s"(dl * 1000000L) div ((total_toks * 1000L) div n_docs)"))
      .withColumn("tfq",
        expr(s"($TfNum * tf * 1000000L) div" +
          s" ($TfDen * tf + $TfConst + $TfLen * ratio_m)"))
      .withColumn("idf",
        expr("((2L * n_docs - 2L * df + 1L) * 1000000L) div (2L * df + 1L)"))
      .join(broadcast(queries), "tok")
      .select(col("qid"), col("doc_id"), col("tok"),
        expr("tfq * (idf div 1000000L) + (tfq * (idf % 1000000L)) div 1000000L")
          .as("w"))

  /** Per-(query, doc, term) BM25 term scores in integer ppm.
    * `queries`: (qid, tok) — MUST be bounded (it is broadcast);
    * `docs`: (doc_id, text). Output: (qid, doc_id, tok, w). */
  private def termScores(docs: DataFrame, queries: DataFrame): DataFrame = {
    // bounded-by-contract query set (it is broadcast) collects ONCE
    // (r17, the PostingsIndex.searchParts treatment): the collected
    // rows feed BOTH broadcast sides below — previously the query
    // frame's source plan (typically a corpus scan + explode)
    // re-executed as each side's build
    val spark = docs.sparkSession
    val qProj = queries.select(col("qid"), col("tok"))
    val qRows = qProj.collect()
    val qLocal = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qProj.schema)
    val qTerms = qLocal.select(col("tok")).distinct()
    val sp = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
    // one ungrouped aggregate → 1-row scalar frame (broadcast-safe)
    val stats = sp.agg(count(lit(1)).as("n_docs"),
      sum(size(col("t")).cast("long")).as("total_toks"))
    // the broadcast term join cuts the exploded corpus BEFORE any
    // shuffle — tf/df are hit-sized, never corpus-sized
    val toks = sp
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("tok"))
      .join(broadcast(qTerms), "tok")
    val tf = toks.groupBy(col("doc_id"), col("tok"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    // ≤ |query terms| rows by construction (grouped on the term key
    // of the broadcast-filtered postings)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    scorePostings(tf, dfreq, stats, qLocal)
  }

  /** Per-(query, doc) summed BM25 scores: (qid, doc_id, score). */
  def bm25Scores(docs: DataFrame, queries: DataFrame): DataFrame =
    termScores(docs, queries)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("w")).as("score"))

  /** BM25 top-`k` docs per query. `queries`: (qid, tok), bounded.
    * Output: (qid, doc_id, score, rk), rk 1..k by (score desc,
    * doc_id) — fully deterministic. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25Scores(docs, queries)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Reciprocal-rank-fusion damping constant (the standard 60 of
    * Cormack/Clarke/Buettcher 2009): contribution of a rank-r hit is
    * 1/(60+r), kept integer-exact as 1e9 div (60+r). */
  val RrfDamp = 60L

  /** Hybrid lexical+semantic retrieval: BM25 over the text and
    * cosine over the embedding column, fused with reciprocal-rank
    * fusion — the standard two-tower dataset-search shape (sparse
    * recall catches exact terms, dense recall catches paraphrases;
    * RRF needs no score calibration between the two).
    *
    * `queries`: (qid, tok) bounded term sets; `qVecs`: the SAME
    * bounded query set's embedding rows (vec_id, embedding). Both
    * legs rank top-`kEach` RELATED docs (the query doc itself is
    * excluded on both legs), then fuse: rrf = Σ 1e9 div (60+rk) over
    * the legs that retrieved the doc, ranked (rrf desc, doc_id).
    *
    * 100 TB posture: each leg is already hit-bounded (|queries|·kEach
    * rows), so the fusion union/groupBy/rank moves only result-set
    * sized data — the heavy lifting stays inside the legs (BM25's
    * broadcast-term-cut corpus stream; swap the brute-force leg for
    * [[graft.sim.Similarity.ivfTopK]] against a served index at
    * corpus scale — the fusion contract is unchanged). */
  def hybridTopK(docs: DataFrame, embeds: DataFrame, queries: DataFrame,
      qVecs: DataFrame, kEach: Int, k: Int): DataFrame =
    hybridFuse(lexRanked(docs, queries, kEach),
      // bruteForceTopK already excludes qid == cid
      graft.sim.Similarity.bruteForceTopK(embeds, qVecs, kEach)
        .select(col("qid"), col("cid").as("id"), col("rk")), k)

  /** The lexical leg: self-excluded BM25 top-`kEach` as
    * (qid, id, rk). */
  def lexRanked(docs: DataFrame, queries: DataFrame, kEach: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lexW = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scores(docs, queries)
      .filter(col("qid") =!= col("doc_id"))
      .withColumn("rk", row_number().over(lexW)).filter(col("rk") <= kEach)
      .select(col("qid"), col("doc_id").as("id"), col("rk"))
  }

  /** The RRF fuse over any two ranked legs (qid, id, rk) — the
    * contract that lets the dense leg swap (brute force at
    * exactness-gate scale, the served IVF index at corpus scale)
    * without touching the fusion. */
  def hybridFuse(lex: DataFrame, sem: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("id"))
    lex.unionByName(sem)
      .groupBy(col("qid"), col("id"))
      .agg(sum(expr(s"1000000000L div ($RrfDamp + rk)")).as("rrf"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("id").as("doc_id"), col("rrf"), col("rk"))
  }

  /** Shared oracle CTE chain ending in `s(qid, doc_id, score)` —
    * the summed BM25 scores both [[sqlBm25TopK]] and
    * [[sqlHybridTopK]] rank from. `docsPred` restricts the scored
    * corpus universe (the LIVE doc set of an index-lifecycle query);
    * the query set always draws from the FULL table — query terms
    * need not come from indexed docs. */
  private def sqlBm25Ctes(queryPred: String, qTerms: Int,
      docsPred: String = "TRUE"): String =
    s"""spq AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sp AS (SELECT * FROM spq WHERE $docsPred),
       q AS (SELECT DISTINCT doc_id AS qid, unnest(t[1:$qTerms]) AS tok
             FROM spq WHERE $queryPred),
       st AS (SELECT COUNT(1) AS n, CAST(SUM(len(t)) AS BIGINT) AS tt FROM sp),
       toks AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok
                FROM sp),
       tf AS (SELECT doc_id, tok, dl, COUNT(1) AS tf FROM toks
              WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2, 3),
       dfq AS (SELECT tok, COUNT(1) AS df FROM tf GROUP BY tok),
       sc AS (SELECT doc_id, tok,
           ($TfNum * tf * 1000000) //
             ($TfDen * tf + $TfConst +
              $TfLen * ((dl * 1000000) // ((tt * 1000) // n))) AS tfq,
           ((2 * n - 2 * df + 1) * 1000000) // (2 * df + 1) AS idf
         FROM tf JOIN dfq USING (tok) CROSS JOIN st),
       term AS (SELECT doc_id, tok,
           tfq * (idf // 1000000) + (tfq * (idf % 1000000)) // 1000000 AS w
         FROM sc),
       s AS (SELECT qid, doc_id, CAST(SUM(w) AS BIGINT) AS score
             FROM q JOIN term USING (tok) GROUP BY 1, 2)"""

  /** SQL twin of [[bm25TopK]] for the DuckDB oracle. `queryPred`
    * selects the query docs; their first `qTerms` distinct tokens are
    * the query. */
  def sqlBm25TopK(queryPred: String, qTerms: Int, k: Int): String =
    sqlBm25TopKLive("TRUE", queryPred, qTerms, k)

  /** [[sqlBm25TopK]] over a restricted LIVE corpus universe — the
    * oracle form of the [[PostingsIndex]] lifecycle queries, where
    * the scored doc set is base ∪ admitted − forgotten, expressed as
    * a doc_id predicate. The index search must equal the brute-force
    * BM25 over exactly that universe (stats, df and ranks included). */
  def sqlBm25TopKLive(docsPred: String, queryPred: String, qTerms: Int,
      k: Int): String =
    s"""WITH ${sqlBm25Ctes(queryPred, qTerms, docsPred)}
       SELECT qid, doc_id, score,
         CAST(row_number() OVER (PARTITION BY qid
           ORDER BY score DESC, doc_id) AS INT) AS rk
       FROM s QUALIFY rk <= $k"""

  /** Oracle CTEs for [[lexRanked]]: the BM25 chain + `lex`
    * (qid, id, rk). */
  private[graft] def sqlLexCtes(queryPred: String, qTerms: Int,
      kEach: Int): String =
    s"""${sqlBm25Ctes(queryPred, qTerms)},
       lex AS (SELECT qid, doc_id AS id,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY score DESC, doc_id) AS INT) AS rk
         FROM s WHERE doc_id <> qid QUALIFY rk <= $kEach)"""

  /** Oracle tail for [[hybridFuse]]: expects CTEs `lex` and `sem`
    * each shaped (qid, id, rk). */
  private[graft] def sqlFuseTail(k: Int): String =
    s"""u AS (SELECT qid, id, rk FROM lex
             UNION ALL SELECT qid, id, rk FROM sem),
       f AS (SELECT qid, id AS doc_id,
             CAST(SUM(1000000000 // ($RrfDamp + rk)) AS BIGINT) AS rrf
           FROM u GROUP BY 1, 2)
       SELECT qid, doc_id, rrf,
         CAST(row_number() OVER (PARTITION BY qid
           ORDER BY rrf DESC, doc_id) AS INT) AS rk
       FROM f QUALIFY rk <= $k"""

  /** SQL twin of [[hybridTopK]]: lexical leg from the shared BM25
    * CTEs (self-excluded pre-rank), semantic leg the exact-quantized
    * cosine rank over `embeddings`, fused by integer RRF. */
  def sqlHybridTopK(queryPred: String, qVecPred: String, qTerms: Int,
      kEach: Int, k: Int, dim: Int): String =
    s"""WITH ${sqlLexCtes(queryPred, qTerms, kEach)},
       sq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
              WHERE $qVecPred),
       ss AS (SELECT qid, c.vec_id AS id,
           ${graft.sim.Similarity.sqlSimRounded("qv", "c.embedding", dim)} AS sim
         FROM sq JOIN embeddings c ON qid <> c.vec_id),
       sem AS (SELECT qid, id,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY sim DESC, id) AS INT) AS rk
         FROM ss QUALIFY rk <= $kEach),
       ${sqlFuseTail(k)}"""
}
