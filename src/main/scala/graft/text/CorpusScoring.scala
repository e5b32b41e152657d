package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistical scoring — the two-pass shape (corpus
  * statistics, then per-doc scoring against them) that LM-based
  * quality filters use at pipeline scale.
  *
  * Unigram frequency score: pass 1 counts token occurrences over the
  * whole corpus (one exploded groupBy — the wordcount shuffle); pass 2
  * joins each doc's tokens against the count table and averages a
  * quantized per-token weight. A doc of common words scores high, a
  * doc of rare/garbage tokens scores near 0 — the cheap stand-in for
  * "unigram LM log-prob" rank filters.
  *
  * Everything is integer floor arithmetic so the DuckDB oracle
  * replays it exactly:
  *   w(tok)  = (c(tok) * 1e6) div N     (parts-per-million frequency)
  *   score(d) = sum_{tok in d} w(tok) div nTokens(d)
  * The 1e6 multiplier keeps c * 1e6 < 2^63 up to ~9e12-token corpora.
  *
  * The weight join is HYBRID (the 100-TB skew answer): natural text is
  * Zipf-distributed, so a plain shuffle join on the token key sends
  * every occurrence of "the" to one partition. The top-`hotTokens`
  * most frequent tokens' weights — bounded by construction, a few KB —
  * are broadcast, so the hottest keys never shuffle at all; only the
  * long tail (per-key frequency low by definition) takes the keyed
  * shuffle join. The count table itself is corpus-sized and is still
  * never broadcast. Which tokens land in the hot set cannot affect the
  * result (a token's weight is identical on either path), so the SQL
  * oracle stays the plain single-join form.
  *
  * Cache lifetime: the per-token weight frame is persisted (it feeds
  * the hot set, the tail anti-join, and the tail join); it lives until
  * the caller drops the frame or calls spark.catalog.clearCache().
  */
object CorpusScoring {

  /** Hot-set size for the hybrid weight join: big enough to cover the
    * Zipf head (the top 1k tokens are ~2/3 of all occurrences in
    * natural text), small enough that the broadcast is trivially
    * bounded regardless of corpus size. */
  val DefaultHotTokens = 1024

  /** Per-doc unigram frequency scores: (doc_id, lang, score) with
    * `score` in integer ppm.
    *
    * `materialize = true` runs the pipeline now, keeps the per-doc
    * result (one short row per document) as a local checkpoint and
    * releases the weight cache before returning — for long-lived
    * library sessions that don't clearCache() between operators. */
  def unigramScores(docs: DataFrame,
      hotTokens: Int = DefaultHotTokens,
      materialize: Boolean = false): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n_total"))
    val weights = counts.crossJoin(broadcast(total))
      .select(col("tok"), col("c"), expr("(c * 1000000L) div n_total").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // TakeOrdered head of the frequency table — never a full sort
    val hot = weights.orderBy(col("c").desc, col("tok")).limit(hotTokens)
      .select(col("tok"), col("w"))
    val tail = weights.join(broadcast(hot.select(col("tok"))), Seq("tok"), "left_anti")
      .select(col("tok"), col("w"))
    val scores = toks.join(broadcast(hot), Seq("tok"))
      .unionByName(toks.join(tail, Seq("tok")))
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("sum(w) div count(1)").as("score"))
    if (materialize) graft.api.Materialize.releasing(scores, Seq(weights))
    else scores
  }

  /** SQL twin of [[unigramScores]] as a CTE chain ending in `ds`
    * (doc_id, lang, score). */
  def sqlUnigramScoresCtes(docsTable: String): String =
    s"""toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           FROM $docsTable),
       counts AS (SELECT tok, COUNT(1) AS c FROM toks GROUP BY tok),
       tot AS (SELECT SUM(c) AS n FROM counts),
       w AS (SELECT tok, (c * 1000000) // (SELECT n FROM tot) AS w FROM counts),
       ds AS (SELECT doc_id, lang, SUM(w) // COUNT(1) AS score
           FROM toks JOIN w USING (tok) GROUP BY doc_id, lang)"""
}
