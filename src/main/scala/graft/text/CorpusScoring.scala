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
  * The 1e6 multiplier keeps c * 1e6 < 2^63 up to ~9e12-token corpora;
  * the weight join shuffles on the token key (the count table is
  * corpus-sized — never broadcast it; AQE may still choose to when a
  * small corpus makes it safe).
  */
object CorpusScoring {

  /** Per-doc unigram frequency scores: (all doc columns minus text) +
    * `score` in integer ppm. */
  def unigramScores(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n_total"))
    val weights = counts.crossJoin(broadcast(total))
      .select(col("tok"), expr("(c * 1000000L) div n_total").as("w"))
    toks.join(weights, "tok")
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("sum(w) div count(1)").as("score"))
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
