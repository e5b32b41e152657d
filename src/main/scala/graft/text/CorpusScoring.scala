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
  * Bigram conditional score ([[bigramScores]]): same two-pass shape
  * one order up — counts come from the TRAIN id-band only, every doc
  * is scored against them, and bigrams unseen in train back off to a
  * halved unigram weight (stupid backoff) — so the held-out split
  * genuinely exercises the unseen-n-gram path.
  *
  * Everything is integer floor arithmetic so the DuckDB oracle
  * replays it exactly:
  *   w(tok)  = (c(tok) * 1e6) div N     (parts-per-million frequency)
  *   score(d) = sum_{tok in d} w(tok) div nTokens(d)
  * The 1e6 multiplier keeps c * 1e6 < 2^63 up to ~9e12-token corpora.
  *
  * The weight joins are HYBRID (the 100-TB skew answer): natural text
  * is Zipf-distributed, so a plain shuffle join on the token key sends
  * every occurrence of "the" to one partition. [[hybridWeightJoin]]
  * broadcasts the top-`hot` most frequent keys' weights — bounded by
  * construction, a few KB — AND anti-filters the probe side against
  * that same broadcast before the tail join, so the hottest keys never
  * enter the shuffle at all (not even as no-match probe rows). The
  * count table itself is corpus-sized and is still never broadcast.
  * Which keys land in the hot set cannot affect the result (a key's
  * weight is identical on either path), so the SQL oracles stay the
  * plain single-join form.
  *
  * Cache lifetime: the per-key weight frames are persisted (each feeds
  * the hot head, the tail anti-join, and the tail join); they live
  * until the caller drops the frame or calls clearCache(), or pass
  * `materialize = true` to run now and release synchronously.
  */
object CorpusScoring {

  /** Hot-set size for the hybrid weight join: big enough to cover the
    * Zipf head (the top 1k tokens are ~2/3 of all occurrences in
    * natural text), small enough that the broadcast is trivially
    * bounded regardless of corpus size. */
  val DefaultHotTokens = 1024

  /** Train id-band (mills of the id-hash space) used by
    * [[bigramScores]] for its count pass — the same band
    * [[graft.pipeline.Sampling.splitLabel]] labels 'train'. */
  val TrainMills = 800

  /** Stupid-backoff denominator: an unseen bigram scores the
    * following token's unigram ppm weight div 2 (alpha = 0.5 kept
    * integer-exact). */
  val BackoffDiv = 2

  /** Hybrid skew-safe weight join: `rows ⨝ weights` on `keys`, where
    * `weights` is split into the `hotN`-row most-frequent head (by
    * `freqCol` desc, key-tiebroken) and the long tail. The head is
    * broadcast twice — once as the hit join's build side, once as the
    * probe side's anti-filter — so hot-key rows take a map-side-only
    * path and ONLY tail-key rows (per-key frequency low by
    * definition) enter the keyed shuffle. The split cannot change the
    * result: head ⊎ tail partition `weights`, and hit ⊎ miss
    * partition `rows`.
    *
    * `joinType` "inner" or "left"; "left" keeps rows whose key has no
    * weight at all (their weight columns come back NULL) — the
    * backoff hook for [[bigramScores]].
    *
    * weights must carry `keys`, `freqCol`, and the weight payload
    * columns; `freqCol` is dropped from the output. */
  private[graft] def hybridWeightJoin(rows: DataFrame, weights: DataFrame,
      keys: Seq[String], freqCol: String, hotN: Int,
      joinType: String): DataFrame = {
    require(joinType == "inner" || joinType == "left", joinType)
    // TakeOrdered head of the frequency table — never a full sort
    val hot = weights
      .orderBy(col(freqCol).desc +: keys.map(col): _*)
      .limit(hotN).drop(freqCol)
    val hotKeys = hot.select(keys.map(col): _*)
    val tail = weights.join(broadcast(hotKeys), keys, "left_anti").drop(freqCol)
    val hit = rows.join(broadcast(hot), keys)
    val miss = rows.join(broadcast(hotKeys), keys, "left_anti")
      .join(tail, keys, joinType)
    hit.unionByName(miss)
  }

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
    val scores = hybridWeightJoin(toks, weights, Seq("tok"), "c",
        hotTokens, "inner")
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

  /** Per-doc bigram conditional-frequency scores with stupid backoff:
    * (doc_id, lang, score), score in integer ppm.
    *
    * Counts are taken over the TRAIN id-band only ([[TrainMills]],
    * the band Sampling.splitLabel calls 'train'); ALL docs are then
    * scored against them — the held-out-split scoring shape, and the
    * reason the backoff path is live (val/test docs contain bigrams
    * train never saw).
    *
    *   w2(p,c) = (c2(p,c) * 1e6) div c1(p)       seen-in-train bigram
    *   w1(c)   = ((c1(c) * 1e6) div N) div 2     backoff: halved unigram
    *   score(d) = sum over d's bigrams of coalesce(w2, w1, 0) div nBigrams
    *
    * Bigram pairs are built from the token ARRAY (slice+transform —
    * zero shuffle, no per-doc window); docs with < 2 tokens have no
    * bigrams and drop out of the result, matching the SQL twin. Both
    * weight joins are [[hybridWeightJoin]] — the Zipf head of
    * bigrams ("of the") and of backoff tokens never enters a shuffle. */
  def bigramScores(docs: DataFrame,
      hotN: Int = DefaultHotTokens,
      materialize: Boolean = false): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokens(col("text")).as("t"))
    // NOT persisted: bg is read 3x (c2 + both w2-hybrid branches) but
    // it's a narrow codegen'd explode off the scan — caching it too
    // measured flat (0.90 vs 0.93s warm sf0.1) for a second
    // corpus-sized cache; the withW2 barrier below is where the
    // recomputation actually hurt (two joins, not a projection)
    val bg = base.select(col("doc_id"), col("lang"),
        explode(expr("transform(slice(t, 1, greatest(size(t) - 1, 0))," +
          " (x, i) -> struct(x AS prev, t[i + 1] AS cur))")).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.prev").as("prev"), col("b.cur").as("cur"))
    val inTrain = graft.pipeline.Sampling.sampleFilter(col("doc_id"), TrainMills)
    val c2 = bg.filter(inTrain)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
    val c1 = base.filter(inTrain)
      .select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val total = c1.agg(sum(col("c1")).as("n_total"))
    // weight TABLES are count-table-sized (vocab / bigram-vocab), so
    // their build join is an ordinary keyed shuffle — never broadcast
    val w2 = c2.join(c1.withColumnRenamed("tok", "prev"), "prev")
      .select(col("prev"), col("cur"), col("c2"),
        expr("(c2 * 1000000L) div c1").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w1 = c1.crossJoin(broadcast(total))
      .select(col("tok").as("cur"), col("c1"),
        expr(s"((c1 * 1000000L) div n_total) div $BackoffDiv").as("w1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: the backoff hybrid references its input TWICE (hot
    // hit + anti-filtered miss), and without the barrier the whole
    // w2 hybrid (two joins over the exploded corpus) executes twice
    // (measured 1.33 -> 0.93s warm at sf0.1). Bigram-rows-sized —
    // spills to disk past memory, same lifetime contract as the
    // dedup shingle caches (released by materialize).
    val withW2 = hybridWeightJoin(bg, w2, Seq("prev", "cur"), "c2", hotN, "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scores = hybridWeightJoin(withW2, w1, Seq("cur"), "c1", hotN, "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("w2"), col("w1"), lit(0L)).as("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("sum(w) div count(1)").as("score"))
    if (materialize) graft.api.Materialize.releasing(scores, Seq(w2, w1, withW2))
    else scores
  }

  /** Per-doc trigram conditional-frequency scores with the full
    * two-level stupid-backoff chain: (doc_id, lang, score), integer
    * ppm, counts from the train band only ([[TrainMills]]):
    *
    *   w3(p2,p1,c) = (c3 * 1e6) div c2(p2,p1)          seen trigram
    *   w2(p1,c)    = ((c2 * 1e6) div c1(p1)) div 2     bigram backoff
    *   w1(c)       = (((c1 * 1e6) div N) div 2) div 2  unigram backoff
    *   score(d)    = sum coalesce(w3, w2, w1, 0) div nTrigrams(d)
    *
    * Each backoff level halves again (alpha = 0.5 per level, kept as
    * chained integer div 2 so the SQL twin replays it exactly). All
    * three weight lookups are [[hybridWeightJoin]]s; the two
    * intermediate frames are barriered (persist) because each
    * following hybrid reads its input twice — the same measured
    * blowup bigramScores documents. Docs with < 3 tokens drop out. */
  def trigramScores(docs: DataFrame,
      hotN: Int = DefaultHotTokens,
      materialize: Boolean = false): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val base = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokens(col("text")).as("t"))
    val tg = base.select(col("doc_id"), col("lang"),
        explode(expr("transform(slice(t, 1, greatest(size(t) - 2, 0))," +
          " (x, i) -> struct(x AS p2, t[i + 1] AS p1, t[i + 2] AS c))")).as("g"))
      .select(col("doc_id"), col("lang"),
        col("g.p2").as("p2"), col("g.p1").as("p1"), col("g.c").as("c"))
    val inTrain = graft.pipeline.Sampling.sampleFilter(col("doc_id"), TrainMills)
    val bg = base.filter(inTrain).select(
        explode(expr("transform(slice(t, 1, greatest(size(t) - 1, 0))," +
          " (x, i) -> struct(x AS a, t[i + 1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val c3 = tg.filter(inTrain)
      .groupBy(col("p2"), col("p1"), col("c")).agg(count(lit(1)).as("c3"))
    val c2 = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val c1 = base.filter(inTrain).select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val total = c1.agg(sum(col("c1")).as("n_total"))
    val w3 = c3
      .join(c2.select(col("a").as("p2"), col("b").as("p1"), col("c2")),
        Seq("p2", "p1"))
      .select(col("p2"), col("p1"), col("c"), col("c3"),
        expr("(c3 * 1000000L) div c2").as("w3"))
      .persist(MEMORY_AND_DISK)
    val w2 = c2.join(c1.withColumnRenamed("tok", "a"), "a")
      .select(col("a").as("p1"), col("b").as("c"), col("c2"),
        expr(s"((c2 * 1000000L) div c1) div $BackoffDiv").as("w2"))
      .persist(MEMORY_AND_DISK)
    val w1 = c1.crossJoin(broadcast(total))
      .select(col("tok").as("c"), col("c1"),
        expr(s"(((c1 * 1000000L) div n_total) div $BackoffDiv) div $BackoffDiv")
          .as("w1"))
      .persist(MEMORY_AND_DISK)
    val withW3 = hybridWeightJoin(tg, w3, Seq("p2", "p1", "c"), "c3", hotN, "left")
      .persist(MEMORY_AND_DISK)
    val withW2 = hybridWeightJoin(withW3, w2, Seq("p1", "c"), "c2", hotN, "left")
      .persist(MEMORY_AND_DISK)
    val scores = hybridWeightJoin(withW2, w1, Seq("c"), "c1", hotN, "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("w3"), col("w2"), col("w1"), lit(0L)).as("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("sum(w) div count(1)").as("score"))
    if (materialize)
      graft.api.Materialize.releasing(scores, Seq(w3, w2, w1, withW3, withW2))
    else scores
  }

  /** SQL twin of [[trigramScores]] as a CTE chain ending in `ds`
    * (doc_id, lang, score). */
  def sqlTrigramScoresCtes(docsTable: String): String = {
    val trainBand = graft.pipeline.Sampling.sqlIdBucket("doc_id", 1000)
    s"""sp AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM $docsTable),
       tg AS (SELECT doc_id, lang, t[i] AS p2, t[i + 1] AS p1, t[i + 2] AS c
           FROM sp, unnest(generate_series(1, len(t) - 2)) AS u(i)),
       bgt AS (SELECT t[i] AS a, t[i + 1] AS b
           FROM sp, unnest(generate_series(1, len(t) - 1)) AS u(i)
           WHERE $trainBand < $TrainMills),
       c3 AS (SELECT p2, p1, c, COUNT(1) AS c3 FROM tg
           WHERE $trainBand < $TrainMills GROUP BY 1, 2, 3),
       c2 AS (SELECT a, b, COUNT(1) AS c2 FROM bgt GROUP BY 1, 2),
       c1 AS (SELECT tok, COUNT(1) AS c1 FROM (
           SELECT unnest(t) AS tok FROM sp WHERE $trainBand < $TrainMills)
           GROUP BY tok),
       tot AS (SELECT SUM(c1) AS n FROM c1),
       w3 AS (SELECT p2, p1, c, (c3 * 1000000) // c2 AS w3
           FROM c3 JOIN c2 ON p2 = a AND p1 = b),
       w2 AS (SELECT a AS p1, b AS c, ((c2 * 1000000) // c1) // $BackoffDiv AS w2
           FROM c2 JOIN c1 ON a = tok),
       w1 AS (SELECT tok AS c,
           (((c1 * 1000000) // (SELECT n FROM tot)) // $BackoffDiv) // $BackoffDiv AS w1
           FROM c1),
       ds AS (SELECT doc_id, lang,
           SUM(COALESCE(w3, w2, w1, 0)) // COUNT(1) AS score
           FROM tg LEFT JOIN w3 USING (p2, p1, c)
             LEFT JOIN w2 USING (p1, c) LEFT JOIN w1 USING (c)
           GROUP BY doc_id, lang)"""
  }

  /** SQL twin of [[bigramScores]] as a CTE chain ending in `ds`
    * (doc_id, lang, score). */
  def sqlBigramScoresCtes(docsTable: String): String = {
    val trainBand = graft.pipeline.Sampling.sqlIdBucket("doc_id", 1000)
    s"""sp AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM $docsTable),
       bg AS (SELECT doc_id, lang, t[i] AS prev, t[i + 1] AS cur
           FROM sp, unnest(generate_series(1, len(t) - 1)) AS u(i)),
       c2 AS (SELECT prev, cur, COUNT(1) AS c2 FROM bg
           WHERE $trainBand < $TrainMills GROUP BY 1, 2),
       c1 AS (SELECT tok, COUNT(1) AS c1 FROM (
           SELECT unnest(t) AS tok FROM sp WHERE $trainBand < $TrainMills)
           GROUP BY tok),
       tot AS (SELECT SUM(c1) AS n FROM c1),
       w2 AS (SELECT prev, cur, (c2 * 1000000) // c1 AS w2
           FROM c2 JOIN c1 ON prev = tok),
       w1 AS (SELECT tok AS cur,
           ((c1 * 1000000) // (SELECT n FROM tot)) // $BackoffDiv AS w1 FROM c1),
       ds AS (SELECT doc_id, lang,
           SUM(COALESCE(w2, w1, 0)) // COUNT(1) AS score
           FROM bg LEFT JOIN w2 USING (prev, cur) LEFT JOIN w1 USING (cur)
           GROUP BY doc_id, lang)"""
  }
}
