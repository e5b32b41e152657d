package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Importance-weighted data selection (the DSIR shape, Xie et al.
  * 2023): estimate how target-like each candidate document is from
  * hashed token-bucket statistics, and keep the top scorers — the
  * standard way to tilt a raw crawl toward a target domain without
  * training a model.
  *
  * Tokens hash into a FIXED number of buckets (the hashed-feature
  * trick that makes the model bounded at any corpus size); each
  * bucket's weight is the smoothed target/raw frequency ratio kept
  * log-free in integer ppm — (tgt+1)·1e6 div (raw+1) — the same
  * rational-score discipline as BM25's Robertson idf, so ranking is
  * exact and the oracle replays it bit-for-bit. A document's score
  * is its mean token-bucket weight (integer div by token count,
  * length-normalized so long docs aren't favored).
  *
  * 100 TB posture: two corpus passes — one explode+partial-agg into
  * the 128-bucket count tables (a bounded model, the kMeansCentroids
  * pattern), one scoring pass where the 128-row weight table
  * BROADCAST-joins the exploded stream and the winners reduce via
  * TakeOrderedAndProject (per-partition top-k + one k-row driver
  * merge, never a global sort). Nothing corpus-sized shuffles.
  */
object Importance {

  /** Bucket count: small enough to broadcast as a literal-sized
    * table, large enough that the fixture vocabulary spreads. */
  val Buckets = 128

  def bucket(w: Column): Column =
    TextFunctions.wordVal(w) % lit(Buckets.toLong)

  def sqlBucket(wExpr: String): String =
    s"${TextFunctions.sqlWordVal(wExpr)} % $Buckets"

  /** Per-bucket importance weights over `docs` partitioned by
    * `targetPred`: (b, w) with w = (tgt+1)·1e6 div (raw+1) in ppm.
    * ONE conditional-aggregation pass builds both count columns —
    * not a scan per pool — so the whole model costs a single corpus
    * read. */
  def bucketWeights(docs: DataFrame, targetPred: Column): DataFrame =
    docs.select(targetPred.as("is_t"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy(bucket(col("w")).as("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("rc"))
      .select(col("b"),
        expr("((tc + 1L) * 1000000L) div (rc + 1L)").as("w"))

  /** Select the `k` most target-like docs from the candidate pool
    * (docs NOT matching `targetPred`; those matching it define the
    * target distribution). Output (doc_id, lang, score) — score the
    * doc's mean token-bucket weight in ppm, selection ordered
    * (score desc, doc_id). */
  def select(docs: DataFrame, targetPred: Column, k: Int): DataFrame = {
    // the weight table is <= Buckets rows by construction (grouped on
    // a % Buckets key); the limit is a no-op that makes the bound
    // PLAN-VISIBLE for the suite-wide broadcast audit
    val wts = broadcast(bucketWeights(docs, targetPred).limit(Buckets))
    docs.filter(!targetPred)
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"), bucket(col("tok")).as("b"))
      .join(wts, Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("sum(w) div count(1)").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** The trained model as a driver map — bounded at [[Buckets]]
    * entries by construction, the serve-side artifact. */
  def weightsMap(docs: DataFrame, targetPred: Column): Map[Long, Long] =
    bucketWeights(docs, targetPred).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  /** Frozen-model scoring as a stateless projection: the weight
    * table inlined as a literal map, so the SAME expression scores a
    * batch frame or an unbounded stream (no join, no state, no
    * watermark — the serving shape for "score the crawl as it
    * arrives"). Buckets unseen at training score the neutral add-1
    * smoothed ratio (1e6 ppm). Integer div is exact (weights are
    * positive, so tot div nt never hits the float path). */
  def scoreWith(docs: DataFrame, weights: Map[Long, Long]): DataFrame = {
    val wm = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
    val toks = TextFunctions.tokens(col("text"))
    docs.select(col("doc_id"), col("lang"),
        aggregate(
          transform(toks, w =>
            coalesce(element_at(wm, bucket(w)), lit(1000000L))),
          lit(0L), (a, v) => a + v).as("tot"),
        size(toks).cast("long").as("nt"))
      .select(col("doc_id"), col("lang"), expr("tot div nt").as("score"))
  }

  /** SQL twin of [[select]]. */
  def sqlSelect(targetPred: String, k: Int): String =
    s"""WITH bc AS (SELECT ${sqlBucket("w")} AS b,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS rc
           FROM (SELECT ($targetPred) AS is_t,
                   unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY 1),
       wts AS (SELECT b, ((tc + 1) * 1000000) // (rc + 1) AS w FROM bc),
       toks AS (SELECT doc_id, lang, ${sqlBucket("tok")} AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents WHERE NOT ($targetPred))),
       sc AS (SELECT doc_id, lang,
             CAST(SUM(w) // COUNT(*) AS BIGINT) AS score
           FROM toks JOIN wts USING (b) GROUP BY 1, 2)
       SELECT doc_id, lang, score FROM sc
       ORDER BY score DESC, doc_id LIMIT $k"""
}
