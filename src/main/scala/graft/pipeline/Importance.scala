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
    s"CAST(ascii($wExpr)*1024 + ascii(right($wExpr,1))*32 + length($wExpr) AS BIGINT) % $Buckets"

  /** Per-bucket importance weights from the two pools:
    * (b, w) with w = (tgt+1)·1e6 div (raw+1) in ppm. */
  def bucketWeights(target: DataFrame, raw: DataFrame): DataFrame = {
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .groupBy(bucket(col("w")).as("b")).agg(count(lit(1)).as(name))
    counts(target, "tc").join(counts(raw, "rc"), Seq("b"), "full_outer")
      .select(col("b"),
        expr("((coalesce(tc, 0L) + 1L) * 1000000L) div (coalesce(rc, 0L) + 1L)")
          .as("w"))
  }

  /** Select the `k` most target-like docs from the candidate pool
    * (docs NOT matching `targetPred`; those matching it define the
    * target distribution). Output (doc_id, lang, score) — score the
    * doc's mean token-bucket weight in ppm, selection ordered
    * (score desc, doc_id). */
  def select(docs: DataFrame, targetPred: Column, k: Int): DataFrame = {
    // the weight table is <= Buckets rows by construction (grouped on
    // a % Buckets key); the limit is a no-op that makes the bound
    // PLAN-VISIBLE for the suite-wide broadcast audit
    val wts = broadcast(
      bucketWeights(docs.filter(targetPred), docs.filter(!targetPred))
        .limit(Buckets))
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
  def weightsMap(target: DataFrame, raw: DataFrame): Map[Long, Long] =
    bucketWeights(target, raw).collect()
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
    s"""WITH tt AS (SELECT ${sqlBucket("w")} AS b, COUNT(*) AS tc
           FROM (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE $targetPred) GROUP BY 1),
       rt AS (SELECT ${sqlBucket("w")} AS b, COUNT(*) AS rc
           FROM (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE NOT ($targetPred)) GROUP BY 1),
       wts AS (SELECT COALESCE(tt.b, rt.b) AS b,
             ((COALESCE(tc, 0) + 1) * 1000000) // (COALESCE(rc, 0) + 1) AS w
           FROM tt FULL OUTER JOIN rt ON tt.b = rt.b),
       toks AS (SELECT doc_id, lang, ${sqlBucket("tok")} AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents WHERE NOT ($targetPred))),
       sc AS (SELECT doc_id, lang,
             CAST(SUM(w) // COUNT(*) AS BIGINT) AS score
           FROM toks JOIN wts USING (b) GROUP BY 1, 2)
       SELECT doc_id, lang, score FROM sc
       ORDER BY score DESC, doc_id LIMIT $k"""
}
