package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.CorpusScoring

/** Curriculum staging: bucket the corpus into easy→hard training
  * stages by language-model typicality (higher unigram ppm score =
  * more typical = earlier stage), the ordering curriculum-learning
  * schedules train on.
  *
  * The stage boundaries are quartiles of a FIXED-SIZE deterministic
  * sample, not of the corpus: exact global quantiles need a global
  * sort, so at scale the thresholds come from a hash-deterministic
  * 256-doc sample (the [[Sampling.fixedSample]] TakeOrdered shape —
  * the same sample-then-bound trick Spark's own RangePartitioner
  * uses), computed exactly on the bounded sample and broadcast as a
  * 1-row frame. Assignment is then a per-row comparison; the output
  * is per-stage stats.
  *
  * 100 TB posture: unigram scoring is the measured two-pass
  * skew-safe pipeline; the sample is a TakeOrderedAndProject
  * (per-partition top-k, k-row driver merge); everything after is
  * one broadcast of a 1-row threshold frame and one 4-group
  * partial agg. No global sort anywhere.
  */
object Curriculum {

  /** Threshold-sample size: big enough for stable quartiles, small
    * enough that the single-partition rank window is trivially
    * bounded (plan-visible via the limit). */
  val SampleK = 256

  /** Per-stage stats (stage 1 = most typical quartile band):
    * (stage, n_docs, min_score, max_score). */
  def stages(docs: DataFrame): DataFrame = {
    val scores = CorpusScoring.unigramScores(docs, materialize = true)
    val sample = Sampling.fixedSample(scores, "doc_id", SampleK)
    val w = Window.orderBy(col("score"), col("doc_id"))
    val cw = Window.partitionBy()
    val th = sample
      .select(col("score"), row_number().over(w).as("rn"),
        count(lit(1)).over(cw).as("n"))
      .agg(
        max(when(col("rn") === expr("(n + 3) div 4"), col("score"))).as("t25"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("score"))).as("t50"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("score"))).as("t75"))
    scores.crossJoin(broadcast(th))
      .select(col("score"),
        when(col("score") >= col("t75"), 1)
          .when(col("score") >= col("t50"), 2)
          .when(col("score") >= col("t25"), 3).otherwise(4).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
  }

  /** SQL twin of [[stages]]. */
  def sqlStages(): String = {
    val bucket = Sampling.sqlIdBucket("doc_id", 1000000)
    s"""WITH ${CorpusScoring.sqlUnigramScoresCtes("documents")},
       samp AS (SELECT score, doc_id FROM ds
                ORDER BY $bucket, doc_id LIMIT $SampleK),
       ranked AS (SELECT score,
           row_number() OVER (ORDER BY score, doc_id) AS rn,
           COUNT(*) OVER () AS n FROM samp),
       th AS (SELECT
           MAX(CASE WHEN rn = (n + 3) // 4 THEN score END) AS t25,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN score END) AS t50,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN score END) AS t75
         FROM ranked),
       st AS (SELECT CASE
             WHEN score >= (SELECT t75 FROM th) THEN 1
             WHEN score >= (SELECT t50 FROM th) THEN 2
             WHEN score >= (SELECT t25 FROM th) THEN 3 ELSE 4 END AS stage,
           score FROM ds)
       SELECT stage, COUNT(1) AS n_docs,
         CAST(MIN(score) AS BIGINT) AS min_score,
         CAST(MAX(score) AS BIGINT) AS max_score
       FROM st GROUP BY stage"""
  }
}
