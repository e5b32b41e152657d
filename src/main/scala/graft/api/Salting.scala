package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (100 TB posture).
  *
  * AQE's skew-join splitting handles join-side skew at runtime; this
  * helper covers the aggregation side: a two-phase salted aggregate
  * spreads a hot group over `saltBuckets` reducers before the final
  * per-key combine. Correct for any algebraic aggregate expressed as
  * (partial, final) pairs — the same decomposition the reference's
  * combinable reduceGroup contract demands
  * ([U] GroupReduceCombineDriver; SURVEY.md §2.4). Sums (and counts =
  * sums of 1) are shown; min/max salt the same way.
  */
object Salting {

  /** Two-phase salted sum: partial sums per (keys, salt), then the
    * final per-key combine. The salt derives from the row identity —
    * uniform, deterministic per execution, and independent of the
    * (hot) key values. */
  def saltedSum(df: DataFrame, keys: Seq[String],
      sumExprs: Seq[(Column, String)], saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partials = df
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(sumExprs.head._1).as(sumExprs.head._2),
        sumExprs.tail.map { case (e, n) => sum(e).as(n) }: _*)
    partials
      .groupBy(keyCols: _*)
      .agg(sum(col(sumExprs.head._2)).as(sumExprs.head._2),
        sumExprs.tail.map { case (_, n) => sum(col(n)).as(n) }: _*)
  }
}
