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
  *
  * Salt-stability contract: salts derive from
  * `monotonically_increasing_id()`, whose value depends on task/
  * partition layout — Spark marks the expression nondeterministic, so
  * a retried or speculatively re-executed task recomputes the WHOLE
  * partition (never a suffix under different salts), and two attempts
  * of one task may assign different salts transiently. That is safe
  * here by construction: the salt only ever routes rows across
  * reducers and never reaches the output (both operators' results
  * equal their unsalted forms — the property the q_salted_* oracles
  * pin). Salt values are per-execution best-effort, not contractual;
  * don't persist or join on them.
  */
object Salting {

  /** Salted (replicated-build) join for hot probe keys — the manual
    * form of AQE's skew-join split, for when the skew is known up
    * front or AQE is unavailable (e.g. inside a cached subtree): the
    * probe side gets a uniform row-identity salt in [0, saltBuckets),
    * the build side is replicated once per salt value, and the join
    * key becomes (keys, salt) — a hot key's rows now spread over
    * `saltBuckets` reducers instead of one. Build-side cost is
    * |build| × saltBuckets rows through the shuffle: appropriate for
    * dimension/weight-table builds, not for fact-fact joins (use AQE
    * there). Only "inner" and "left" are allowed — replication would
    * duplicate unmatched build rows under right/full semantics. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, not $joinType (build rows are replicated)")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets " +
      "(0 would null every probe salt and silently match nothing)")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

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
