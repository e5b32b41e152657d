package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Distribution-drift monitoring between two corpus slices — the
  * "did my train distribution move away from what I serve/evaluate"
  * check a pipeline runs next to [[SnapshotDiff]]: per-token rates in
  * each slice plus the per-token total-variation contribution, whose
  * sum over tokens (halved) is the classical TV distance. TV is a
  * RATIONAL divergence — unlike KL there is no logarithm, so every
  * number here is exact integer ppm arithmetic and the DuckDB oracle
  * replays it bit-for-bit (the engines' `ln` implementations are NOT
  * guaranteed to agree in the last ulp; the log-free choice is what
  * keeps the drift monitor oracle-exact, the Robertson-idf discipline
  * applied to divergences).
  *
  * 100 TB posture: ONE corpus explode → one (token, slice-conditional
  * counts) groupBy with map-side combine; slice totals are a 1-row
  * ungrouped aggregate broadcast into the rate projection. Output is
  * vocabulary-sized. Smoothing-free by design: a token absent from a
  * slice contributes its full rate on the other side (rate 0 is
  * exact, not a log-domain singularity).
  */
object Drift {

  /** Per-token drift between the rows of `docs` matching `sliceA`
    * and those matching `sliceB` (rows matching neither are ignored;
    * a row may match only one — caller supplies disjoint slices).
    * Output: (tok, a_ppm, b_ppm, tv_ppm) with rates in ppm of the
    * slice's total token occurrences and tv_ppm = |a_ppm − b_ppm|. */
  def tokenShift(docs: DataFrame, textCol: Column, sliceA: Column,
      sliceB: Column): DataFrame = {
    val toks = docs
      .select(sliceA.as("in_a"), sliceB.as("in_b"),
        explode(TextFunctions.tokens(textCol)).as("tok"))
      .filter(col("in_a") || col("in_b"))
    val counts = toks.groupBy(col("tok"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("in_b"), 1L).otherwise(0L)).as("cnt_b"))
    val totals = counts
      .agg(coalesce(sum(col("cnt_a")), lit(0L)).as("tot_a"),
        coalesce(sum(col("cnt_b")), lit(0L)).as("tot_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        expr("(cnt_a * 1000000L) div greatest(tot_a, 1L)").as("a_ppm"),
        expr("(cnt_b * 1000000L) div greatest(tot_b, 1L)").as("b_ppm"))
      .withColumn("tv_ppm", abs(col("a_ppm") - col("b_ppm")))
  }

  /** Oracle twin of [[tokenShift]]: (tok, a_ppm, b_ppm, tv_ppm). */
  def sqlTokenShift(table: String, textExpr: String, sliceAPred: String,
      sliceBPred: String): String =
    s"""SELECT tok,
         (cnt_a * 1000000) // greatest(tot_a, 1) AS a_ppm,
         (cnt_b * 1000000) // greatest(tot_b, 1) AS b_ppm,
         abs((cnt_a * 1000000) // greatest(tot_a, 1)
           - (cnt_b * 1000000) // greatest(tot_b, 1)) AS tv_ppm
       FROM (
         SELECT tok,
           CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
           CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
         FROM (SELECT ($sliceAPred) AS in_a, ($sliceBPred) AS in_b,
             unnest(string_split($textExpr, ' ')) AS tok
           FROM $table)
         WHERE in_a OR in_b GROUP BY 1)
       CROSS JOIN (
         SELECT CAST(COALESCE(SUM(CASE WHEN in_a THEN 1 ELSE 0 END), 0) AS BIGINT) AS tot_a,
           CAST(COALESCE(SUM(CASE WHEN in_b THEN 1 ELSE 0 END), 0) AS BIGINT) AS tot_b
         FROM (SELECT ($sliceAPred) AS in_a, ($sliceBPred) AS in_b,
             unnest(string_split($textExpr, ' ')) AS tok
           FROM $table)
         WHERE in_a OR in_b)"""
}
