package graft.api

import org.apache.spark.sql.Dataset

/** Spread a narrow input across the cluster BEFORE per-row CPU-heavy
  * work (batched codec encode/decode, heavy per-row synthesis) — the
  * optimization guide's §2.5 "input skew" remedy: "one huge
  * unsplittable file … repartition immediately after the read".
  *
  * Why this exists: a parquet file can only be split at row-group
  * boundaries, so a table that arrives as few files (or few row
  * groups) caps the SCAN stage's task count no matter what
  * maxPartitionBytes/minPartitionNum say — and every narrow per-row
  * operator chained onto the scan (mapPartitions codecs, expression
  * stacks) inherits that cap. At the bench SFs each table is ONE
  * small parquet file, so a codec query's entire encode+decode chain
  * ran as ONE task regardless of core count (measured: the codec
  * family's 8→32-core scaling ratios sat at ~1.0 while genuinely
  * parallel queries scale 5-7x).
  *
  * The fix is conditional, not unconditional: rows are exchanged only
  * when the planned scan parallelism is BELOW the cluster's core
  * count. At 100 TB a corpus arrives in many thousands of splits, the
  * condition is false, and no shuffle is added — the guard is derived
  * from the actual input layout at plan time, not from a constant
  * tuned to either scale. When it does fire, the exchange carries the
  * raw input rows once (round-robin, so variable-cost payloads also
  * stop skewing one task) and the downstream per-row work — orders of
  * magnitude more expensive per byte than one narrow exchange —
  * parallelizes across every core.
  *
  * Contract: call on a scan-rooted NARROW frame (scan + projections /
  * filters / unions, no exchanges upstream) — partition-count
  * inspection plans the frame but runs nothing for such plans. Only
  * order-independent consumers may follow (aggregations, joins,
  * per-row maps): round-robin repartitioning changes row placement
  * and relative order, never content.
  */
object Spread {

  /** `df` repartitioned round-robin to the default parallelism when
    * its planned partition count is below it; `df` unchanged (and no
    * exchange added) otherwise. */
  def forCompute[T](df: Dataset[T]): Dataset[T] = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
