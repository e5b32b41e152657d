package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.HashMod

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines (driver-mandated scope extension, same family as
  * graft.dedup): no RNG, no seed state — assignment is a pure
  * function of the row id, so splits are stable across runs, engines
  * (DuckDB oracle replicates the arithmetic exactly), cluster sizes,
  * and re-partitions. That reproducibility-by-construction is the
  * property a 100 TB pipeline needs: re-running a failed stage must
  * not reshuffle examples between train and test.
  *
  * All operators are narrow per-row expressions (plus an aggregate
  * where the query wants counts) — no shuffle beyond what the caller
  * asks for, no driver state.
  */
object Sampling {

  /** Stable pseudo-uniform bucket in [0, buckets) from a non-negative
    * long id: (((id % 1000000007) * 2654435761) % 1000000007) % buckets.
    * The multiplier is the Knuth/Fibonacci hashing constant; the id is
    * pre-folded by the same prime modulus BEFORE the multiply, so the
    * intermediate product stays < 2^63 for EVERY long id (|id % p| <
    * 1e9, times 2.66e9 ≈ 2.7e18 < Long.MaxValue) — no silent Spark
    * wraparound vs DuckDB BIGINT-overflow divergence at any id range.
    * For ids already < 1e9 (the testdata corpus) the pre-fold is the
    * identity, so bucket assignments are unchanged. Negative ids yield
    * negative buckets (Spark and DuckDB both follow the dividend's
    * sign, so the engines still agree); splitLabel then sends them all
    * to "train" — pre-fold to non-negative if ids can be negative.
    * Stateless and per-row, so the same expression runs unchanged on
    * Structured Streaming inputs (see StreamOpsSpec). */
  def idBucket(id: Column, buckets: Int): Column =
    (((id.cast("long") % lit(HashMod)) * lit(2654435761L)) % lit(HashMod)) %
      lit(buckets.toLong)

  def sqlIdBucket(idExpr: String, buckets: Int): String =
    s"(((CAST($idExpr AS BIGINT) % $HashMod) * 2654435761) % $HashMod) % $buckets"

  /** Train/val/test assignment by id bucket: [0,train) -> "train",
    * [train, train+val) -> "val", rest -> "test", out of 1000 mills. */
  def splitLabel(id: Column, trainMills: Int = 800, valMills: Int = 100): Column = {
    val b = idBucket(id, 1000)
    when(b < trainMills, lit("train"))
      .when(b < trainMills + valMills, lit("val"))
      .otherwise(lit("test"))
  }

  def sqlSplitLabel(idExpr: String, trainMills: Int = 800, valMills: Int = 100): String =
    s"""CASE WHEN ${sqlIdBucket(idExpr, 1000)} < $trainMills THEN 'train'
         WHEN ${sqlIdBucket(idExpr, 1000)} < ${trainMills + valMills} THEN 'val'
         ELSE 'test' END"""

  /** Deterministic ~rate-fraction sample: keep rows whose bucket (out
    * of `denom`) is below `keep`. Stratification is free — the bucket
    * is independent of any grouping column, so per-group keep rates
    * concentrate around keep/denom. */
  def sampleFilter(id: Column, keep: Int, denom: Int = 1000): Column =
    idBucket(id, denom) < keep

  /** Deterministic fixed-size uniform sample: the k smallest rows by
    * (hash-bucket, id). Runs as TakeOrderedAndProject — a per-partition
    * top-k plus a single k-row merge on the driver side of the plan,
    * never a global sort — so it scales to any corpus size. */
  def fixedSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(idBucket(col(idCol), 1000000), col(idCol)).limit(k)

  /** Deterministic fixed-k sample PER GROUP ("k examples per
    * language/source"): rank within each group by (hash-bucket, id)
    * and keep rank <= k. The rank predicate plans as a
    * WindowGroupLimit — per-partition group-wise top-k before the
    * single keyed shuffle, never a global or full per-group sort —
    * and the hash order makes the pick uniform and stable under
    * re-runs, re-partitioning, and corpus growth localized elsewhere.
    * Output keeps the rank as `rk` (1-based). */
  def fixedSamplePerGroup(df: DataFrame, idCol: String,
      groupCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(idBucket(col(idCol), 1000000), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic epoch shuffle — the reproducible training-order
    * contract: each epoch assigns every row a shard and an in-shard
    * position from a pure hash of (id, epoch), so the order is (a)
    * different every epoch, (b) bit-identical across re-runs, cluster
    * sizes and engines, and (c) NEVER a global sort — rows hash into
    * `shards` independent shards and only each shard sorts (one keyed
    * exchange + per-shard window; a dataloader then walks shards
    * round-robin). The per-epoch mix of id and epoch runs through the
    * same pre-folded Knuth hash as [[idBucket]], so every intermediate
    * stays < 2^63 for any id. Output adds (epoch, shard, pos).
    *
    * The mix is deliberately NON-AFFINE in the epoch: the mixed value
    * is SQUARED mod the prime before the diffusion multiply, so
    * h_e = K·(c+31·0+e)² mod M — the per-epoch difference
    * h_{e+1} − h_e = K·(2(c+e)+1) depends on the row's own c, unlike a
    * purely add/multiply chain mod a prime, where every composition is
    * affine in e and each epoch's order is the previous one's global
    * rotation (ADVICE r11 #2; [[graft.SamplingSpec]] pins near-zero
    * rank correlation between consecutive epochs). Squaring keeps every
    * intermediate < 2^63 (mixed < M ≈ 1e9 ⇒ mixed² ≈ 1e18;
    * M·K ≈ 2.66e18) and is engine-exact BIGINT arithmetic, so the
    * DuckDB twin replays it bit-for-bit. */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
      shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epoch = explode(sequence(lit(0), lit(epochs - 1)))
    val mixed = ((col(idCol).cast("long") % lit(HashMod)) * lit(31L)
      + col("epoch")) % lit(HashMod)
    val h = ((((mixed * mixed) % lit(HashMod)) * lit(2654435761L)) %
      lit(HashMod)).as("h")
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col(idCol))
    df.withColumn("epoch", epoch)
      .withColumn("h", h)
      .withColumn("shard", col("h") % lit(shards.toLong))
      .withColumn("pos", row_number().over(w))
      .drop("h")
  }

  /** SQL twin of [[epochShuffle]] (ends in the same added columns,
    * same squared non-affine mix). */
  def sqlEpochShuffle(table: String, idExpr: String, epochs: Int,
      shards: Int): String =
    s"""SELECT * EXCLUDE (h),
         CAST(row_number() OVER (PARTITION BY epoch, shard
           ORDER BY h, $idExpr) AS INT) AS pos
       FROM (
         SELECT * EXCLUDE (mixed),
           (((mixed * mixed) % $HashMod) * 2654435761) % $HashMod AS h,
           ((((mixed * mixed) % $HashMod) * 2654435761) % $HashMod)
             % $shards AS shard
         FROM (
           SELECT *,
             ((CAST($idExpr AS BIGINT) % $HashMod) * 31 + epoch)
               % $HashMod AS mixed
           FROM $table
           CROSS JOIN (SELECT unnest(generate_series(0, ${epochs - 1}))
                       AS epoch)))"""

  /** Weighted domain mixture: per-domain keep rates (in mills) applied
    * through the same deterministic id bucket — the way a training mix
    * downsamples over-represented sources (e.g. web 20%, code 100%).
    * Unknown domains fall back to `defaultMills`. Pure per-row
    * predicate: no shuffle, no RNG, stable under re-runs and
    * re-partitioning; rates ride a literal CASE chain so the filter
    * stays codegen'd and pushes down to the scan. */
  def mixtureFilter(id: Column, domain: Column, ratesMills: Map[String, Int],
      defaultMills: Int = 0): Column = {
    val rate = ratesMills.foldLeft(lit(defaultMills)) { case (acc, (d, m)) =>
      when(domain === lit(d), lit(m)).otherwise(acc)
    }
    idBucket(id, 1000) < rate
  }

  def sqlMixtureFilter(idExpr: String, domainExpr: String,
      ratesMills: Map[String, Int], defaultMills: Int = 0): String = {
    // SQL-escape the domain keys (quote doubling): the Spark side
    // takes them as lit(...) Columns, so a domain name containing a
    // quote must not break only the oracle string (ADVICE r11 #5)
    val cases = ratesMills.toSeq.sortBy(_._1)
      .map { case (d, m) =>
        s"WHEN $domainExpr = '${d.replace("'", "''")}' THEN $m" }
      .mkString(" ")
    s"${sqlIdBucket(idExpr, 1000)} < (CASE $cases ELSE $defaultMills END)"
  }

  /** Temperature-rebalanced mixture (the α = 0.5 domain-upsampling
    * trick multilingual training mixes use): per-domain target
    * quotas ∝ isqrt(n_domain) — low-resource domains get upsampled
    * relative to their share, high-resource ones damped — converted
    * to per-domain hash keep-rates and applied as the same pure
    * per-row predicate as [[mixtureFilter]]. Unlike mixtureFilter
    * the rates come FROM the corpus counts, so the mix re-balances
    * itself as the corpus grows.
    *
    * isqrt is engine-exact: floor(sqrt(n)) of an exactly-
    * representable BIGINT < 2^53 is the same double in both engines.
    * Output: (domain, n_docs, quota, n_sampled) — n_sampled tracks
    * quota up to hash-bucket granularity.
    *
    * 100 TB posture: one grouped count (bounded by the domain
    * cardinality), a 1-row total crossed back, then a per-row
    * hash predicate — the domain-rate join is a tiny equi-join AQE
    * broadcasts on its own, and nothing else shuffles. */
  def temperatureMix(docs: DataFrame, domain: String, idCol: String,
      budget: Long): DataFrame = {
    val counts = docs.groupBy(col(domain)).agg(count(lit(1)).as("n_docs"))
      .withColumn("r", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("r")).as("tot"))
    // rates in ppm, not mills: a mills rate floors to ZERO once the
    // budget drops under n/1000 (measured: 1M docs, budget 200 ->
    // empty sample), ppm holds to n/1e6 per domain
    val quotas = counts.crossJoin(broadcast(tot))
      .select(col(domain), col("n_docs"),
        expr(s"(r * ${budget}L) div tot").as("quota"))
      .withColumn("rate",
        least(lit(1000000L), expr("(quota * 1000000L) div n_docs")))
    // LEFT join back onto the quota table so a domain whose rate
    // floors to zero still reports n_sampled = 0 — an auditor must
    // see zeroed domains, not mistake them for absent ones
    val sampled = docs.select(col(idCol), col(domain))
      .join(quotas.select(col(domain), col("rate")), Seq(domain))
      .filter(idBucket(col(idCol), 1000000) < col("rate"))
      .groupBy(col(domain)).agg(count(lit(1)).as("n_sampled"))
    quotas.join(sampled, Seq(domain), "left")
      .select(col(domain), col("n_docs"), col("quota"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
  }

  /** SQL twin of [[temperatureMix]]. */
  def sqlTemperatureMix(table: String, domain: String, idExpr: String,
      budget: Long): String =
    s"""WITH c AS (SELECT $domain, COUNT(1) AS n_docs,
           CAST(floor(sqrt(CAST(COUNT(1) AS DOUBLE))) AS BIGINT) AS r
         FROM $table GROUP BY 1),
       t AS (SELECT CAST(SUM(r) AS BIGINT) AS tot FROM c),
       q AS (SELECT $domain, n_docs,
           (r * $budget) // (SELECT tot FROM t) AS quota FROM c),
       q2 AS (SELECT $domain, n_docs, quota,
           LEAST(1000000, (quota * 1000000) // n_docs) AS rate FROM q),
       s AS (SELECT $domain, COUNT(1) AS n_sampled
           FROM $table d JOIN q2 USING ($domain)
           WHERE ${sqlIdBucket(idExpr, 1000000)} < rate
           GROUP BY 1)
       SELECT $domain, n_docs, CAST(quota AS BIGINT) AS quota,
         COALESCE(n_sampled, 0) AS n_sampled
       FROM q2 LEFT JOIN s USING ($domain)"""

  /** Deterministic WEIGHTED sampling priority (integer Efraimidis-
    * Spirakis analogue): rows ranked by `uniformHash / weight`
    * ascending are a weighted sample without replacement — a row with
    * k times the weight is k times as likely to rank in any top-k
    * prefix. The float formulation (u^(1/w), -ln(u)/w keys) is not
    * engine-exact; this integer quotient is: the raw id hash in
    * [0, ~1e9), times 10^6, divided (exact integer division via the
    * pmod identity — Column `/` is double division) by the positive
    * integer weight — all < 2^63 AND < 2^53, so every step replays in
    * DuckDB bit-for-bit. Heavier rows get SMALLER priorities; take
    * rank <= k ascending (WindowGroupLimit per group, never a global
    * sort). Ties are broken by id. */
  def weightedPriority(id: Column, weight: Column): Column = {
    val h = ((id.cast("long") % lit(HashMod)) * lit(2654435761L)) % lit(HashMod)
    val a = h * lit(1000000L)
    val b = greatest(weight.cast("long"), lit(1L))
    ((a - pmod(a, b)) / b).cast("long")
  }

  def sqlWeightedPriority(idExpr: String, weightExpr: String): String =
    s"(((CAST($idExpr AS BIGINT) % $HashMod) * 2654435761) % $HashMod) " +
      s"* 1000000 // greatest(CAST($weightExpr AS BIGINT), 1)"

  /** Deterministic fixed-k WEIGHTED sample per group: smallest k
    * [[weightedPriority]] rows per group. Same plan shape as
    * [[fixedSamplePerGroup]] (rank predicate -> WindowGroupLimit). */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, weightCol: String,
      groupCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(weightedPriority(col(idCol), col(weightCol)), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
