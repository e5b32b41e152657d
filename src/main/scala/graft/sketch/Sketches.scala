package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.HashMod

/** Deterministic sketches — fixed-size summaries for the questions a
  * 100 TB pipeline asks constantly ("how many distinct ids", "which
  * tokens are heavy") where the exact answer's shuffle is the cost:
  * exact count-distinct and exact top-k both move EVERY distinct key
  * through an exchange, while these sketches move either a fixed
  * number of counters (count-min), a fixed number of hash values
  * (KMV), or a hash-rate-thinned key stream (range estimator).
  *
  * Everything is deliberately RNG-free: hashes are fixed public
  * constants over the shared portable modulus
  * ([[graft.text.TextFunctions.HashMod]]), so a sketch is a pure
  * function of its input — stable across runs, partitionings and
  * engines, which is what makes every estimator DuckDB-replayable
  * bit-for-bit (the same discipline as [[graft.pipeline.Sampling]]).
  *
  * Estimator background is classical and public: KMV / bottom-k
  * (Bar-Yossef et al. 2002), hash-range a.k.a. adaptive/distinct
  * sampling (Flajolet 1990, Gibbons 2001), count-min (Cormode &
  * Muthukrishnan 2005).
  */
object Sketches {

  /** Pseudo-uniform long hash into [0, HashMod): the
    * [[graft.pipeline.Sampling.idBucket]] core without the final
    * bucket fold — Knuth multiplicative hashing with the id pre-folded
    * by the prime so the product stays < 2^63 for every long (and
    * DuckDB's overflow-checked BIGINT multiply agrees). */
  def longHash(id: Column): Column =
    ((id.cast("long") % lit(HashMod)) * lit(2654435761L)) % lit(HashMod)

  def sqlLongHash(idExpr: String): String =
    s"(((CAST($idExpr AS BIGINT) % $HashMod) * 2654435761) % $HashMod)"

  /** Polynomial character hash of a token into [0, HashMod):
    * fold (acc*131 + ascii(char)) % p. Stronger than the positional
    * [[graft.text.TextFunctions.wordVal]] (whole-word, not
    * first/last/length), used where token collisions would merge
    * sketch counters. HOF form — fine at sketch-readout cardinality;
    * the corpus-side explode pays it once per occurrence. */
  def tokVal(w: Column): Column =
    when(length(w) > 0,
      aggregate(transform(sequence(lit(1), length(w)),
          i => ascii(w.substr(i, lit(1))).cast("long")),
        lit(0L), (acc, c) => (acc * 131 + c) % lit(HashMod)))
      .otherwise(lit(0L))

  def sqlTokVal(wExpr: String): String =
    s"""(CASE WHEN length($wExpr) > 0 THEN list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, length($wExpr)),
             i -> CAST(ascii($wExpr[i:i]) AS BIGINT))),
         (acc, c) -> (acc*131 + c) % $HashMod)
       ELSE 0 END)"""

  // ---- distinct-count estimators --------------------------------------

  /** Hash-range distinct estimator (distinct sampling): keep only ids
    * whose hash lands below `HashMod div rate`, count THOSE distinct,
    * scale back up: est = (n_sampled * HashMod) div bound. The
    * distinct's exchange carries ~1/rate of the key space — the knob
    * a 100 TB count-distinct turns (rate 2^20 ⇒ a million-fold
    * thinner shuffle), with relative error ~1/sqrt(n/rate).
    * Output 1 row: (n_sampled, est). */
  def distinctRangeEstimate(df: DataFrame, idCol: String, rate: Int): DataFrame = {
    val bound = HashMod / rate
    df.select(longHash(col(idCol)).as("h"))
      .filter(col("h") < bound)
      .agg(count_distinct(col("h")).as("n_sampled"))
      .select(col("n_sampled"),
        expr(s"(n_sampled * ${HashMod}L) div ${bound}L").as("est"))
  }

  /** KMV / bottom-k distinct estimator: the k smallest DISTINCT
    * hashes; est = ((k-1) * HashMod) div h_k. Bounded state (k longs)
    * and mergeable (union = bottom-k of unions), which is why it's
    * the form that rides per-shard → global rollups. The distinct
    * runs map-side-partial before one exchange; the bottom-k is a
    * TakeOrdered, never a global sort. Output 1 row: (h_k, est). */
  def kmvEstimate(df: DataFrame, idCol: String, k: Int): DataFrame =
    kmvTail(df.select(longHash(col(idCol)).as("h")), k)

  /** The shared KMV estimator tail over a raw hash column `h` —
    * also the merge/read side of [[bottomK]] sketches (bottom-k of a
    * union of bottom-k extents IS the union's bottom-k: mergeability,
    * spec-pinned). */
  private[graft] def kmvTail(hashes: DataFrame, k: Int): DataFrame =
    hashes
      .distinct()
      .orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_in"))
      // under-full sketch (< k distinct values seen): the sample IS
      // the population — return the exact count, not the k-th-order-
      // statistic extrapolation (which would overestimate ~2.5x).
      // greatest(,1): hash 0 (id ≡ 0 mod p) must not divide by zero.
      .select(col("h_k"),
        when(col("n_in") < k, col("n_in"))
          .otherwise(expr(s"((${k - 1}L) * ${HashMod}L) div greatest(h_k, 1L)"))
          .as("est"))

  /** The bottom-k hash set of one input — the KMV sketch STATE
    * (≤ k longs, column `h`), for per-shard/per-batch persistence and
    * later [[kmvTail]] rollup. */
  def bottomK(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.select(longHash(col(idCol)).as("h"))
      .distinct()
      .orderBy(col("h")).limit(k)

  /** Oracle twins: the same arithmetic in DuckDB SQL, ending in a
    * 1-row (n_sampled, est) / (h_k, est). */
  def sqlDistinctRangeEstimate(table: String, idExpr: String, rate: Int): String = {
    val bound = HashMod / rate
    s"""SELECT n_sampled, (n_sampled * $HashMod) // $bound AS est
       FROM (SELECT COUNT(DISTINCT h) AS n_sampled
             FROM (SELECT ${sqlLongHash(idExpr)} AS h FROM $table)
             WHERE h < $bound)"""
  }

  def sqlKmvEstimate(table: String, idExpr: String, k: Int): String =
    s"""SELECT h_k,
         CASE WHEN n_in < $k THEN n_in
           ELSE (CAST(${k - 1} AS BIGINT) * $HashMod) // greatest(h_k, 1)
         END AS est
       FROM (SELECT MAX(h) AS h_k, COUNT(1) AS n_in FROM (
         SELECT DISTINCT ${sqlLongHash(idExpr)} AS h FROM $table
         ORDER BY h LIMIT $k))"""

  /** KMV as a GROUP aggregate — "distinct users per event type /
    * language / source" with bounded per-group state: the k smallest
    * distinct hashes per group via a rank window (plans as
    * WindowGroupLimit: per-partition group-wise top-k before the one
    * keyed exchange), then the [[kmvEstimate]] tail per group
    * (exact when a group is under-full). Output: (group, est). */
  def kmvPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    df.select(col(groupCol), longHash(col(idCol)).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .groupBy(col(groupCol))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_in"))
      .select(col(groupCol),
        when(col("n_in") < k, col("n_in"))
          .otherwise(expr(s"((${k - 1}L) * ${HashMod}L) div greatest(h_k, 1L)"))
          .as("est"))
  }

  /** Oracle twin of [[kmvPerGroup]]: ends in (grp, est). */
  def sqlKmvPerGroup(table: String, groupExpr: String, idExpr: String,
      k: Int): String =
    s"""SELECT grp,
         CASE WHEN COUNT(1) < $k THEN COUNT(1)
           ELSE (CAST(${k - 1} AS BIGINT) * $HashMod) // greatest(MAX(h), 1)
         END AS est
       FROM (
         SELECT grp, h FROM (
           SELECT DISTINCT $groupExpr AS grp, ${sqlLongHash(idExpr)} AS h
           FROM $table)
         QUALIFY row_number() OVER (PARTITION BY grp ORDER BY h) <= $k)
       GROUP BY 1"""

  // ---- count-min heavy hitters -----------------------------------------

  /** Count-min geometry: Depth independent rows × Width counters.
    * Coefficients are fixed public odd constants; (a*v + b) stays
    * < 2^63 for v < HashMod (a < 8e9), so Spark and DuckDB agree. */
  val CmsDepth = 4
  val CmsWidth = 1024
  /** Flattened (a_i, b_i) pairs of the row-hash family
    * h_i(v) = ((a_i*v + b_i) % HashMod) % Width. */
  val CmsCoeffs: Seq[(Long, Long)] = Seq(
    (2654435761L, 0L), (2246822519L, 3266489917L),
    (3266489917L, 668265263L), (668265263L, 374761393L))

  private def cmsBucket(v: Column, i: Int): Column = {
    val (a, b) = CmsCoeffs(i)
    ((v * lit(a) + lit(b)) % lit(HashMod)) % lit(CmsWidth.toLong)
  }

  def sqlCmsBucket(vExpr: String, i: Int): String = {
    val (a, b) = CmsCoeffs(i)
    s"((($vExpr * $a + $b) % $HashMod) % $CmsWidth)"
  }

  /** Build the count-min sketch of a value column: (row_i, bucket,
    * cnt), at most Depth×Width rows REGARDLESS of input size — the
    * groupBy partial-aggregates map-side into the fixed counter
    * space, so the exchange moves ≤ Depth×Width rows per partition
    * where an exact token count would move every distinct key. `v`
    * must already be a long in [0, HashMod) ([[tokVal]] /
    * [[longHash]]). */
  def cmsSketch(df: DataFrame, v: Column): DataFrame =
    df.select(posexplode(array(
        (0 until CmsDepth).map(i => cmsBucket(v, i)): _*))
        .as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate candidates against a built sketch: est(v) =
    * min over rows of the counter v hashes into — a classical upper
    * bound (collisions only inflate). `cands` must carry (any key
    * columns..., v); the sketch side is ≤ Depth×Width rows and
    * broadcasts. */
  def cmsEstimate(sketch: DataFrame, cands: DataFrame): DataFrame = {
    val withBuckets = cands.select(col("*"),
      posexplode(array((0 until CmsDepth).map(i =>
        cmsBucket(col("v"), i)): _*)).as(Seq("row_i", "bucket")))
    val keyCols = cands.columns.filterNot(_ == "v").map(col).toSeq
    withBuckets
      // the sketch is ≤ Depth×Width rows by construction; the limit is
      // a no-op making that bound PLAN-VISIBLE for the hard-broadcast
      // audit (the knnQueries discipline). The counter is renamed so
      // candidates may carry their own `cnt` (the comparison readout).
      // LEFT join + coalesce(0): an unoccupied counter reads 0 (the
      // canonical count-min cell), so a candidate the stream never saw
      // estimates 0 instead of vanishing or min-ing only its occupied
      // buckets (which would overestimate)
      .join(broadcast(sketch
          .select(col("row_i"), col("bucket"), col("cnt").as("cms_cnt"))
          .limit(CmsDepth * CmsWidth)),
        Seq("row_i", "bucket"), "left")
      .groupBy(keyCols :+ col("v"): _*)
      .agg(min(coalesce(col("cms_cnt"), lit(0L))).as("est"))
  }

  /** Join-cardinality estimate from two count-min sketches (Cormode &
    * Muthukrishnan's inner-product bound): for each row i, the dot
    * product Σ_bucket cntA·cntB upper-bounds the true equi-join size
    * Σ_v fA(v)·fB(v); the min over rows is the estimate. The
    * pre-flight "how big is this join" check — both sides reduce to
    * fixed Depth×Width counter arrays (map-side combined), so the
    * answer costs two narrow scans and a 4096-row join instead of the
    * join itself. Missing buckets contribute 0, so the inner join is
    * exact. Output 1 row: (est). Counters are longs; at extreme scale
    * (cnt products near 2^63) widen the sketch instead. */
  def cmsJoinSizeEstimate(a: DataFrame, aV: Column,
      b: DataFrame, bV: Column): DataFrame = {
    val dots = cmsSketch(a, aV)
      .select(col("row_i"), col("bucket"), col("cnt").as("ca"))
      .join(cmsSketch(b, bV)
        .select(col("row_i"), col("bucket"), col("cnt").as("cb")),
        Seq("row_i", "bucket"))
      .groupBy(col("row_i"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    minDot(a.sparkSession, dots)
  }

  /** Self-join (within-one-input) size estimate — ONE sketch build +
    * Σ cnt² per row, the form [[sqlCmsSelfJoinSizeEstimate]] replays:
    * half the scan cost of the two-sided call for the common
    * "how many duplicate-key pairs does this table hold" question. */
  def cmsSelfJoinSizeEstimate(df: DataFrame, v: Column): DataFrame =
    minDot(df.sparkSession,
      cmsSketch(df, v).groupBy(col("row_i"))
        .agg(sum(col("cnt") * col("cnt")).as("dot")))

  /** min over ALL Depth rows: a row whose buckets never overlap has
    * dot 0 (which proves the true join size is 0) and must count —
    * the left join against the literal row set also makes an empty
    * sketch estimate 0, never NULL. */
  private def minDot(spark: org.apache.spark.sql.SparkSession,
      dots: DataFrame): DataFrame =
    spark.range(CmsDepth).select(col("id").cast("int").as("row_i"))
      .join(dots, Seq("row_i"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est"))

  /** Oracle twin of [[cmsJoinSizeEstimate]] for a SELF-join shape:
    * one `vals(v)` CTE, dot of the sketch with itself. */
  def sqlCmsSelfJoinSizeEstimate(valsCte: String): String =
    s"""WITH ${sqlCmsCtes(valsCte)}
       SELECT CAST(MIN(COALESCE(dot, 0)) AS BIGINT) AS est
       FROM cmsrows LEFT JOIN
         (SELECT row_i, SUM(cnt * cnt) AS dot FROM cms GROUP BY 1)
       USING (row_i)"""

  /** Oracle CTEs: `cms(row_i, bucket, cnt)` over a caller-supplied
    * `vals(v)` CTE (one row per occurrence), MATERIALIZED so DuckDB
    * builds the counter table once, plus `cmsrows(row_i)`. Estimates
    * then replay set-based: cross the candidates with cmsrows,
    * compute the row's bucket ([[sqlCmsBucket]] per row via CASE),
    * join cms, and take MIN(cnt) per candidate. */
  def sqlCmsCtes(valsCte: String): String = {
    val rows = (0 until CmsDepth).map(i =>
      s"SELECT $i AS row_i, ${sqlCmsBucket("v", i)} AS bucket FROM vals")
      .mkString(" UNION ALL ")
    s"""vals AS MATERIALIZED ($valsCte),
       cms AS MATERIALIZED (SELECT row_i, bucket, COUNT(1) AS cnt
               FROM ($rows) GROUP BY 1, 2),
       cmsrows AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS row_i)"""
  }

  /** The per-row candidate bucket as one CASE over `row_i` — pairs
    * with [[sqlCmsCtes]]'s cmsrows for the set-based estimate join. */
  def sqlCmsBucketCase(vExpr: String): String =
    (0 until CmsDepth - 1).map(i =>
      s"WHEN $i THEN ${sqlCmsBucket(vExpr, i)}")
      .mkString("CASE row_i ",
        " ", s" ELSE ${sqlCmsBucket(vExpr, CmsDepth - 1)} END")

  // ---- mergeable quantile sketch (log-bucket histogram) ----------------
  //
  // Completes the sketch family (VERDICT r11 #5): distinct
  // (hash-range/KMV), frequency (CMS), join-size (CMS dot) — and now
  // QUANTILES, the remaining classic every 100-TB profiling pass needs.
  // The exact answer (q_percentiles) is a full-shuffle global rank; the
  // sketch is a fixed-grid LOG-BUCKET HISTOGRAM: value → octave band
  // (floor(log2), read engine-exactly off the binary-string length) ×
  // QsGrid linear sub-buckets per octave. Counter space is bounded
  // (≤ 63·QsGrid+1 buckets for any long input), the groupBy
  // partial-aggregates map-side into it (the CMS exchange shape:
  // sketch-sized regardless of corpus), and MERGE IS COUNTER ADD — the
  // per-shard → global rollup law the spec pins. Deterministic and
  // RNG-free like everything above (a pure function of the input
  // multiset, not even hash-dependent), so the DuckDB oracle replays
  // the identical integer arithmetic bit-for-bit. Worst-case relative
  // error of the interpolated read-out is the sub-bucket width,
  // 1/QsGrid ≈ 6.25%; measured ≪ that on real distributions
  // (DevScaleSketch). Classical background: the log-bucketed fixed-
  // grid histogram family (e.g. HDR histograms; DDSketch, Masson et
  // al. 2019, is the relative-error generalization).
  //
  // PRECONDITION: values non-negative (v < 1 folds to bucket 0 = the
  // [0,1) bucket). The full non-negative long range is supported
  // (VERDICT r12 #8 / ADVICE r12): the sub-bucket fold is SHIFT-based
  // ((v−2^band) >> (band−4) for band ≥ 4 — QsGrid = 2^4 divides every
  // power-of-two bucket base exactly, so the shift IS the former
  // ·QsGrid-then-divide without the overflowing multiply), and the
  // read-out interpolation product rides exact wide arithmetic
  // (Decimal(38,0) + integral `div` on the Spark side, HUGEINT + `//`
  // on the DuckDB side — both exact integer floor-division, bit-equal).
  // One documented clamp remains: the topmost sub-bucket of band 62
  // ([2^62·31/16, 2^63)) has a true exclusive upper bound of 2^63,
  // unrepresentable in a signed long; both engines clamp its hi to
  // 2^63−1 (Long.MaxValue), an error of 1 ULP on the interpolation
  // width for values ≥ 8.9e18 — replayed identically by the oracle.

  /** Linear sub-buckets per octave: error knob (1/QsGrid worst-case
    * relative error) and state knob (≤ 63·QsGrid+1 counters). */
  val QsGrid = 16
  /** Hard cap on distinct buckets — the plan-visible broadcast bound. */
  val QsMaxBuckets: Int = 63 * QsGrid + 1

  /** Engine-exact floor(log2(v)) for v ≥ 1: both engines render a
    * non-negative BIGINT's minimal binary string, so its length − 1
    * IS the band (probed: Spark bin ≡ DuckDB bin on [0, 2^63)). */
  private def qsBand(v: Column): Column =
    (length(bin(v)) - 1).cast("long")

  /** Non-negative integer division a div b via the pmod identity —
    * Column `/` is double division (the weightedPriority discipline). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Bucket id of a value: 0 for v < 1, else
    * 1 + band·QsGrid + ((v − 2^band)·QsGrid) div 2^band — computed
    * SHIFT-first so the full long range folds without overflow:
    * QsGrid = 2^4, so for band ≥ 4 the multiply-then-divide is
    * exactly (v − 2^band) >> (band − 4); for band < 4 the residue is
    * < 16 and the direct multiply is trivially safe. */
  def qsBucket(v: Column): Column = {
    val vv = v.cast("long")
    val band = qsBand(vv)
    val base = call_function("shiftleft", lit(1L), band.cast("int"))
    val sub = when(band >= 4L,
        call_function("shiftright", vv - base, (band - 4L).cast("int")))
      .otherwise(idiv((vv - base) * lit(QsGrid.toLong), base))
    when(vv < 1L, lit(0L))
      .otherwise(lit(1L) + band * lit(QsGrid.toLong) + sub)
  }

  def sqlQsBucket(vExpr: String): String = {
    val band = s"(length(bin(CAST($vExpr AS BIGINT))) - 1)"
    val base = s"(1::BIGINT << $band)"
    s"""(CASE WHEN CAST($vExpr AS BIGINT) < 1 THEN 0
         WHEN $band >= 4 THEN 1 + $band * $QsGrid
           + ((CAST($vExpr AS BIGINT) - $base) >> ($band - 4))
         ELSE 1 + $band * $QsGrid
           + ((CAST($vExpr AS BIGINT) - $base) * $QsGrid) // $base END)"""
  }

  /** Bucket lower bound (bucket 0 = [0,1)); shift-first like
    * [[qsBucket]] so band-60+ bounds don't overflow the off·base
    * product. */
  private def qsLo(b: Column): Column = {
    val band = idiv(b - 1, lit(QsGrid.toLong))
    val off = pmod(b - 1, lit(QsGrid.toLong))
    val base = call_function("shiftleft", lit(1L), band.cast("int"))
    val step = when(band >= 4L,
        call_function("shiftleft", off, (band - 4L).cast("int")))
      .otherwise(idiv(off * base, lit(QsGrid.toLong)))
    when(b === 0L, lit(0L)).otherwise(base + step)
  }

  /** Bucket upper bound (exclusive); the band-62 top sub-bucket's
    * true bound 2^63 clamps to Long.MaxValue (documented 1-ULP
    * trade, mirrored in the SQL twin). */
  private def qsHi(b: Column): Column = {
    val band = idiv(b - 1, lit(QsGrid.toLong))
    val off = pmod(b - 1, lit(QsGrid.toLong))
    val base = call_function("shiftleft", lit(1L), band.cast("int"))
    val step = when(band >= 4L,
        call_function("shiftleft", off + 1L, (band - 4L).cast("int")))
      .otherwise(idiv((off + 1) * base, lit(QsGrid.toLong)))
    when(b === 0L, lit(1L))
      .otherwise(when(off === (QsGrid - 1).toLong,
          when(band === 62L, lit(Long.MaxValue)).otherwise(base * 2))
        .otherwise(base + step))
  }

  /** Exact interpolated offset floor(num·width / cnt) via
    * Decimal(38,0) + integral `div` (ADVICE r12): num < cnt ≤ 2^63
    * and width < 2^63 keep the exact decimal product < 2^126 ≪
    * 10^38, so the former Long·Long overflow (≥ 2^63 inside the
    * documented domain) is gone for EVERY input; `div` truncates the
    * exact product toward zero (non-negative ⇒ floor), bit-equal to
    * the oracle twin's HUGEINT `//`. Runs only on the ≤ |percents|
    * read-out rows — never a hot path. */
  private def qsInterp(num: Column, width: Column, cnt: Column): Column =
    call_function("div",
      num.cast("decimal(38,0)") * width.cast("decimal(38,0)"),
      cnt.cast("decimal(38,0)"))

  /** The sketch STATE of a value column: (bucket, cnt), ≤ QsMaxBuckets
    * rows regardless of input size (map-side combined). Merge law:
    * the sketch of a union is the bucket-wise counter SUM of the
    * parts' sketches (spec-pinned) — persist per shard, roll up with
    * one tiny groupBy. */
  def quantileSketch(df: DataFrame, v: Column): DataFrame =
    df.select(qsBucket(v).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Merge sketch states (bucket-wise counter add). */
  def quantileMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Interpolated percentile read-out from a sketch state: one row
    * (p, est) per requested integer percent. Rank target is the
    * ceiling (n·p + 99) div 100 (p=50 of n=4 → rank 2); the estimate
    * interpolates integer-linearly inside the covering bucket:
    * lo + ((target − cum_before − 1)·(hi − lo)) div cnt. Everything
    * runs on the ≤ QsMaxBuckets-row state — the cumulative window and
    * the percent join cost nothing, and the bound rides a plan-visible
    * limit (the broadcast-audit discipline). */
  def quantileEstimate(sketch: DataFrame, percents: Seq[Int]): DataFrame = {
    requirePercents(percents)
    import org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    import spark.implicits._
    val bounded = sketch.limit(QsMaxBuckets)
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = bounded.agg(sum(col("cnt")).as("n")).limit(1)
    val tgt = percents.toDF("p").crossJoin(broadcast(n))
      .select(col("p"), idiv(col("n") * col("p") + 99, lit(100L)).as("target"))
    val w = Window.partitionBy(col("p")).orderBy(col("bucket"))
    tgt.join(broadcast(bounded), col("cum") >= col("target"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("p"),
        (qsLo(col("bucket")) + qsInterp(
          col("target") - (col("cum") - col("cnt")) - 1,
          qsHi(col("bucket")) - qsLo(col("bucket")),
          col("cnt"))).as("est"))
  }

  /** Sketch + read-out in one call (the query shape). */
  def quantileSketchEstimate(df: DataFrame, v: Column,
      percents: Seq[Int]): DataFrame =
    quantileEstimate(quantileSketch(df, v), percents)

  /** Per-group quantile sketch read-out: (grp, p, est) — the same
    * bounded machinery with the group key riding every stage; state
    * is ≤ QsMaxBuckets per group and the single exchange is the
    * sketch groupBy (map-side combined, |groups|·buckets rows). */
  def quantilePerGroup(df: DataFrame, groupCol: String, v: Column,
      percents: Seq[Int]): DataFrame = {
    requirePercents(percents)
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val sk = df.select(col(groupCol).as("grp"), qsBucket(v).as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = sk.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val tgt = n.crossJoin(broadcast(percents.toDF("p")))
      .select(col("grp"), col("p"),
        idiv(col("n") * col("p") + 99, lit(100L)).as("target"))
    val w = Window.partitionBy(col("grp"), col("p")).orderBy(col("bucket"))
    tgt.join(sk, Seq("grp")).filter(col("cum") >= col("target"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("grp"), col("p"),
        (qsLo(col("bucket")) + qsInterp(
          col("target") - (col("cum") - col("cnt")) - 1,
          qsHi(col("bucket")) - qsLo(col("bucket")),
          col("cnt"))).as("est"))
  }

  /** Percent domain guard: p ≤ 0 would interpolate below the covering
    * bucket's lower bound (target rank 0 makes the offset −1 ⇒ an
    * impossible negative estimate on non-negative data) and p > 100
    * would silently return no row — reject both up front, in the
    * builders too so a bad oracle string can't even be formed. */
  private def requirePercents(percents: Seq[Int]): Unit =
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be within [1, 100], got $percents")

  /** Shared lo/hi SQL fragments over a `bucket` column — shift-first
    * like the Column twins so band-60+ bounds don't overflow (DuckDB
    * checks BIGINT multiplies and would error loudly). */
  private def sqlQsLo(b: String): String = {
    val band = s"(($b - 1) // $QsGrid)"
    val off = s"(($b - 1) % $QsGrid)"
    s"""(CASE WHEN $b = 0 THEN 0
         WHEN $band >= 4 THEN (1::BIGINT << $band) + ($off << ($band - 4))
         ELSE (1::BIGINT << $band) + ($off * (1::BIGINT << $band)) // $QsGrid
       END)"""
  }
  private def sqlQsHi(b: String): String = {
    val band = s"(($b - 1) // $QsGrid)"
    val off = s"(($b - 1) % $QsGrid)"
    s"""(CASE WHEN $b = 0 THEN 1
         WHEN $off = ${QsGrid - 1} AND $band = 62 THEN 9223372036854775807
         WHEN $off = ${QsGrid - 1} THEN (1::BIGINT << $band) * 2
         WHEN $band >= 4 THEN (1::BIGINT << $band)
           + (($off + 1) << ($band - 4))
         ELSE (1::BIGINT << $band)
           + (($off + 1) * (1::BIGINT << $band)) // $QsGrid
       END)"""
  }

  /** Oracle twin of [[quantileSketchEstimate]] over a caller-supplied
    * `vals(v)` CTE: ends in (p, est). */
  def sqlQuantileSketchEstimate(valsCte: String, percents: Seq[Int]): String = {
    requirePercents(percents)
    s"""WITH vals AS ($valsCte),
       sk AS MATERIALIZED (SELECT ${sqlQsBucket("v")} AS bucket,
           COUNT(1) AS cnt FROM vals GROUP BY 1),
       cum AS (SELECT bucket, cnt,
           SUM(cnt) OVER (ORDER BY bucket
             ROWS UNBOUNDED PRECEDING) AS cum FROM sk),
       nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM sk),
       tgt AS (SELECT p, (n * p + 99) // 100 AS target
           FROM (SELECT unnest([${percents.mkString(",")}]) AS p)
           CROSS JOIN nn),
       pick AS (SELECT p, target, bucket, cnt, cum,
           row_number() OVER (PARTITION BY p ORDER BY bucket) AS rn
         FROM tgt JOIN cum ON cum >= target)
       SELECT CAST(p AS INT) AS p,
         CAST(${sqlQsLo("bucket")}
           + (CAST(target - (cum - cnt) - 1 AS HUGEINT)
              * (${sqlQsHi("bucket")} - ${sqlQsLo("bucket")})) // cnt
           AS BIGINT) AS est
       FROM pick WHERE rn = 1"""
  }

  /** Oracle twin of [[quantilePerGroup]] over a `vals(grp, v)` CTE:
    * ends in (grp, p, est). */
  def sqlQuantilePerGroup(valsCte: String, percents: Seq[Int]): String = {
    requirePercents(percents)
    s"""WITH vals AS ($valsCte),
       sk AS MATERIALIZED (SELECT grp, ${sqlQsBucket("v")} AS bucket,
           COUNT(1) AS cnt FROM vals GROUP BY 1, 2),
       cum AS (SELECT grp, bucket, cnt,
           SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket
             ROWS UNBOUNDED PRECEDING) AS cum FROM sk),
       nn AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM sk GROUP BY 1),
       tgt AS (SELECT grp, p, (n * p + 99) // 100 AS target
           FROM nn CROSS JOIN (SELECT unnest([${percents.mkString(",")}]) AS p)),
       pick AS (SELECT grp, p, target, bucket, cnt, cum,
           row_number() OVER (PARTITION BY grp, p ORDER BY bucket) AS rn
         FROM tgt JOIN cum USING (grp) WHERE cum >= target)
       SELECT grp, CAST(p AS INT) AS p,
         CAST(${sqlQsLo("bucket")}
           + (CAST(target - (cum - cnt) - 1 AS HUGEINT)
              * (${sqlQsHi("bucket")} - ${sqlQsLo("bucket")})) // cnt
           AS BIGINT) AS est
       FROM pick WHERE rn = 1"""
  }
}
