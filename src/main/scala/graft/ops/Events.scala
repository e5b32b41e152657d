package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.streaming.StreamOps

/** Batch query corpus over the `events` table, built on the SAME
  * dataflow functions the streaming surface uses (graft.streaming
  * .StreamOps) — the oracle-checked batch results pin the windowed /
  * sessionized semantics that run unbounded in production.
  *
  * Timestamp discipline: events.ts is nanosecond parquet; Spark reads
  * µs, DuckDB reads ns. All outputs are whole-second (or coarser)
  * buckets via floor, which both precisions agree on (SKILL.md gotcha).
  */
object Events {

  def qTumblingHourly(spark: SparkSession, dir: String): DataFrame =
    StreamOps.tumblingAgg(t(spark, dir, "events"), "1 hour")

  def qSlidingDaily(spark: SparkSession, dir: String): DataFrame =
    StreamOps.slidingAgg(t(spark, dir, "events"), "1 day", "6 hours")

  /** Per-user session stats (30-min gap): session count + sizes. */
  def qSessions(spark: SparkSession, dir: String): DataFrame =
    StreamOps.sessionAgg(t(spark, dir, "events"), "30 minutes")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))

  /** Dedup analogue (distinct keys — deterministic in batch). */
  def qDedupKeys(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select("user_id", "event_type").distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))

  /** JSON property extraction over the props column. */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))

  /** Event-time interval join, batch twin of StreamOps.intervalJoin
    * (same function, watermarks are no-ops in batch): per purchase,
    * the same user's clicks in the preceding hour. The interval
    * condition compares WHOLE-SECOND epochs (cast to long) — the
    * ns-vs-µs-safe form of an event-time bound (file header note). */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    // two independent reads: a single shared scan makes the ts columns
    // carry identical attribute ids and Spark rejects the self-join
    // condition as ambiguous
    val p = t(spark, dir, "events").filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"), col("ts"))
    val c = t(spark, dir, "events").filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts"))
    val cond = p("p_user") === c("c_user") &&
      c("ts").cast("long") >= p("ts").cast("long") - 3600 &&
      c("ts").cast("long") < p("ts").cast("long")
    StreamOps.intervalJoin(p, c, "1 hour", "1 hour", cond)
      .groupBy(p("pid").as("pid"))
      .agg(count(lit(1)).as("n_prior_clicks"))
  }

  /** As-of join: per purchase, the same user's latest click at or
    * before the purchase (point-in-time lookup) via the union+window
    * AsOf operator — one shuffle, no range probe. Comparisons and
    * output are WHOLE-SECOND epochs (ns/µs-safe, header note); the
    * payload is the as-of timestamp itself, so equal-second click
    * ties yield identical output in both engines. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events").filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").cast("long").as("pts_s"))
    val c = t(spark, dir, "events").filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").cast("long").as("cts_s"))
    graft.api.AsOf.join(p, c, Seq("user_id"),
        leftTs = "pts_s", rightTs = "cts_s", payload = Seq("cts_s"))
      .select(col("pid"), col("asof_cts_s").as("last_click_s"))
  }

  /** First-touch / last-touch attribution per user: the arg-extremum
    * aggregation (min_by/max_by over a struct order key) — ONE
    * partial-then-final aggregation, no per-user sort and no window,
    * which is the 100-TB point: attribution over a trillion events is
    * a plain combiner groupBy. Order key = (whole-second ts, event_id)
    * — unique, so ties can't exist and the ns-vs-µs precision split
    * is invisible; the oracle computes the same semantics with rank
    * windows (DuckDB's arg_min takes only scalar order keys). */
  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), struct(col("sec"), col("event_id"))).as("first_touch"),
        max_by(col("event_type"), struct(col("sec"), col("event_id"))).as("last_touch"),
        count(lit(1)).as("n_events"),
        (sum(col("cents")) / lit(100.0)).as("sum_value"))

  /** Rolling + running totals per user (ROWS frames): 3-event moving
    * sum and running sum over the (second, event_id) order, folded
    * into per-user checksums — sum-of-prefix-sums pins every
    * intermediate frame value, so a single mis-framed row
    * hash-mismatches. One keyed shuffle + one partition sort serves
    * BOTH frames (same window spec), then the combiner groupBy. */
  def qRollingStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("sec"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("user_id"),
        sum(col("cents")).over(w.rowsBetween(-2, 0)).as("roll3"),
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("run"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("roll3")).as("sum_roll3"),
        sum(col("run")).as("sum_running"))
  }

  /** Funnel conversion: per user, did the first click precede the
    * first purchase? ONE combiner aggregation computes both
    * first-touch epochs (conditional min — no join, no window, no
    * sort), then a single-row rollup counts the funnel stages. The
    * whole funnel is two partial-then-final aggregations at any
    * scale. Whole-second epochs (header note); ties (same second)
    * count as converted — both engines apply `<=` identically. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("sec"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click", col("sec"))).as("c0"),
        min(when(col("event_type") === "purchase", col("sec"))).as("p0"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("c0").isNotNull, 1L).otherwise(0L)).as("n_clickers"),
        sum(when(col("p0").isNotNull, 1L).otherwise(0L)).as("n_buyers"),
        sum(when(col("c0") <= col("p0"), 1L).otherwise(0L)).as("n_converted"))

  /** Trailing-hour totals per event (RANGE frame — value-based, the
    * complement of q_rolling_stats' ROWS frames): per user, the sum
    * of cents in the 3600 seconds up to and including each event.
    * RANGE includes ALL peer rows of the current second in both
    * engines, so equal-second events can't order-diverge; per-user
    * sum-of-window-sums folds every frame into the oracle hash. */
  def qTrailingHour(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-3600L, 0L)
    t(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("user_id"), sum(col("cents")).over(w).as("hr"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("hr")).as("sum_hr"))
  }

  /** Cohort retention: users bucketed by first-active day; for each
    * (cohort_day, day_offset) the number of cohort users active that
    * day — the D1/D7/D30 retention matrix. Day index = whole-second
    * epoch div 86400 (ns-vs-µs safe; epochs are positive so
    * truncation == floor in both engines).
    *
    * 100 TB posture: three keyed shuffles, all narrow rows, ONE scan
    * of events — the (user, day) distinct, then the per-user first
    * day as a WINDOW MIN over the same user_id partitioning (the
    * agg+join-back formulation re-computed the uncached distinct for
    * both join sides and re-shuffled the activity side: 6 exchanges,
    * audit-measured), then the (cohort, offset) count. Since
    * (user, day) is distinct, count(1) per cell IS the distinct-user
    * count — no count_distinct state. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = t(spark, dir, "events")
      .select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("day"))
      .distinct()
    ud.withColumn("cohort_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user inter-arrival gap stats via lag(): gap = whole seconds
    * since the user's previous event, ordered by (sec, event_id) — a
    * FULL deterministic tie-break, equal-second events can't
    * order-diverge between engines (SKILL.md gotcha). The lag window
    * partitions on user_id (no global sort); output is one short row
    * per user. */
  def qEventGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        max(col("gap")).as("max_gap"),
        sum(col("gap")).as("sum_gap"))
  }

  /** ORDERED, TIME-WINDOWED 3-stage funnel (signup -> click ->
    * purchase, each advance within 1800s of the previous stage's
    * entry, and a fresh signup RESTARTS the window at any incomplete
    * stage): the sequenced, windowed form q_funnel's conditional-min
    * pair cannot express — a click before the signup, or an hour
    * after it, must not count. Per user, events fold through a stage
    * machine in (sec, event_id) order.
    *
    * Engine-portable fold: DuckDB's 2-arg list_reduce folds only
    * homogeneous BIGINT lists, so each event encodes to
    * `sec<<24 | (rn % 2^21)<<3 | typecode` (rn = per-user GLOBAL
    * rank, so integer sort order == event order; the 2^21 wrap is
    * safe only while a user's TOTAL event count stays under 2^21 — a
    * wrap boundary falling inside a same-second group would invert
    * that group's fold order. OracleAssumptionsSpec enforces the
    * fixture bound; relaxing it needs a wider rank field) and the
    * machine state to
    * `stage<<44 | entry_sec`. All operands provably non-negative
    * (Tables.scala division discipline). ONE keyed shuffle: the
    * window rank and the history aggregation share the user_id
    * partitioning; per-user arrays are the standard funnel-analysis
    * memory shape (sessionize first if single users can exceed
    * executor memory); the fold is a codegen'd HOF and the stage
    * histogram a 4-row rollup. */
  /** Per-user funnel stage over a (user_id, event_id, event_type,
    * sec) frame — the testable core of [[qFunnelOrdered]]. */
  def funnelStages(events: DataFrame, bound: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val D = 1L << 44
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val code = when(col("event_type") === "signup", 1L)
      .when(col("event_type") === "click", 2L)
      .when(col("event_type") === "purchase", 3L).otherwise(0L)
    val fold = aggregate(
      sort_array(collect_list(col("enc"))), lit(0L),
      (acc, x) => {
        val stage = shiftright(acc, 44)
        val entry = pmod(acc, lit(D))
        val sec = shiftright(x, 24)
        val c = pmod(x, lit(8))
        when(stage < 3 && c === 1, lit(D) + sec)
          .when(stage === 1 && c === 2 && sec - entry <= bound, lit(2L * D) + sec)
          .when(stage === 2 && c === 3 && sec - entry <= bound, lit(3L * D) + sec)
          .otherwise(acc)
      })
    events
      .withColumn("enc", shiftleft(col("sec"), 24) +
        pmod(row_number().over(w).cast("long"), lit(1L << 21)) * lit(8L) + code)
      .groupBy(col("user_id"))
      .agg(shiftright(fold, 44).as("stage"))
  }

  def qFunnelOrdered(spark: SparkSession, dir: String): DataFrame =
    funnelStages(
      t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("sec")))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))

  /** Directly-follows transition matrix (the Markov/process-mining
    * view of the event stream, and the degenerate one-step CEP
    * pattern): per (prev_type, event_type) pair, how many adjacent
    * per-user transitions exist and how many happen within an hour —
    * the "A directly followed by B within T" pattern count. One lag()
    * window over (sec, event_id) — the same full-tie-break discipline
    * as q_event_gaps — then a tiny (types x types) aggregate; ONE
    * keyed shuffle + per-user sort at any scale, output bounded by
    * |event_type|². */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("gap") <= 3600L, 1L).otherwise(0L)).as("n_within_hour"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tumbling_hourly" -> (qTumblingHourly _),
    "q_sliding_daily" -> (qSlidingDaily _),
    "q_sessions" -> (qSessions _),
    "q_dedup_keys" -> (qDedupKeys _),
    "q_json_props" -> (qJsonProps _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_asof_join" -> (qAsofJoin _),
    "q_attribution" -> (qAttribution _),
    "q_rolling_stats" -> (qRollingStats _),
    "q_funnel" -> (qFunnel _),
    "q_trailing_hour" -> (qTrailingHour _),
    "q_retention" -> (qRetention _),
    "q_event_gaps" -> (qEventGaps _),
    "q_transitions" -> (qTransitions _),
    "q_funnel_ordered" -> (qFunnelOrdered _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_tumbling_hourly" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws,
           event_type, COUNT(1) AS n,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
         FROM events GROUP BY 1, 2""",
    "q_sliding_daily" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(ts)) AS BIGINT) % 21600
                 - k.k * 21600) AS ws,
           event_type, COUNT(1) AS n
         FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
         GROUP BY 1, 2""",
    "q_sessions" ->
      """WITH marked AS (
           SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               THEN 1 ELSE 0 END AS new_session
           FROM events),
         islands AS (
           SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
           FROM marked),
         sessions AS (
           SELECT user_id, session_id, COUNT(1) AS n_events
           FROM islands GROUP BY user_id, session_id)
         SELECT user_id, COUNT(1) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           MAX(n_events) AS max_session_events
         FROM sessions GROUP BY user_id""",
    "q_dedup_keys" ->
      """SELECT event_type, COUNT(1) AS n_users FROM (
           SELECT DISTINCT user_id, event_type FROM events)
         GROUP BY event_type""",
    "q_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           COUNT(1) AS n
         FROM events GROUP BY k""",
    "q_interval_join" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS pts
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS cts
           FROM events WHERE event_type = 'click')
         SELECT pid, COUNT(1) AS n_prior_clicks
         FROM p JOIN c ON p.user_id = c.user_id
           AND cts >= pts - 3600 AND cts < pts
         GROUP BY pid""",
    // DuckDB's native ASOF LEFT JOIN is the oracle for the engine's
    // union+window AsOf operator; ties on (user, second) are invisible
    // because the payload IS the as-of key
    "q_asof_join" ->
      """WITH p AS (SELECT event_id AS pid, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS pts_s
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS cts_s
           FROM events WHERE event_type = 'click')
         SELECT pid, c.cts_s AS last_click_s
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND p.pts_s >= c.cts_s""",
    // same semantics as the Spark min_by/max_by over (sec, event_id)
    // via rank windows; the order key is unique so both agree exactly
    "q_attribution" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         r AS (
           SELECT user_id, event_type, cents,
             row_number() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rf,
             row_number() OVER (PARTITION BY user_id ORDER BY sec DESC, event_id DESC) AS rl
           FROM e)
         SELECT user_id,
           MAX(CASE WHEN rf = 1 THEN event_type END) AS first_touch,
           MAX(CASE WHEN rl = 1 THEN event_type END) AS last_touch,
           COUNT(1) AS n_events,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS sum_value
         FROM r GROUP BY user_id""",
    "q_rolling_stats" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         w AS (
           SELECT user_id,
             SUM(cents) OVER (PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll3,
             SUM(cents) OVER (PARTITION BY user_id ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING) AS run
           FROM e)
         SELECT user_id, COUNT(1) AS n_events,
           CAST(SUM(roll3) AS BIGINT) AS sum_roll3,
           CAST(SUM(run) AS BIGINT) AS sum_running
         FROM w GROUP BY user_id""",
    "q_funnel" ->
      """WITH u AS (
           SELECT user_id,
             MIN(CASE WHEN event_type = 'click'
               THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS c0,
             MIN(CASE WHEN event_type = 'purchase'
               THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS p0
           FROM events GROUP BY user_id)
         SELECT COUNT(1) AS n_users,
           CAST(SUM(CASE WHEN c0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clickers,
           CAST(SUM(CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN c0 <= p0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
         FROM u""",
    "q_trailing_hour" ->
      """WITH e AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         w AS (
           SELECT user_id,
             SUM(cents) OVER (PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hr
           FROM e)
         SELECT user_id, COUNT(1) AS n_events,
           CAST(SUM(hr) AS BIGINT) AS sum_hr
         FROM w GROUP BY user_id""",
    "q_retention" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
           FROM events),
         f AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
         SELECT f.cohort_day, ud.day - f.cohort_day AS day_offset,
           COUNT(1) AS n_users
         FROM ud JOIN f USING (user_id)
         GROUP BY 1, 2""",
    "q_event_gaps" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT user_id,
             sec - lag(sec) OVER (PARTITION BY user_id
               ORDER BY sec, event_id) AS gap
           FROM e)
         SELECT user_id, COUNT(1) AS n_gaps,
           MAX(gap) AS max_gap, CAST(SUM(gap) AS BIGINT) AS sum_gap
         FROM g WHERE gap IS NOT NULL GROUP BY user_id""",
    "q_transitions" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT event_type,
             lag(event_type) OVER w AS prev_type,
             sec - lag(sec) OVER w AS gap
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
         SELECT prev_type, event_type, COUNT(1) AS n,
           CAST(SUM(CASE WHEN gap <= 3600 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_hour
         FROM g WHERE prev_type IS NOT NULL GROUP BY 1, 2""",
    // the oracle replays the SAME stage machine one event per
    // recursion step (depth = max events/user). It deliberately does
    // NOT use list_reduce over a grouped list(): DuckDB 1.0's
    // list_reduce returns WRONG results when the lambda runs over
    // grouped-aggregate lists (verified r8: identical fold over the
    // same list as a literal gives the correct answer, and its result
    // even varies across query shapes) — a portability trap for any
    // future fold-shaped oracle; per-ROW list_reduce (sqlFingerprint)
    // is unaffected and stays green across the suite
    "q_funnel_ordered" ->
      """WITH RECURSIVE e AS (
           SELECT user_id,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS rn,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
               WHEN 'purchase' THEN 3 ELSE 0 END AS c
           FROM events),
         n AS (SELECT user_id, MAX(rn) AS mx FROM e GROUP BY user_id),
         m AS (
           SELECT user_id, 0 AS rn, CAST(0 AS BIGINT) AS stage,
             CAST(0 AS BIGINT) AS entry
           FROM n
           UNION ALL
           SELECT m.user_id, e.rn,
             CASE WHEN m.stage < 3 AND e.c = 1 THEN 1
                  WHEN m.stage = 1 AND e.c = 2 AND e.sec - m.entry <= 1800 THEN 2
                  WHEN m.stage = 2 AND e.c = 3 AND e.sec - m.entry <= 1800 THEN 3
                  ELSE m.stage END,
             CASE WHEN (m.stage < 3 AND e.c = 1)
                    OR (m.stage = 1 AND e.c = 2 AND e.sec - m.entry <= 1800)
                    OR (m.stage = 2 AND e.c = 3 AND e.sec - m.entry <= 1800)
               THEN e.sec ELSE m.entry END
           FROM m JOIN e ON e.user_id = m.user_id AND e.rn = m.rn + 1)
         SELECT stage, COUNT(1) AS n_users
         FROM m JOIN n ON m.user_id = n.user_id AND m.rn = n.mx
         GROUP BY stage""",
  )
}
