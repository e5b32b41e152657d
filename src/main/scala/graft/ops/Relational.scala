package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Batch relational operator corpus over the TPC-H-ish driver tables.
  *
  * Each query maps 1:1 to an operator row of SURVEY.md §2 (scan, filter,
  * project/map, flatMap, distinct, union-all, joins incl. broadcast /
  * semi / anti, cross, aggregation with combiners, secondary sort,
  * first-n, top-k per group, repartition). The reference
  * ([U] stratosphere-examples/.../relational/TPCHQuery3.java and the
  * javaApiOperators ITCases, per SURVEY.md §2/§5) expresses these as
  * hand-written PACT UDF dataflows; here each is a declarative Spark plan
  * so Catalyst gets pushdown / pruning / join-selection for free.
  *
  * Scale posture (100 TB): all plans are shuffle-minimal — dimension
  * joins are broadcast, aggregates are partial-before-shuffle (Catalyst
  * HashAggregate), scans carry pushed filters + pruned columns. Nothing
  * collects to the driver except bounded top-k results.
  */
object Relational {

  // ---- flagship: TPCH Q3 (shipping priority) -------------------------
  /** Reference flagship relational example: filter customers by segment,
    * orders by date, join lineitem, aggregate revenue, top-10.
    * [U] stratosphere-examples/.../record/relational/TPCHQuery3.java
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1997-06-01"
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit(cutoff)))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  // ---- TPCH Q1: wide aggregation with partial-agg combiner -----------
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        exactAvg(col("l_quantity"), 2).as("avg_qty"),
        exactAvg(col("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("count_order"))

  // ---- TPCH Q5-ish: multi-join with dimension chain ------------------
  /** Only the truly-constant dims (nation: 25 rows, region: 5 rows)
    * carry broadcast hints. customer and supplier are ×SF-scaled — at
    * the 100 TB posture neither is broadcastable, so their join
    * strategy is left to AQE, which still broadcasts them at gate SF
    * from runtime stats (PlanAuditSpec pins this) and switches to a
    * shuffle join at scale instead of OOMing the executors. */
  def q5LocalVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1999-01-01")))
    val li = t(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---- TPCH Q6: global aggregate (AllReduce) -------------------------
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(exactSum(col("l_extendedprice") * col("l_discount"), 4)
        .as("revenue"))

  // ---- TPCH Q9-ish: product-type profit (5-way join) -----------------
  /** [U] stratosphere-tests/.../recordJobTests/TPCHQuery9ITCase.java —
    * profit per (supplier nation, order year) over keyword-matched
    * parts. Adapted to the driver schema (no partsupp table): supply
    * cost is modeled as 10% of p_retailprice per unit. Exercises the
    * deepest join chain in the corpus: lineitem⨝part⨝supplier⨝nation
    * ⨝orders with a pushed keyword filter. Only nation (25 rows) is
    * hint-broadcast; part and supplier scale with SF, so AQE picks
    * their strategy (broadcast at gate SF, shuffle at 100 TB). */
  def q9ProductTypeProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val supp = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nation = t(spark, dir, "nation").select("n_nationkey", "n_name")
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    t(spark, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity") * lit(0.1), 4).as("profit"))
  }

  // ---- WebLogAnalysis shape: filter ⨝ filter ▷ antijoin --------------
  /** [U] stratosphere-examples/.../relational/WebLogAnalysis.java as a
    * production query over the driver tables: keyword-filtered parts
    * (docs), their sales summaries passing an avg-quantity threshold
    * (ranks; avg is scale-free so selectivity survives SF changes),
    * minus parts shipped recently (visits antijoin). */
  def qWebLog(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_name")
    val ranks = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_items"),
        exactAvg(col("l_quantity"), 2).as("avg_qty"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
      .filter(col("avg_qty") >= 26.0)
    val visits = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("2001-06-01")))
      .select(col("l_partkey").as("v_partkey"))
    docs.join(ranks, col("p_partkey") === col("l_partkey"))
      .join(visits, col("p_partkey") === col("v_partkey"), "left_anti")
      .select("p_partkey", "p_name", "n_items", "avg_qty", "revenue")
  }

  // ---- intersect / except (§2.6: coGroup-expressible in the ref) -----
  /** Set intersection with SQL INTERSECT semantics (distinct rows). */
  def qIntersect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")))

  /** Set difference: parts never sold at quantity >= 49 (EXCEPT
    * semantics, distinct rows; keyed on p_partkey so the result stays
    * non-degenerate at every scale factor — brand-level saturates at
    * 25 values). */
  def qExcept(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(col("p_partkey"))
      .except(
        t(spark, dir, "lineitem").filter(col("l_quantity") >= 49)
          .select(col("l_partkey").as("p_partkey")))

  // ---- distinct aggregation (free superset per SURVEY §2.4) ----------
  /** count(DISTINCT ...) — absent in the reference (expressible only
    * as a two-stage reduceGroup there); one declared query pins the
    * Spark planning (partial distinct before the exchange). */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  // ---- rollup (grouping-sets family; free per SURVEY §2.4) -----------
  /** Hierarchical subtotals over (returnflag, linestatus): the
    * grouping-sets capability the reference lacked, exposed as a
    * declared query (one pass, Catalyst Expand — no re-aggregation). */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** Full cube over the same pair — all 4 grouping sets in one pass. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  // ---- TPCH Q7: nation-pair trade volume ------------------------------
  /** TPC-H Q7 shape — revenue shipped between two nations per year,
    * both directions. The supplier side joins through l_suppkey and
    * the customer side through orders onto one lineitem scan.
    *
    * Nation pruning is EXPLICIT (ADVICE r7 #4): both supp and cust are
    * inner-joined against the two-nation slice of `nation` BEFORE any
    * broadcast decision, so the build sides shrink to 2/25 of their
    * tables by construction rather than by relying on Catalyst pushing
    * the pair disjunction below the join. Neither the supplier nor the
    * customer chain carries a hint — both are ×SF-scaled even after
    * nation pruning, so at the 100 TB posture neither is broadcastable
    * (consistent with the q18 note); AQE picks the strategy from
    * runtime stats (broadcast at gate SF, shuffle at scale). Only the
    * 2-row nation slice itself is hint-broadcast. The residual pair
    * filter keeps only the two directed combinations. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_1"; val n2 = "NATION_4"
    val nat = t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
      .filter(col("n_name").isin(n1, n2))
    val supp = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(exactSum(col("vol"), 4).as("revenue"))
  }

  // ---- TPCH Q15: top supplier by period revenue ------------------------
  /** TPC-H Q15 shape — the supplier(s) whose revenue over one quarter
    * equals the maximum (ALL ties kept, per the canonical query). The
    * max arrives as a broadcast one-row aggregate over the (small)
    * per-supplier revenue frame; revenue is exact scaled cents so the
    * equality join cannot float-miss. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")).as("rev4"))
    val top = rev.agg(max(col("rev4")).as("max_rev4"))
    rev.crossJoin(broadcast(top))
      .filter(col("rev4") === col("max_rev4"))
      .join(t(spark, dir, "supplier").select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev4") / lit(10000.0)).as("total_revenue"))
  }

  // ---- TPCH Q13: customer order-count distribution ---------------------
  /** TPC-H Q13 shape — the distribution of customers by order count,
    * including zero-order customers via the LEFT OUTER join (count of
    * a nullable column skips nulls, so an unmatched customer lands in
    * the 0 bucket). Two combiner-friendly aggregations over one keyed
    * join; output is histogram-sized. */
  def q13CustomerOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select("c_custkey")
    val ord = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  // ---- TPCH Q8: national market share ----------------------------------
  /** TPC-H Q8 shape — NATION_2 suppliers' share (integer ppm) of all
    * revenue flowing to AFRICA-region customers, per order year. Only
    * the 25-row nation frames are hint-broadcast; the customer and
    * supplier chains are ×SF-scaled (region-pruning still leaves SF/5
    * of customers), so their join strategy is AQE's call — broadcast
    * at gate SF, shuffle at 100 TB. The ppm ratio multiplies through
    * DECIMAL (the Q14 overflow discipline). */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = t(spark, dir, "nation")
    val custReg = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(nat.filter(col("n_regionkey") === 0)),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long").as("rev4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custReg, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_2", col("rev4")).otherwise(0L))
          .as("nation_rev4"),
        sum(col("rev4")).as("total_rev4"))
      .select(col("o_year"),
        expr("(CAST(nation_rev4 AS DECIMAL(28,0)) * 1000000) div total_rev4")
          .as("share_ppm"),
        (col("total_rev4") / lit(10000.0)).as("total_rev"))
  }

  // ---- TPCH Q17: small-quantity-order revenue --------------------------
  /** TPC-H Q17 shape — revenue from lineitems whose quantity is below
    * 20% of their part's average quantity (for one brand's parts).
    * The correlated per-part average becomes a per-part aggregate
    * joined back; the threshold compares CROSS-MULTIPLIED integers
    * (q·5·cnt < sum_qty ⟺ q < 0.2·avg, quantities are integral) so
    * no float boundary exists. avg_yearly divides the exact cents sum
    * by the same constants in both engines. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#3").select("p_partkey")
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(parts, col("l_partkey") === col("p_partkey"))
    val avgq = li.groupBy(col("l_partkey").as("ap"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(avgq, col("l_partkey") === col("ap"))
      .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
      .agg(sum(col("cents")).as("cents_sum"), count(lit(1)).as("n_items"))
      .select(col("n_items"), col("cents_sum"),
        (col("cents_sum") / lit(700.0)).as("avg_yearly"))
  }

  // ---- TPCH Q19: disjunctive predicate revenue -------------------------
  /** TPC-H Q19 shape — revenue from lineitems matching ANY of three
    * (brand, size-range, quantity-range) conjunct groups; the
    * canonical container/shipmode columns are absent from the reduced
    * schema, so brand+size+quantity carry the disjunction. What this
    * pins at scale: an OR-of-ANDs across a dim join still prunes —
    * the part-side conjuncts push into the part scan and the lineitem
    * quantity bounds into the lineitem scan (the min/max envelope of
    * the disjuncts), instead of evaluating post-join. part is
    * ×SF-scaled so it carries no broadcast hint; AQE broadcasts it at
    * gate SF and shuffles at 100 TB. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
    val part = t(spark, dir, "part").select("p_partkey", "p_brand", "p_size")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(exactSum(col("vol"), 4).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * (flag, status), (flag), (status) — but NOT the grand total, which
    * neither rollup nor cube can express alone — plus grouping_id to
    * disambiguate NULL-as-group-all from NULL data. One pass, expanded
    * by Catalyst's Expand the same way as cube. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.createOrReplaceTempView("graft_gs_lineitem")
    li.sparkSession.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           SUM(l_quantity) AS sum_qty, COUNT(1) AS n
         FROM graft_gs_lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), (l_linestatus))""")
  }

  /** Pivot: per-priority order counts and exact total cents spread
    * into one column pair per order status — values enumerated, so
    * the schema is static and the oracle is plain conditional
    * aggregation. A combiner-friendly single pass (pivot compiles to
    * one aggregate with CASE projections, no join). */
  def qPivotStatus(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      // an EMPTY pivot cell is NULL here but 0 via the oracle's
      // conditional COUNT — coalesce the count columns so the query
      // is robust to sparser fixtures, not dependent on every
      // (priority, status) cell being populated (cents sums stay
      // NULL-on-empty in both engines)
      .select(col("o_orderpriority") +: Seq("F", "O", "P").flatMap(s => Seq(
        coalesce(col(s"${s}_n"), lit(0L)).as(s"${s}_n"), col(s"${s}_cents"))): _*)

  /** Collection-input join ([U] CollectionInputFormat, SURVEY §2.1):
    * an in-memory priority→weight lookup built via
    * [[graft.api.GraftEnvironment.fromCollection]] joins (broadcast)
    * against the orders scan — the "inline dimension table" pattern;
    * the oracle embeds the same rows as VALUES. Weighted order counts
    * per year. */
  def qCollectionJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val env = new graft.api.GraftEnvironment(spark)
    val weights = env.fromCollection(Seq(
      ("1-URGENT", 5L), ("2-HIGH", 4L), ("3-MEDIUM", 3L),
      ("4-NOT SPECIFIED", 2L), ("5-LOW", 1L)))
      .ds.toDF("o_orderpriority", "weight")
    t(spark, dir, "orders")
      .select(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .join(broadcast(weights), Seq("o_orderpriority"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), sum(col("weight")).as("sum_weight"))
  }

  // ---- map / project (element-wise) ----------------------------------
  def qProjectMap(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        (col("o_totalprice") * lit(0.9)).as("net_price"),
        upper(col("o_orderpriority")).as("prio"),
        substring(col("o_orderstatus"), 1, 1).as("status"))

  // ---- filter --------------------------------------------------------
  def qFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_discount") === 0.0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  // ---- flatMap: WordCount (the reference's flagship example) ---------
  /** [U] stratosphere-examples/.../wordcount/WordCount.java — flatMap
    * tokenize + grouped count with combiner. */
  def qWordCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  // ---- distinct ------------------------------------------------------
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_linenumber")
      .distinct()

  // ---- union (UNION ALL, reference semantics) ------------------------
  def qUnionAll(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders").select(col("o_orderkey").as("k"))
    val b = t(spark, dir, "lineitem").select(col("l_orderkey").as("k"))
    a.union(b).groupBy(col("k")).agg(count(lit(1)).as("cnt"))
  }

  // ---- broadcast join (joinWithTiny) ---------------------------------
  /** joinWithTiny parity ([U] eu.stratosphere.api JoinHint
    * BROADCAST_HASH_SECOND): the broadcast-join OPERATOR is what's
    * under test here, so the hard hint is deliberate and stays.
    * CALLER ASSERTS TINY — like joinWithTiny itself, this hint is a
    * caller promise that the build side fits in executor memory; it
    * overrides AQE, so handing it an ×SF-scaled frame at 100 TB is an
    * OOM. For size-unknown dims, join without the hint (q5/q8/q9/q14/
    * q17/q19 pattern) and let AQE decide from runtime stats. */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  // ---- semi join -----------------------------------------------------
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .join(t(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_partkey")),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_brand", "p_type")

  // ---- anti join -----------------------------------------------------
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  // ---- cross (Cartesian) ---------------------------------------------
  def qCross(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region").select("r_name")
      .crossJoin(t(spark, dir, "nation").select("n_name"))

  // ---- secondary sort within group (sortGroup + reduceGroup) ---------
  /** Reference: SortedGrouping + GroupReduceFunction iterating a group in
    * secondary-sort order. Declarative Spark form: per-key ordered
    * aggregation (array_sort over collected structs — deterministic
    * because l_linenumber is unique within order). */
  def qSortGroupConcat(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("l_returnflag")))),
          x => x.getField("l_returnflag")),
        ",").as("flags"))

  // ---- top-k per group (window) --------------------------------------
  def qTopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
  }

  // ---- first(n): global sort + limit ---------------------------------
  def qFirstN(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(5)

  // ---- global aggregate (min/max/sum/count) --------------------------
  def qAggGlobal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      sum(col("l_quantity")).as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      count(lit(1)).as("n"))

  // ---- group-by + having ---------------------------------------------
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice"), 2).as("total_spent"))
      .filter(col("n_orders") >= 12)

  // ---- explicit repartition (partitionByHash) then aggregate ---------
  /** Reference partitionByHash ([U] .../operators/PartitionOperator.java):
    * semantically a no-op; demonstrates explicit hash redistribution. */
  def qPartitionByHash(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))

  // ---- outer join (reference expresses these via coGroup) ------------
  /** Full outer join: parts vs per-part sales summaries — rows survive
    * from both unmatched sides (null-padded), the coGroup-expressible
    * semantics the reference-era API lacked natively. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val sales = t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 45)
      .groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("qty45"))
    t(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
      .join(sales, col("p_partkey") === col("l_partkey"), "full_outer")
      .select(col("p_partkey"), col("p_brand"), col("qty45"))
  }

  /** coGroup as a declared query: per-key pair of iterators over
    * orders and lineitem ([U] CoGroupOperator) — counts both sides,
    * including keys present in only one input. */
  def qCoGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = t(spark, dir, "orders").select(col("o_orderkey")).as[Long]
      .groupByKey(identity)
    val l = t(spark, dir, "lineitem").select(col("l_orderkey")).as[Long]
      .groupByKey(identity)
    o.cogroup(l) { (k, oi, li) =>
      Iterator((k, oi.size.toLong, li.size.toLong))
    }.toDF("orderkey", "n_orders", "n_items")
  }

  /** Sorted coGroup ([U] CoGroupOperator.sortSecondGroup): each order
    * paired with its lineitems, the item iterator arriving in
    * quantity-DESC order via the engine's sorted coGroup (secondary
    * sort folded into the cogroup's partition sort — no extra
    * shuffle). Output concatenates the SORT KEY itself, so equal
    * quantities yield identical text regardless of tie order and the
    * result is engine-independent. */
  def qCoGroupSorted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = new graft.api.GDataSet(t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority")).as[(Long, String)])
    val l = new graft.api.GDataSet(t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long")).as[(Long, Long)])
    o.coGroup(l).where(_._1).equalTo(_._1)
      .sortSecondGroup(col("l_quantity").desc)
      .apply { (k, oi, li) =>
        val qtys = li.map(_._2).mkString(",")
        oi.map(ord => (k, ord._2, qtys)).filter(_ => qtys.nonEmpty)
      }
      .ds.toDF("orderkey", "priority", "qtys_desc")
  }

  // ---- SQL entry: one ANSI string runs verbatim on BOTH engines ------
  /** TPCH Q10-ish (returned-item customer ranking) written once in
    * dialect-neutral SQL: Spark executes it via GraftSession (temp
    * views over the same tables), DuckDB runs the identical string as
    * the oracle. Demonstrates the engine's raw-SQL entry (Spark's own
    * parser — the reference has none, SURVEY.md §3.2). The broadcast
    * hint is a no-op comment to DuckDB; Spark uses it to keep the
    * fact side shuffle-free for the customer join. */
  // no BROADCAST hint: customer is xSF-scaled (VERDICT r8 #1) — AQE
  // broadcasts it at gate SF from runtime stats, shuffles at 100 TB
  val q10Sql: String =
    """SELECT c_custkey, c_name,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
       FROM customer, orders, lineitem
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.sql(spark, dir, q10Sql,
      tables = Seq("customer", "orders", "lineitem"))

  /** Salted (replicated-build) skew join: lineitem probes supplier on
    * the salted key; per-nation rollup must equal the plain join —
    * the salt spreads any hot suppkey over 16 reducers and is
    * invisible in the result (oracle = the unsalted join). */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame =
    graft.api.Salting.saltedJoin(
        t(spark, dir, "lineitem").select(col("l_suppkey"), col("l_quantity")),
        t(spark, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        keys = Seq("l_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))

  /** Skew-salted aggregation as a driver-checked query: the hot-key
    * two-phase salted sum must produce exactly the plain GROUP BY
    * result (scaled-long inner sums keep it order-independent, so the
    * oracle is the unsalted SQL aggregate). */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.api.Salting.saltedSum(
      t(spark, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * lit(100)).cast("long").as("cents"),
          lit(1L).as("one")),
      keys = Seq("l_returnflag"),
      sumExprs = Seq((col("cents"), "cents_sum"), (col("one"), "n_rows")))
      .select(col("l_returnflag"),
        (col("cents_sum") / lit(100.0)).as("sum_price"), col("n_rows"))

  // ---- TPCH Q4 (adapted): priority count of late-shipped orders -----
  /** TPC-H Q4 shape — one order counted per priority when at least one
    * of its lineitems is "late". The canonical predicate
    * (l_commitdate < l_receiptdate) uses columns the driver's reduced
    * lineitem lacks; l_shipdate > o_orderdate keeps the identical plan
    * shape: EXISTS → left-semi join carrying a non-equi conjunct, then
    * a combiner-friendly count. Semi-join output is at most one row
    * per order regardless of lineitem fan-out. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  // ---- TPCH Q14: promo revenue share per ship month ------------------
  /** TPC-H Q14 shape — promotional revenue share by ship month, as
    * integer ppm. Revenue quantizes to 1e-4 units (the repo's exactSum
    * discipline); the ppm ratio multiplies through DECIMAL so the
    * numerator can't overflow long at large SFs (monthly rev4 sums
    * pass 2^63/1e6 around TPC-H sf1), then integral-divides — both
    * operands non-negative, so Spark div == DuckDB floor-div. part is
    * ×SF-scaled, so it carries no broadcast hint — AQE broadcasts it
    * at gate SF and falls back to a shuffle join at 100 TB. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long").as("rev4"))
    val part = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_type").startsWith("PROMO").as("promo"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("ship_month"))
      .agg(sum(when(col("promo"), col("rev4")).otherwise(0L)).as("promo_rev4"),
        sum(col("rev4")).as("total_rev4"))
      .select(col("ship_month"),
        expr("(CAST(promo_rev4 AS DECIMAL(28,0)) * 1000000) div total_rev4")
          .as("promo_ppm"),
        (col("total_rev4") / lit(10000.0)).as("total_rev"))
  }

  // ---- TPCH Q18: large-quantity orders --------------------------------
  /** TPC-H Q18 shape — orders whose total quantity exceeds 300, with
    * customer attribution. The per-order sum is combiner-friendly and
    * the HAVING filter bounds everything downstream; the customer join
    * is a keyed shuffle by design (at 100 TB customer is fact-sized,
    * not broadcastable). l_quantity is integral in this corpus, so the
    * quantity sum is a plain long. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300)
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_name")
    qty.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  // ---- TPCH Q22: idle high-balance customers --------------------------
  /** TPC-H Q22 shape — customers with above-(positive-)average balance
    * and no RECENT orders (none since 1998-01-01; this corpus has no
    * never-ordered customers, so the canonical no-orders-ever form is
    * vacuous at the gate SF), per nation. The corpus-wide average
    * arrives as a broadcast ONE-ROW aggregate (no driver action) and
    * the threshold compares cross-multiplied exact cents — no float
    * boundary; the no-recent-orders predicate is the anti join, with
    * the date filter pushed below it into the orders scan. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val avgPos = cust.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("bal_cents")) / lit(100.0)).as("total_acctbal"))
  }

  // ---- registry ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q5_local_volume" -> (q5LocalVolume _),
    "q6_forecast" -> (q6Forecast _),
    "q_project_map" -> (qProjectMap _),
    "q_filter" -> (qFilter _),
    "q_wordcount" -> (qWordCount _),
    "q_distinct" -> (qDistinct _),
    "q_union_all" -> (qUnionAll _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_cross" -> (qCross _),
    "q_sortgroup_concat" -> (qSortGroupConcat _),
    "q_topk_per_group" -> (qTopKPerGroup _),
    "q_first_n" -> (qFirstN _),
    "q_agg_global" -> (qAggGlobal _),
    "q_having" -> (qHaving _),
    "q_partition_by_hash" -> (qPartitionByHash _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_outer_join" -> (qOuterJoin _),
    "q_cogroup" -> (qCoGroup _),
    "q_cogroup_sorted" -> (qCoGroupSorted _),
    "q9_product_profit" -> (q9ProductTypeProfit _),
    "q_weblog" -> (qWebLog _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_count_distinct" -> (qCountDistinct _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_collection_join" -> (qCollectionJoin _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q19_disjunctive" -> (q19DisjunctiveRevenue _),
    "q13_customer_orders" -> (q13CustomerOrders _),
    "q8_market_share" -> (q8MarketShare _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q_pivot_status" -> (qPivotStatus _),
    "q14_promo_share" -> (q14PromoShare _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q22_idle_customers" -> (q22IdleCustomers _),
  )

  private val rev = sqlExactSum("l_extendedprice * (1 - l_discount)", 4)

  val oracleSql: Map[String, String] = Map(
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $rev AS revenue
         FROM lineitem, orders, customer
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1997-06-01'
           AND l_shipdate > TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           ${sqlExactSum("l_extendedprice", 2)} AS sum_base_price,
           $rev AS sum_disc_price,
           ${sqlExactSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           ${sqlExactAvg("l_quantity", 2)} AS avg_qty,
           ${sqlExactAvg("l_extendedprice", 2)} AS avg_price,
           COUNT(1) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q5_local_volume" ->
      s"""SELECT n_name, $rev AS revenue
         FROM lineitem, orders, customer, supplier, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q6_forecast" ->
      s"""SELECT ${sqlExactSum("l_extendedprice * l_discount", 4)} AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q_project_map" ->
      """SELECT o_orderkey, year(o_orderdate) AS o_year,
           o_totalprice * 0.9 AS net_price,
           upper(o_orderpriority) AS prio,
           substring(o_orderstatus, 1, 1) AS status
         FROM orders""",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_discount = 0.0""",
    "q_wordcount" ->
      """SELECT word, COUNT(1) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word""",
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
    "q_union_all" ->
      """SELECT k, COUNT(1) AS cnt FROM (
           SELECT o_orderkey AS k FROM orders
           UNION ALL SELECT l_orderkey AS k FROM lineitem)
         GROUP BY k""",
    "q_join_broadcast" ->
      """SELECT p_brand, SUM(l_quantity) AS sum_qty, COUNT(1) AS cnt
         FROM lineitem, part WHERE l_partkey = p_partkey
         GROUP BY p_brand""",
    "q_semi_join" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE p_partkey IN (
           SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "q_cross" -> "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q_sortgroup_concat" ->
      """SELECT l_orderkey,
           string_agg(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag) AS flags
         FROM lineitem GROUP BY l_orderkey""",
    "q_topk_per_group" ->
      """SELECT * FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
               AS INT) AS rk
           FROM lineitem) WHERE rk <= 3""",
    "q_first_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""",
    "q_agg_global" ->
      """SELECT SUM(l_quantity) AS sum_qty, MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price, COUNT(1) AS n
         FROM lineitem""",
    "q_having" ->
      s"""SELECT o_custkey, COUNT(1) AS n_orders,
           ${sqlExactSum("o_totalprice", 2)} AS total_spent
         FROM orders GROUP BY o_custkey HAVING COUNT(1) >= 12""",
    "q_partition_by_hash" ->
      """SELECT l_suppkey, SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY l_suppkey""",
    "q10_returned_items" -> q10Sql,
    "q_salted_agg" ->
      """SELECT l_returnflag,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price,
           COUNT(1) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    // oracle = the UNSALTED join: the salt must be invisible
    "q_salted_join" ->
      """SELECT s_nationkey, SUM(l_quantity) AS sum_qty, COUNT(1) AS n_items
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey""",
    "q_outer_join" ->
      """SELECT p_partkey, p_brand, qty45
         FROM part FULL OUTER JOIN (
           SELECT l_partkey, SUM(l_quantity) AS qty45
           FROM lineitem WHERE l_quantity >= 45 GROUP BY l_partkey) s
         ON p_partkey = s.l_partkey""",
    "q_cogroup" ->
      """SELECT COALESCE(o.k, l.k) AS orderkey,
           COALESCE(o.n, 0) AS n_orders, COALESCE(l.n, 0) AS n_items
         FROM (SELECT o_orderkey AS k, COUNT(1) AS n FROM orders GROUP BY 1) o
         FULL OUTER JOIN (SELECT l_orderkey AS k, COUNT(1) AS n FROM lineitem GROUP BY 1) l
         ON o.k = l.k""",
    // quantity values are integral in the corpus, so BIGINT cast
    // (Spark truncates, DuckDB rounds) cannot diverge; concatenating
    // the sort key itself makes tie order invisible in the output
    "q_cogroup_sorted" ->
      """SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
           string_agg(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), ','
             ORDER BY CAST(l_quantity AS BIGINT) DESC) AS qtys_desc
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1, 2""",
    "q9_product_profit" ->
      s"""SELECT n_name, year(o_orderdate) AS o_year,
           ${sqlExactSum(
             "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1", 4)} AS profit
         FROM lineitem, part, supplier, nation, orders
         WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
           AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
           AND p_name LIKE '%red%'
         GROUP BY n_name, o_year""",
    "q_weblog" ->
      s"""WITH ranks AS (
           SELECT l_partkey, COUNT(1) AS n_items,
             ${sqlExactAvg("l_quantity", 2)} AS avg_qty,
             ${sqlExactSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
           FROM lineitem GROUP BY l_partkey
           HAVING ${sqlExactAvg("l_quantity", 2)} >= 26.0)
         SELECT p_partkey, p_name, n_items, avg_qty, revenue
         FROM part JOIN ranks ON p_partkey = l_partkey
         WHERE p_name LIKE '%red%'
           AND p_partkey NOT IN (
             SELECT l_partkey FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '2001-06-01')""",
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey AS nationkey FROM supplier""",
    "q_except" ->
      """SELECT p_partkey FROM part
         EXCEPT
         SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 49""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty, COUNT(1) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty, COUNT(1) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_count_distinct" ->
      """SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(1) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q7_nation_volume" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           ${sqlExactSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
         WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_4')
            OR (sn.n_name = 'NATION_4' AND cn.n_name = 'NATION_1')
         GROUP BY 1, 2, 3""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
               AS BIGINT)) AS BIGINT) AS rev4
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, rev4 / 10000.0 AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE rev4 = (SELECT MAX(rev4) FROM rev)""",
    "q13_customer_orders" ->
      """SELECT n_orders, COUNT(1) AS n_customers FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS n_orders
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY n_orders""",
    "q8_market_share" ->
      """WITH rows_ AS (
           SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             sn.n_name AS supp_nation,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev4
           FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation cn ON c_nationkey = cn.n_nationkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation sn ON s_nationkey = sn.n_nationkey
           WHERE cn.n_regionkey = 0),
         a AS (
           SELECT o_year,
             CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev4 ELSE 0 END)
               AS BIGINT) AS nation_rev4,
             CAST(SUM(rev4) AS BIGINT) AS total_rev4
           FROM rows_ GROUP BY 1)
         SELECT o_year,
           CAST((CAST(nation_rev4 AS HUGEINT) * 1000000) // total_rev4 AS BIGINT)
             AS share_ppm,
           total_rev4 / 10000.0 AS total_rev
         FROM a""",
    "q17_small_quantity" ->
      """WITH li AS (
           SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#3'),
         a AS (SELECT l_partkey AS ap, CAST(SUM(qty) AS BIGINT) AS sum_qty,
                 COUNT(1) AS cnt
               FROM li GROUP BY 1)
         SELECT COUNT(1) AS n_items,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(SUM(cents) AS BIGINT) / 700.0 AS avg_yearly
         FROM li JOIN a ON l_partkey = ap
         WHERE qty * 5 * cnt < sum_qty""",
    "q19_disjunctive" ->
      s"""SELECT ${sqlExactSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
           COUNT(1) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30)""",
    "q_collection_join" ->
      """WITH w(o_orderpriority, weight) AS (VALUES
           ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
           ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
         SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           COUNT(1) AS n_orders,
           CAST(SUM(weight) AS BIGINT) AS sum_weight
         FROM orders JOIN w USING (o_orderpriority)
         GROUP BY 1""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           SUM(l_quantity) AS sum_qty, COUNT(1) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), (l_linestatus))""",
    // every (priority, status) cell is populated in this corpus, so
    // conditional COUNT(0)-vs-pivot-NULL divergence cannot arise
    "q_pivot_status" ->
      """SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
             THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS F_cents,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
             THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS O_cents,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
             THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS P_cents
         FROM orders GROUP BY o_orderpriority""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(1) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority""",
    "q14_promo_share" ->
      """WITH j AS (
           SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev4,
             (p_type LIKE 'PROMO%') AS promo
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         a AS (
           SELECT ship_month,
             CAST(SUM(CASE WHEN promo THEN rev4 ELSE 0 END) AS BIGINT) AS promo_rev4,
             CAST(SUM(rev4) AS BIGINT) AS total_rev4
           FROM j GROUP BY 1)
         SELECT ship_month,
           CAST((CAST(promo_rev4 AS HUGEINT) * 1000000) // total_rev4 AS BIGINT)
             AS promo_ppm,
           total_rev4 / 10000.0 AS total_rev
         FROM a""",
    "q18_large_orders" ->
      """WITH qty AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
           FROM lineitem GROUP BY 1
           HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           total_qty
         FROM qty JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey""",
    "q22_idle_customers" ->
      """WITH c AS (
           SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
           FROM customer),
         a AS (
           SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
             COUNT(1) AS n_pos
           FROM c WHERE bal_cents > 0)
         SELECT c_nationkey, COUNT(1) AS n_customers,
           CAST(SUM(bal_cents) AS BIGINT) / 100.0 AS total_acctbal
         FROM c, a
         WHERE bal_cents * n_pos > sum_cents
           AND NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '1998-01-01')
         GROUP BY c_nationkey""",
  )
}
