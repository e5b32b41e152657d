package graft.ops

import graft.SparkSpec

/** Plan-shape audits — the analogue of the reference's compiler tests
  * ([U] stratosphere-compiler/src/test: assert chosen ship/local
  * strategies on the OptimizedPlan; SURVEY.md §5). Each assertion
  * pins a property that matters at 100 TB: filters reaching the
  * parquet scan, column pruning, broadcast vs shuffle join selection,
  * partial (map-side) aggregation, codegen coverage.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter pushed to parquet scan; columns pruned") {
    val p = executedPlan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_partkey"), "unused columns must not be read:\n" + p)
  }

  test("q1: aggregation is partial (map-side combine) then final") {
    val p = executedPlan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q3: dimension side broadcast, no shuffle of lineitem for the cust join") {
    val p = executedPlan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("q5: the full dimension chain broadcasts (no shuffle joins for dims)") {
    val p = executedPlan("q5_local_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
  }

  test("q6: global aggregate reads only the columns it needs") {
    val p = executedPlan("q6_forecast")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("semi/anti joins plan as semi/anti (no materialized distinct)") {
    assert(executedPlan("q_semi_join").contains("LeftSemi"))
    assert(executedPlan("q_anti_join").contains("LeftAnti"))
  }

  test("wordcount: whole-stage codegen spans the explode + aggregation") {
    val p = executedPlan("q_wordcount")
    assert(p.contains("*("), p)
  }

  test("knn: bounded query side broadcasts; corpus side never shuffles pre-rank") {
    val p = executedPlan("q_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding dedup: shuffle join on block key, NEVER a corpus broadcast") {
    // Both join sides are the full corpus: a BroadcastExchange here is
    // the one plan shape that cannot survive 100 TB (VERDICT r1 #2).
    val p = executedPlan("q_dedup_embedding")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastExchange"), "corpus must not broadcast:\n" + p)
    assert(p.contains("cosinesim"), p)
  }

  test("per-group top-k gets a WindowGroupLimit (no full per-group sort)") {
    val p = executedPlan("q_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q4: EXISTS plans as a semi join (one row per order, no fan-out)") {
    val p = executedPlan("q4_order_priority")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("Distinct"), "semi join must not materialize a distinct:\n" + p)
  }

  test("q14: part is the broadcast side; lineitem never broadcasts") {
    val p = executedPlan("q14_promo_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "ppm agg must combine map-side:\n" + p)
  }

  test("q22: threshold scalar broadcasts; no-recent-orders is an anti join with pushed date filter") {
    val p = executedPlan("q22_idle_customers")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "anti-join probe must scan only recent orders:\n" + p)
  }

  test("retention: the cohort-min and activity join share the user_id partitioning") {
    // distinct (user, day) -> window-min per user -> (cohort, offset)
    // agg: 3 shuffles total over ONE events scan, not 4+ (the AQE plan
    // string repeats the tree under "== Initial Plan ==" — count the
    // final plan only)
    val p = executedPlan("q_retention").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      "cohort min should reuse the user_id partitioning:\n" + p)
  }

  test("event gaps: lag window partitions by user (no global sort)") {
    val p = executedPlan("q_event_gaps")
    assert(!p.contains("Exchange rangepartitioning"),
      "per-user lag must not globally sort:\n" + p)
  }

  test("q19: each side's projection of the OR-of-ANDs pushes into its scan") {
    val p = executedPlan("q19_disjunctive")
    // quantity envelope reaches the lineitem parquet scan...
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"), p)
    // ...and the brand/size disjunction the part scan, pre-join
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(p_brand".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q7: both nation dimension chains broadcast onto the lineitem scan") {
    val p = executedPlan("q7_nation_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("split summary never reads the text column and combines map-side") {
    val p = executedPlan("q_split")
    assert(!p.contains("text"), "split stats must not read document bodies:\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("packing runs as one shard-hash exchange + window (no global sort)") {
    val p = executedPlan("q_pack")
    assert(p.contains("Window"), p)
    assert(!p.contains("rangepartitioning"), "packing must not global-sort:\n" + p)
    assert(!p.contains("text"), "packing must not read document bodies:\n" + p)
  }

  test("tumbling window agg is partial-then-final over one shuffle") {
    val p = executedPlan("q_tumbling_hourly")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q9: all three dims broadcast; keyword filter pushed to the part scan") {
    val p = executedPlan("q9_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(p.contains("StringContains(p_name,red)"), p)
  }

  test("weblog: the visits side plans as an anti join, keyword pushed down") {
    val p = executedPlan("q_weblog")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("StringContains(p_name,red)"), p)
  }

  test("rollup: one-pass Expand, partial-then-final aggregation") {
    // AQE prints Final + Initial plans; count nodes in the final only
    val p = executedPlan("q_rollup").split("== Initial Plan ==")(0)
    assert(p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // one Expand = one scan; a re-aggregating formulation would scan twice
    assert("FileScan".r.findAllIn(p).size == 1, p)
  }

  test("interval join keys on user equality; the time range is a residual, not a nested loop") {
    // an event-time interval join that planned as BroadcastNestedLoop
    // would be |purchases| x |clicks| at scale — the equi-key must
    // carry the join and the range bounds ride as the join condition
    val p = executedPlan("q_interval_join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("NestedLoop"), "interval join must not nested-loop:\n" + p)
  }

  test("pagerank edge cache: out-degree rides the pre-partition exchange (no join)") {
    // the loop-invariant withDeg build must be window-over-one-shuffle;
    // a groupBy+self-join formulation costs two exchanges + a join
    // build over the full edge set (round-4 perf fix)
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    val withDeg = e.repartition(4, col("src"))
      .withColumn("outdeg", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
    val p = { withDeg.collect()
      withDeg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0) }
    assert(!p.contains("Join"), "outdeg must not need a join:\n" + p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("mixture filter pushes into the documents scan (no post-scan text read)") {
    // the per-row hash-bucket predicate must reach the data source
    // filter stage, and a count-shaped mix query must never read text
    val p = executedPlan("q_mixture")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id)") ||
      p.contains("Filter"), p)
    assert(!p.contains("text#"), "mix summary must not read text:\n" + p)
  }

  test("asof join: no join operator, one window over one key exchange") {
    val p = executedPlan("q_asof_join")
    assert(!p.contains("Join"), "asof must plan join-free:\n" + p)
    assert(p.contains("Window"), p)
  }

  test("top tokens: per-lang heavy hitters get WindowGroupLimit, combine map-side") {
    val p = executedPlan("q_top_tokens")
    assert(p.contains("WindowGroupLimit"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("unigram scoring: token-count aggregation combines map-side") {
    // both groupBys (token counts, per-doc scores) must be
    // partial-then-final; the weight join must not broadcast the
    // corpus-sized count table's build side onto the driver... AQE may
    // legitimately broadcast at sf0.001, so only the combine is pinned
    val p = executedPlan("q_unigram_score")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("unigram scoring: hybrid weight join — hot head broadcast, tail shuffled") {
    // with size-based broadcasting OFF (what a 100-TB corpus looks like
    // to the planner), the EXPLICIT hot-set broadcast must survive and
    // the tail join must fall back to a keyed shuffle join — proof the
    // Zipf head never rides the shuffle while the corpus-sized count
    // table is never driver-materialized
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.text.CorpusScoring.unigramScores(
        graft.Tables.t(spark, dir, "documents"))
      df.collect() // finalize AQE
      val p = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, // hot + anti
        "hot-set broadcast missing:\n" + p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "tail weight join must be a keyed shuffle join:\n" + p)
      assert(p.contains("Union"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.catalog.clearCache()
    }
  }

  test("bigram scoring: both hybrid weight joins keep hot heads broadcast, tails shuffled") {
    // same contract as the unigram case, doubled: the w2 (prev,cur)
    // hybrid and the w1 (cur) backoff hybrid must each keep their
    // explicit hot-head broadcast + probe-side anti-filter while the
    // tail joins fall back to keyed shuffle joins
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.text.CorpusScoring.bigramScores(
        graft.Tables.t(spark, dir, "documents"))
      df.collect() // finalize AQE
      val p = df.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, // 2x (hot + anti)
        "hot-set broadcasts missing:\n" + p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "tail weight joins must be keyed shuffle joins:\n" + p)
      assert("Union".r.findAllIn(p).size >= 2, p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.catalog.clearCache()
    }
  }

  // every query where a cartesian/nested-loop join is INTENTIONAL and
  test("token budget: window and final agg share the source partitioning") {
    // window partitionBy(source) then groupBy(source): ONE
    // hashpartitioning exchange total — the agg must reuse the
    // window's partitioning, and no rangepartitioning (no global sort)
    val p = executedPlan("q_token_budget").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      "agg should reuse the window's source partitioning:\n" + p)
    assert(!p.contains("Exchange rangepartitioning"),
      "per-source window must not globally sort:\n" + p)
  }

  test("transitions: one user-keyed exchange feeds the lag window") {
    val p = executedPlan("q_transitions").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size <= 1,
      "lag window should shuffle events once on user_id:\n" + p)
    assert(!p.contains("Exchange rangepartitioning"),
      "per-user lag must not globally sort:\n" + p)
  }

  test("funnel: rank window and history aggregation share one user exchange") {
    // row_number partitionBy(user_id) then groupBy(user_id): the agg
    // must reuse the window's hash partitioning — one user_id
    // exchange; the 4-row stage rollup adds at most one more tiny one
    val p = executedPlan("q_funnel_ordered").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size <= 1,
      "history agg should reuse the rank window's partitioning:\n" + p)
    assert(!p.contains("Exchange rangepartitioning"),
      "per-user funnel must not globally sort:\n" + p)
  }

  test("pca: projection pass is scan -> partial agg, no pre-agg shuffle") {
    // the eigenvector rides as a literal array: the only exchange is
    // the dim-bounded label aggregate's
    val p = executedPlan("q_pca_power").split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(p).size <= 1,
      "projection must not shuffle the corpus before the label agg:\n" + p)
  }

  test("span scrub: equi-joins only, dup set never forced broadcast") {
    // the dup-set join must stay an equi-join Catalyst/AQE may freely
    // pick a strategy for; at corpus scale the dup set is corpus-sized
    val p = executedPlan("q_span_scrub")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "span scrub must keep equi-joins:\n" + p)
  }

  // scale-safe, with the reason — anything else that plans one is an
  // accident that explodes at 100 TB
  private val nestedLoopAllowed: Map[String, String] = Map(
    "q_cross" -> "cross operator itself (region x nation, both tiny)",
    "q_knn_brute" -> "bounded query set broadcast against the corpus (the exactness baseline)",
    "q_hard_negatives" -> "bounded query set broadcast against the corpus (label-inequality residual)",
    "q_semi_hard_negatives" -> "bounded query set (+ its <=|queries|-row pos_sim aggregate) broadcast against the corpus twice (label-inequality + band residuals)",
    "q_knn_lsh" -> "broadcast probe-bucket set; corpus side keeps one bucket/vector",
    "q_knn_ivf" -> "broadcast probe-cell set against the bucketed corpus",
    "q_unigram_score" -> "1-row corpus-total frame broadcast into the weight projection",
    "q_tfidf_terms" -> "1-row corpus-doc-count frame broadcast into the score projection (surfaced when the audit gained sight of Materialize.releasing queries' pre-checkpoint plans, r12)",
    "q_bm25_topk" -> "1-row corpus-length-stats frame broadcast into the score projection",
    "q_bm25_index" -> "1-row corpus-length-stats frame broadcast into the score projection (served-index path)",
    "q_bm25_grow" -> "1-row folded-stats frame broadcast into the score projection (served-index path)",
    "q_bm25_forget" -> "1-row folded-stats frame broadcast into the score projection (served-index path)",
    "q_bm25_compact" -> "1-row folded-stats frame broadcast into the score projection (served-index path)",
    "q_bm25_merge" -> "1-row folded-stats frame broadcast into the score projection (served-index path over the merged shards)",
    "q_bm25_compact_tiered" -> "1-row folded-stats frame broadcast into the score projection (served-index path)",
    "q_hybrid_retrieval" -> "inherits both legs' bounded shapes: the q_knn_brute query-set broadcast and the q_bm25_topk 1-row stats frame",
    "q_hybrid_ivf" -> "inherits the q_bm25_topk 1-row stats frame (the dense leg is the keyed IVF probe)",
    "q_hybrid_index" -> "inherits the served lex leg's 1-row stats frame (dense leg keyed IVF probe)",
    "q_curriculum" -> "1-row quartile-threshold frame broadcast into the stage assignment",
    "q_distinct_sketch" -> "1-row exact-count frame crossed with the 1-row estimate (gate-scale comparison readout)",
    "q_quantile_sketch" -> "1-row total-count frame crossed with the 3-row percent set, then the range join against the <=1009-row cumulative sketch (all sketch-sized, plan-visible limits)",
    "q_quantile_per_group" -> "per-group count frame crossed with the literal 2-row percent set (|groups|x2 rows; the sketch join itself is the grp equi-join)",
    "q_quantile_boundary" -> "q_quantile_sketch's exact read-out shape (1-row total x 6-row percent set x <=1009-row sketch) over the boundary-sweep value fold",
    "q_kmv_distinct" -> "1-row exact-count frame crossed with the 1-row estimate (gate-scale comparison readout)",
    "q_token_drift" -> "1-row slice-totals frame broadcast into the ppm rate projection",
    "q_join_size_sketch" -> "1-row exact-size frame crossed with the 1-row sketch estimate (comparison readout)",
    "q_temperature_mix" -> "1-row isqrt-total frame broadcast into the quota projection",
    "q_bigram_score" -> "1-row train-total frame broadcast into the backoff weight projection",
    "q_trigram_score" -> "1-row train-total frame broadcast into the backoff weight projection",
    "q_dedup_embedding" -> "1-row label-count guard frame (never the corpus)",
    "q22_idle_customers" -> "1-row positive-balance average broadcast as the threshold scalar",
    "q15_top_supplier" -> "1-row max-revenue frame broadcast as the selection scalar",
  )

  test("substring dedup: window fingerprints aggregate map-side; no corpus-sized broadcast") {
    // pass 1's groupBy(fp) must partial-aggregate before its exchange
    // (the 16-bytes-per-window shuffle claim), and nothing in either
    // substring query may broadcast a corpus-scaled frame
    Seq("q_dedup_substring", "q_substring_scrub").foreach { q =>
      graft.api.Materialize.lastAuditPlan = None
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString +
        graft.api.Materialize.lastAuditPlan.getOrElse("")
      spark.catalog.clearCache()
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q: fingerprint count-distinct must partial-aggregate:\n" + p)
      assert(!p.contains("CartesianProduct"), s"$q:\n" + p)
      assert(!p.contains("BroadcastNestedLoop"), s"$q:\n" + p)
    }
  }

  test("domain reputation: rollup partial-aggregates; feedback join broadcasts via AQE, no hard hint") {
    // the rollup frame is DOMAIN-cardinality (tens of millions at
    // crawl scale), so the r8 rule applies: no hard broadcast() hint
    // — AQE picks BroadcastHashJoin at gate SF from runtime stats and
    // degrades to a keyed shuffle join when the domain table outgrows
    // the threshold. The per-domain aggregate must partial-aggregate
    // (its shuffle is (source, fp) metadata width, never text).
    val df = graft.SparkEntry.queries("q_domain_filter")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "AQE should broadcast the 20-domain rollup at gate SF:\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "rollup + histogram must partial-aggregate:\n" + p)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hinted = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hinted.isEmpty, "no hard hints in the reputation feedback join")
  }

  test("importance select: winners reduce via TakeOrdered, never a global sort") {
    val p = executedPlan("q_importance_select")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), "global sort in:\n" + p)
  }

  test("curriculum: threshold sample is a TakeOrdered, assignment is sort-free") {
    val p = executedPlan("q_curriculum")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), "global sort in:\n" + p)
  }

  // (q_bitext_mine materializes to a checkpoint, so its final plan is
  // a scan; its cell-blocked SHUFFLE_HASH candidate shape is the same
  // one the knn-graph audit below pins.)

  test("knn graph: corpus-probe candidate join is a keyed shuffle join, nothing broadcasts") {
    // the probe side IS the corpus here — the one ANN query where a
    // BroadcastExchange anywhere in the plan is a 100-TB failure
    val p = executedPlan("q_knn_graph")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastExchange"), "corpus must not broadcast:\n" + p)
  }

  test("filtered ANN: label predicate reaches EVERY index part's scan, pre-join") {
    // VERDICT r9 #6 done-criterion: the metadata predicate must show
    // up in PushedFilters of the index scans (base bucketed table AND
    // extent parquet), not as a post-join Filter — at serving scale
    // the filter is the thing that makes a restricted query cheaper
    // than an unrestricted one instead of equally expensive.
    // build the q_knn_filtered serving shape directly: the registry
    // query now materializes eagerly and deletes its temp root
    // (ADVICE r11 #3), so its returned frame is a checkpoint scan —
    // the plan to audit is the searchGrown call itself, pre-checkpoint
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val table = "plan_audit_knn_filtered"
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0), table)
    val root = java.nio.file.Files.createTempDirectory("plan_audit_knnf")
    val grow = s"$root/ext"
    graft.sim.IvfIndex.admit(spark, table, grow,
      emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
    val df = graft.sim.IvfIndex.searchGrown(spark, table, grow,
      emb.filter(col("vec_id") < 10).limit(10), 5,
      pred = Some(col("label").isin(1, 4, 7)))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*In\\(label, \\[1,4,7\\]\\)".r
      .findAllIn(p).size
    assert(pushed >= 2,
      s"label IN-filter must push into both index-part scans (found $pushed):\n" + p)
    graft.api.Bucketing.resetManaged(spark, table)
    val fs = new org.apache.hadoop.fs.Path(grow)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root.toString), true)
    // and the int8 leg: the predicate prunes the CODES scan (the
    // narrow table), so the restricted search reads less, not more
    val p8 = executedPlan("q_knn_filtered_int8")
    assert("PushedFilters: \\[[^\\]]*In\\(label, \\[1,4,7\\]\\)".r
      .findFirstIn(p8).isDefined,
      "label IN-filter must push into the int8 codes scan:\n" + p8)
  }

  test("cc guard-rail: root-set anti-join = broadcast LeftAnti, zero extra probe exchanges") {
    // VERDICT r9 #7: the convergence-tail root filter must stay ~free
    // — a refactor that turns the tiny roots broadcast into a shuffle
    // (or adds an exchange on the probe side) would silently make the
    // guard cost a superstep's worth of shuffle at every barrier.
    import org.apache.spark.sql.functions._
    val sol = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("vertex"),
        (col("l_orderkey") % 7).as("component"))
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val base = planOf(graft.graph.Algorithms.rootPrunedProbe(sol,
      rootFilterEligible = false, rootCount = -1L))
    val pruned = planOf(graft.graph.Algorithms.rootPrunedProbe(sol,
      rootFilterEligible = true, rootCount = 100L))
    assert(pruned.contains("BroadcastHashJoin") && pruned.contains("LeftAnti"),
      "root filter must plan as a broadcast anti join:\n" + pruned)
    assert("Exchange hashpartitioning".r.findAllIn(pruned).size ==
      "Exchange hashpartitioning".r.findAllIn(base).size,
      s"root filter must add no probe-side exchange:\nbase:\n$base\npruned:\n$pruned")
    // above the driver-measured bound the filter must vanish entirely
    val over = planOf(graft.graph.Algorithms.rootPrunedProbe(sol,
      rootFilterEligible = true,
      rootCount = graft.graph.Algorithms.RootBroadcastBound + 1))
    assert(!over.contains("Join"), "over-bound rootCount must skip the filter:\n" + over)
    // the bound itself: 4M single-long rows ~= 32 MB, executor-resident
    assert(graft.graph.Algorithms.RootBroadcastBound == 4194304L)
  }

  test("dedup-index guard-rail: hot-sidecar agg reads the cached signed frame, no corpus rescan") {
    // VERDICT r9 #7: DedupIndex.write computes the hot sidecar from
    // the SAME persisted signed frame that feeds the two table writes
    // — one signing pass, three readers. A refactor that re-derived
    // the bands from the raw documents would silently re-scan and
    // re-sign the whole corpus per index write.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, dir, "documents")
    val signed = graft.dedup.Dedup.signedBands(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      signed.count() // materialize the cache, as write() does
      val hot = graft.dedup.DedupIndex.hotAgg(
        signed.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band_idx", "band_key"))))
      hot.collect()
      val p = hot.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val cacheAt = p.indexOf("TableCacheQueryStage") match {
        case -1 => p.indexOf("InMemoryTableScan")
        case i => i
      }
      assert(cacheAt >= 0,
        "hot agg must read the signed-frame cache:\n" + p)
      // everything ABOVE the cache boundary must be cache-fed; the
      // cache node itself prints its origin plan, which legitimately
      // contains the one FileScan that FILLED the cache
      assert(!p.substring(0, cacheAt).contains("FileScan"),
        "hot agg must not rescan the documents corpus:\n" + p)
    } finally signed.unpersist(blocking = true)
  }

  test("perceptual fingerprints: decode + hash is ONE narrow stage, rasters/PCM never shuffle") {
    // the r11 image/audio dedup contract: the only thing that leaves
    // the decode stage is (media_id, format/rate, fp) — 3 scalars per
    // row. A shuffle anywhere in the fingerprint subtree would exchange
    // multi-KB rasters/sample-arrays, the exact payload-through-the-
    // shuffle trap the operators are shaped to avoid.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, dir, "documents")
    Seq(
      graft.multimodal.Multimodal.imageFingerprints(
        graft.multimodal.Multimodal.asMediaTable(docs)),
      graft.multimodal.Multimodal.audioFingerprints(
        graft.multimodal.Multimodal.asAudioTable(docs))
    ).foreach { fps =>
      fps.collect()
      val p = fps.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "fingerprinting must be a single narrow stage:\n" + p)
      // the hash Project must sit inside a WholeStageCodegen span
      // (executedPlan.toString marks codegen'd operators with "*(n)")
      assert("\\*\\(\\d+\\) Project \\[.*(dhashexpr|audiohashexpr)".r
        .findFirstIn(p).isDefined,
        "fingerprint expression must be codegen'd:\n" + p)
    }
  }

  test("q5 at gate SF: AQE broadcasts the de-hinted dims without any hard hint") {
    // VERDICT r8 #1: customer/supplier/part are xSF-scaled, so their
    // hard broadcast() hints were removed — at 100 TB a hard hint
    // overrides AQE and OOMs the executors. This pins the flip side:
    // at gate SF (0.1) AQE still picks BroadcastHashJoin for every dim
    // from runtime stats, so dropping the hints costs nothing locally.
    val df = graft.SparkEntry.queries("q5_local_volume")(spark, "/root/testdata/sf0.1")
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "AQE should still broadcast all four dims at sf0.1:\n" + p)
    // and the analyzed plan carries hints ONLY on nation/region frames
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val hinted = df.queryExecution.analyzed.collect { case h: ResolvedHint => h.child }
    assert(hinted.forall(_.output.forall(a =>
      a.name.startsWith("n_") || a.name.startsWith("r_"))),
      "only nation/region may carry hard broadcast hints in q5")
  }

  test("suite-wide: no hard broadcast hint survives on an SF-scaled build side") {
    // VERDICT r8 #1 regression pin. A hard broadcast() is legal only
    // when the hinted frame is bounded BY CONSTRUCTION: a global
    // (ungrouped, <=1-row) aggregate, an explicit limit (Zipf heads,
    // query/probe sets), a literal LocalRelation, or a frame whose
    // every leaf is the constant-sized nation/region table. Anything
    // else grows with SF and would OOM a 100 TB executor.
    import org.apache.spark.sql.catalyst.plans.logical._
    // joinWithTiny parity: the hint IS the operator under test there
    // (caller asserts tiny — see qJoinBroadcast's scaladoc)
    val allowed = Set("q_join_broadcast")
    def boundedByConstruction(p: LogicalPlan): Boolean = {
      val marker = p.collectFirst {
        case a: Aggregate if a.groupingExpressions.isEmpty => ()
        case _: GlobalLimit => ()
        case _: LocalLimit => ()
        case _: LocalRelation => ()
        case _: OneRowRelation => ()
      }
      marker.isDefined || {
        val leaves = p.collectLeaves()
        leaves.nonEmpty && leaves.forall(l => l.output.nonEmpty &&
          l.output.forall(a => a.name.startsWith("n_") || a.name.startsWith("r_")))
      }
    }
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowed.contains)
      .flatMap { name =>
        // lifecycle queries return an eager checkpoint whose analyzed
        // plan is just the checkpoint relation; their REAL returned
        // shape is stashed by Materialize.withTempRoot (review r12 #3)
        graft.api.Materialize.lastAuditAnalyzed = None
        val own = graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.analyzed
        val plans = own +: graft.api.Materialize.lastAuditAnalyzed.toSeq
        spark.catalog.clearCache() // drop per-query persists
        val bad = plans.flatMap(_.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h.child
        }).filterNot(boundedByConstruction)
        if (bad.nonEmpty) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"SF-scaled frames carry hard broadcast hints in: ${offenders.mkString(", ")}")
  }

  test("suite-wide: no ACCIDENTAL cartesian or nested-loop join in any query") {
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(nestedLoopAllowed.contains)
      .flatMap { name =>
        graft.api.Materialize.lastAuditPlan = None
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.collect() // finalize AQE
        // the checkpointed lifecycle queries' real plan is the stashed
        // pre-checkpoint one (review r12 #3); scan both
        val p = df.queryExecution.executedPlan.toString +
          graft.api.Materialize.lastAuditPlan.getOrElse("")
        spark.catalog.clearCache() // drop per-query persists
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoop"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian joins in: ${offenders.mkString(", ")}")
  }
}
