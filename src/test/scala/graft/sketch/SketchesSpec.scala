package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def lineitem = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("hash-range estimator: deterministic across partitionings, error in bound") {
    val a = Sketches.distinctRangeEstimate(lineitem, "l_orderkey", 16)
      .as[(Long, Long)].collect().head
    val b = Sketches.distinctRangeEstimate(lineitem.repartition(13), "l_orderkey", 16)
      .as[(Long, Long)].collect().head
    assert(a == b)
    val exact = lineitem.select(count_distinct(col("l_orderkey")))
      .as[Long].collect().head
    // ~92 sampled keys → sub-50% relative error is the statistical
    // regime; the spec pins it generously (determinism is the contract)
    assert(math.abs(a._2 - exact).toDouble / exact < 0.5,
      s"est ${a._2} vs exact $exact")
  }

  test("KMV: error in bound; merging per-half bottom-k equals the global sketch") {
    val exact = lineitem.select(count_distinct(col("l_partkey")))
      .as[Long].collect().head
    val est = Sketches.kmvEstimate(lineitem, "l_partkey", 128)
      .as[(Long, Long)].collect().head._2
    assert(math.abs(est - exact).toDouble / exact < 0.5, s"$est vs $exact")

    // mergeability: bottom-128 of (bottom-128(half A) ∪ bottom-128(half B))
    // == bottom-128 of the whole — the property that lets per-shard
    // sketches roll up without touching raw data
    def bottom(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(Sketches.longHash(col("l_partkey")).as("h"))
        .distinct().orderBy(col("h")).limit(128).as[Long].collect().toSeq
    val whole = bottom(lineitem)
    val merged = (bottom(lineitem.filter(col("l_orderkey") % 2 === 0)) ++
        bottom(lineitem.filter(col("l_orderkey") % 2 =!= 0)))
      .distinct.sorted.take(128)
    assert(merged == whole)
  }

  test("count-min: estimate is an upper bound and exact absent collisions") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("tok"), Sketches.tokVal(col("tok")).as("v"))
    val sketch = Sketches.cmsSketch(toks, col("v"))
    // the sketch is structurally bounded
    assert(sketch.count() <= Sketches.CmsDepth * Sketches.CmsWidth)
    val cands = toks.groupBy(col("tok"), col("v")).agg(count(lit(1)).as("cnt"))
    val est = Sketches.cmsEstimate(sketch, cands)
      .select(col("tok"), col("cnt"), col("est"))
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    // upper-bound property: min-over-rows never undercounts
    est.foreach { case (tok, cnt, e) =>
      assert(e >= cnt, s"$tok: est $e < exact $cnt") }
    // 31-token vocab in 4x1024 counters: at least one row of the four
    // is collision-free for every token, so estimates are EXACT here
    est.foreach { case (tok, cnt, e) =>
      assert(e == cnt, s"$tok: est $e != exact $cnt (unexpected collision)") }
  }

  test("KMV under-full sketch returns the exact count, not an extrapolation") {
    // 25 distinct suppliers < k=128: the sample IS the population
    val sup = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_suppkey"))
    val distinctN = sup.distinct().count()
    assert(distinctN < 128)
    val est = Sketches.kmvEstimate(sup, "l_suppkey", 128)
      .select(col("est")).as[Long].collect().head
    assert(est == distinctN, s"under-full KMV must be exact: $est vs $distinctN")
  }

  test("count-min point query for a never-seen value reports, not vanishes") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("tok"), Sketches.tokVal(col("tok")).as("v"))
    val sketch = Sketches.cmsSketch(toks, col("v"))
    val cands = Seq(("zzz_never_seen", 0L)).toDF("tok", "cnt")
      .select(col("tok"), col("cnt"), Sketches.tokVal(col("tok")).as("v"))
    val out = Sketches.cmsEstimate(sketch, cands)
      .select(col("tok"), col("est")).as[(String, Long)].collect()
    // the candidate must appear (empty counters read 0) with a valid
    // upper-bound estimate
    assert(out.length == 1 && out.head._1 == "zzz_never_seen")
    assert(out.head._2 >= 0L)
  }

  test("CMS join-size estimate upper-bounds the exact self-join size within the width bound") {
    val li = lineitem.select(Sketches.longHash(col("l_partkey")).as("v"))
    val est = Sketches.cmsJoinSizeEstimate(li, col("v"), li, col("v"))
      .as[Long].collect().head
    val exact = lineitem.groupBy(col("l_partkey")).count()
      .agg(sum(col("count") * col("count"))).as[Long].collect().head
    val n = lineitem.count()
    assert(est >= exact, s"CMS inner product must upper-bound: $est < $exact")
    assert(est <= exact + n * n / Sketches.CmsWidth + 1,
      s"estimate outside the additive width bound: est $est exact $exact")
  }

  test("CMS join-size estimate: empty side yields 0, not NULL; self-dot equals two-sided self") {
    val li = lineitem.select(Sketches.longHash(col("l_partkey")).as("v"))
    val empty = li.filter(lit(false))
    val estEmpty = Sketches.cmsJoinSizeEstimate(li, col("v"), empty, col("v"))
      .as[Long].collect().head
    assert(estEmpty == 0L, s"empty join side must estimate 0: $estEmpty")
    // the one-scan self-dot form answers identically to the
    // two-sided call on the same input
    val self1 = Sketches.cmsSelfJoinSizeEstimate(li, col("v"))
      .as[Long].collect().head
    val self2 = Sketches.cmsJoinSizeEstimate(li, col("v"), li, col("v"))
      .as[Long].collect().head
    assert(self1 == self2)
  }

  test("kmvPerGroup: under-full groups exact; full groups within error bound") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // k=4 < 15 distinct users per type → estimator branch everywhere
    val est4 = Sketches.kmvPerGroup(ev, "event_type", "user_id", 4)
      .as[(String, Long)].collect().toMap
    est4.values.foreach(e => assert(math.abs(e - 15.0) / 15.0 < 1.5, est4))
    // k=64 > 15 → exact branch everywhere
    val est64 = Sketches.kmvPerGroup(ev, "event_type", "user_id", 64)
      .as[(String, Long)].collect().toMap
    assert(est64.values.forall(_ == 15L), est64)
  }

  test("token drift: rates are exact ppm floors and tv is symmetric") {
    import graft.pipeline.Drift
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val even = col("doc_id") % 2 === 0
    val odd = col("doc_id") % 2 === 1
    val ab = Drift.tokenShift(docs, col("text"), even, odd)
      .select(col("tok"), col("a_ppm"), col("b_ppm"), col("tv_ppm"))
      .as[(String, Long, Long, Long)].collect()
    val ba = Drift.tokenShift(docs, col("text"), odd, even)
      .select(col("tok"), col("a_ppm"), col("b_ppm"), col("tv_ppm"))
      .as[(String, Long, Long, Long)].collect()
    assert(ab.map(r => r._1 -> r._4).toMap == ba.map(r => r._1 -> r._4).toMap)
    // floor-division rates: each side sums to 1e6 within vocab-size slack
    val sumA = ab.map(_._2).sum
    assert(sumA <= 1000000L && sumA > 1000000L - ab.length, sumA)
  }

  test("quantile sketch: bucket bounds contain their values; read-out within grid error") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("n_chars").cast("long").as("v"))
    // bucket membership invariant: lo(bucket(v)) <= v < hi(bucket(v))
    // for a model reimplementation of the bucket arithmetic
    def model(v: Long): (Long, Long, Long) = {
      if (v < 1) (0L, 0L, 1L)
      else {
        val band = 63 - java.lang.Long.numberOfLeadingZeros(v)
        val base = 1L << band
        val off = (v - base) * Sketches.QsGrid / base
        val b = 1 + band * Sketches.QsGrid + off
        val lo = base + off * base / Sketches.QsGrid
        val hi = if (off == Sketches.QsGrid - 1) base * 2
          else base + (off + 1) * base / Sketches.QsGrid
        (b, lo, hi)
      }
    }
    val got = docs.select(col("v"), Sketches.qsBucket(col("v")).as("b"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, b) =>
      val (mb, lo, hi) = model(v)
      assert(b == mb, s"bucket($v): got $b, model $mb")
      assert(lo <= v && v < hi, s"v=$v outside [$lo,$hi)")
    }
    // read-out error: within one sub-bucket width of the exact rank
    // statistic (worst case 1/QsGrid relative)
    val n = docs.count()
    val exact = Seq(50, 90, 99).map { p =>
      val target = ((n * p) + 99) / 100
      p -> docs.orderBy(col("v")).limit(target.toInt)
        .agg(max(col("v"))).as[Long].collect().head
    }.toMap
    val est = Sketches.quantileSketchEstimate(docs, col("v"), Seq(50, 90, 99))
      .as[(Int, Long)].collect().toMap
    exact.foreach { case (p, ex) =>
      val rel = math.abs(est(p) - ex).toDouble / math.max(ex, 1)
      assert(rel <= 1.0 / Sketches.QsGrid + 0.01,
        s"P$p: est ${est(p)} vs exact $ex (rel $rel)")
    }
  }

  test("quantile sketch merge law: per-half counter rollup reads out identically to the global sketch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val whole = Sketches.quantileSketch(docs, col("v"))
    val merged = Sketches.quantileMerge(
      Sketches.quantileSketch(docs.filter(col("doc_id") % 2 === 0), col("v")),
      Sketches.quantileSketch(docs.filter(col("doc_id") % 2 =!= 0), col("v")))
    // states identical bucket-by-bucket...
    def state(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.as[(Long, Long)].collect().toMap
    assert(state(merged) == state(whole))
    // ...and the bounded state claim holds
    assert(whole.count() <= Sketches.QsMaxBuckets)
    // ...so the read-outs agree exactly
    val a = Sketches.quantileEstimate(whole, Seq(50, 90, 99))
      .as[(Int, Long)].collect().toMap
    val b = Sketches.quantileEstimate(merged, Seq(50, 90, 99))
      .as[(Int, Long)].collect().toMap
    assert(a == b)
    // determinism under re-partitioning (the suite-wide discipline)
    val c = Sketches.quantileSketchEstimate(
      docs.repartition(13), col("v"), Seq(50, 90, 99))
      .as[(Int, Long)].collect().toMap
    assert(c == a)
  }

  test("quantile sketch boundary fixtures: full long domain folds without overflow (VERDICT r12 #8)") {
    // BigInt model of the documented arithmetic — including the
    // band-62 top sub-bucket hi clamp to Long.MaxValue
    def model(v: Long): (Long, Long, Long) = {
      if (v < 1) (0L, 0L, 1L)
      else {
        val band = 63 - java.lang.Long.numberOfLeadingZeros(v)
        val base = BigInt(1) << band
        val off = ((BigInt(v) - base) * Sketches.QsGrid / base).toLong
        val b = 1 + band * Sketches.QsGrid + off
        val lo = (base + BigInt(off) * base / Sketches.QsGrid).toLong
        val hi =
          if (off == Sketches.QsGrid - 1 && band == 62) Long.MaxValue
          else if (off == Sketches.QsGrid - 1) (base * 2).toLong
          else (base + BigInt(off + 1) * base / Sketches.QsGrid).toLong
        (b.toLong, lo, hi)
      }
    }
    val edges = Seq(0L, 1L, 15L, 16L, 17L,
      (1L << 59) - 1, 1L << 59,               // the OLD precondition edge
      (1L << 62) - 1, 1L << 62,                // band 61/62 boundary
      (31L << 58) - 1, 31L << 58,              // band-62 top sub-bucket lo
      Long.MaxValue)
    val got = edges.toDF("v")
      .select(col("v"), Sketches.qsBucket(col("v")).as("b"))
      .as[(Long, Long)].collect().toMap
    edges.foreach { v =>
      val (mb, lo, hi) = model(v)
      assert(got(v) == mb, s"bucket($v): got ${got(v)}, model $mb")
      // membership under the clamps: hi is exclusive except (a) the
      // band-62 top bucket where hi == Long.MaxValue is inclusive and
      // (b) band < 4's degenerate sub-buckets (base < QsGrid ⇒ some
      // widths floor to 0: every member equals lo, and a 0 width
      // zeroes the interpolation term — est = lo, still exact)
      assert(lo <= v && (v < hi || v == lo || (hi == Long.MaxValue && v <= hi)),
        s"v=$v outside [$lo,$hi]")
    }
    // single-value sketches: P100 read-out must equal the bucket lo
    // (target rank 1 → offset 0) — exercises qsLo at every edge
    edges.foreach { v =>
      val est = Sketches.quantileSketchEstimate(
        Seq(v).toDF("v"), col("v"), Seq(100)).as[(Int, Long)].collect()
      assert(est.head._2 == model(v)._2, s"P100($v): ${est.toSeq}")
    }
    // huge-count interpolation: a hand-built state with cnt > 2^31 in
    // one band-62 bucket — num·width ≈ 2^90, the exact product the
    // old Long·Long multiply wrapped on; expected value via BigInt
    val cnt = 5000000000L // 5e9 > 2^32
    val state = Seq((model(1L << 62)._1, cnt)).toDF("bucket", "cnt")
    val est50 = Sketches.quantileEstimate(state, Seq(50))
      .as[(Int, Long)].collect().head._2
    val (_, lo, hi) = model(1L << 62)
    val target = (BigInt(cnt) * 50 + 99) / 100
    val expected = (BigInt(lo) + (target - 1) * (BigInt(hi) - BigInt(lo)) / cnt).toLong
    assert(est50 == expected, s"P50 huge-count: got $est50, expected $expected")
    assert(est50 >= lo && est50 < hi)
  }

  test("tokVal agrees between engines' arithmetic (reference fold)") {
    def ref(w: String): Long =
      w.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 1000000007L)
    val got = Seq("scan", "batch", "a", "").toDF("w")
      .select(col("w"), Sketches.tokVal(col("w")).as("v"))
      .as[(String, Long)].collect().toMap
    Seq("scan", "batch", "a", "").foreach(w => assert(got(w) == ref(w), w))
  }
}
