package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupIndexSpec extends SparkSpec {

  import spark.implicits._

  // the DedupSpec LSH fixture: a~b (J=0.6, shared bands), c disjoint
  private val a = "zulu oscar charlie amber basil india papa whiskey victor dune bravo juliet cedar sierra"
  private val b = "zulu oscar charlie amber basil india papa whiskey victor dune bravo tango xray quebec"
  private val c = "mike november romeo uniform yankee foxtrot golf kilo echo delta"

  test("persisted index flags delta near-dups identically to a monolithic LSH run") {
    val corpus = Seq((10L, a), (12L, c)).toDF("doc_id", "text")
    val delta = Seq((21L, b), (22L, "hotel alpha lima sierra tango unused words here again ok"))
      .toDF("doc_id", "text")
    DedupIndex.write(corpus, "dedup_idx_spec", buckets = 4)

    val flagged = DedupIndex.flagAgainst(spark, "dedup_idx_spec", delta, 0.5)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet

    // normalized layout (VERDICT r6 #2): no persisted index row carries
    // a shingle array alongside a band key — bands is ids-only, sv is
    // one row per doc
    val bandCols = spark.table(DedupIndex.bandsTable("dedup_idx_spec"))
      .columns.toSet
    assert(bandCols == Set("doc_id", "band_idx", "band_key"))
    val sv = spark.table(DedupIndex.svTable("dedup_idx_spec"))
    assert(sv.columns.toSet == Set("doc_id", "sv"))
    assert(sv.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)

    // ground truth: cross-boundary pairs of the monolithic run
    val all = corpus.unionByName(delta)
    val pairs = Dedup.minhashLshPairs(all, 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val cross = pairs.flatMap { case (x, y) =>
      if (x >= 20 && y < 20) Some((x, y))
      else if (y >= 20 && x < 20) Some((y, x))
      else None
    }
    assert(flagged == cross && flagged == Set((21L, 10L)))
    DedupIndex.drop(spark, "dedup_idx_spec")
  }

  test("rewriting an index over a stale warehouse directory succeeds (catalog reset)") {
    // an in-memory catalog forgets managed tables between sessions but
    // their warehouse dirs survive (DROP TABLE on a managed table
    // removes both, so simulate the stale state by planting the
    // directory directly): write must reset it or saveAsTable dies
    // with LOCATION_ALREADY_EXISTS
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val stale = new org.apache.hadoop.fs.Path(wh,
      DedupIndex.bandsTable("dedup_idx_rewrite").toLowerCase)
    val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stale)
    assert(fs.exists(stale))
    val corpus = Seq((10L, a)).toDF("doc_id", "text")
    DedupIndex.write(corpus, "dedup_idx_rewrite", buckets = 2)
    assert(spark.table(DedupIndex.svTable("dedup_idx_rewrite")).count() == 1)
    DedupIndex.drop(spark, "dedup_idx_rewrite")
  }

  test("flag path never exchanges the stored index (bucketed layout is load-bearing)") {
    // r9 regression pin: unioning base + extents before the candidate
    // join erased the base tables' bucketing and re-shuffled the WHOLE
    // index every batch — measured O(index) per-batch admission
    // (83-159 s at a 2M base, docs/SCALE.md "growth slope"). The
    // candidate and verify joins must consume the bucketed base scans
    // directly: no ShuffleExchange may sit ANYWHERE above either base
    // table's scan.
    val corpus = (1L to 200L)
      .map(i => (i, s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i"))
      .toDF("doc_id", "text")
    DedupIndex.write(corpus, "dedup_idx_plan", buckets = 4)
    val delta = Seq((900L, a)).toDF("doc_id", "text")
    val signed = Dedup.signedBands(delta).cache()
    val flagged = DedupIndex.flagSigned(signed,
      spark.table(DedupIndex.bandsTable("dedup_idx_plan")),
      spark.table(DedupIndex.svTable("dedup_idx_plan")), 0.5)
    flagged.collect() // finalize AQE
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(collectAll)) ++ (p match {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case _ => Nil
      })
    val nodes = collectAll(flagged.queryExecution.executedPlan)
    val indexScansUnderShuffle = nodes.collect {
      case sh: ShuffleExchangeExec => collectAll(sh).collect {
        case fs: FileSourceScanExec
            if fs.toString.contains("dedup_idx_plan") => fs
      }
    }.flatten
    assert(indexScansUnderShuffle.isEmpty,
      "stored index tables must never sit under a shuffle exchange:\n" +
        flagged.queryExecution.executedPlan)
    signed.unpersist()
    DedupIndex.drop(spark, "dedup_idx_plan")
  }

  test("hot-bucket guard: boilerplate-flooded index buckets stop generating candidates") {
    // 300 near-identical boilerplate docs (one shared text) flood
    // every one of their band buckets far past the cap; one normal
    // doc sits in healthy buckets. A delta with one boilerplate copy
    // and one near-dup of the normal doc must flag ONLY the normal
    // pair: the boilerplate's buckets are diverted to the exact-dedup
    // path by the guard (hot sidecar populated at write time), so the
    // candidate join never sees the 300-doc bucket.
    val boiler = (1L to 300L).map(i => (i, a)) // identical text => same bands
    val corpus = (boiler :+ (400L, c)).toDF("doc_id", "text")
    DedupIndex.write(corpus, "dedup_idx_hot", buckets = 4)

    val hot = spark.table(DedupIndex.hotTable("dedup_idx_hot"))
    assert(hot.count() > 0, "boilerplate buckets must be recorded as hot")
    assert(hot.agg(max(col("n_docs"))).head.getLong(0) == 300L)

    val delta = Seq((501L, a), // boilerplate copy -> guarded, no pairs
      (502L, c + " plus small tail change")) // true near-dup of 400
      .toDF("doc_id", "text")
    val flagged = DedupIndex.flagAgainst(spark, "dedup_idx_hot", delta, 0.5)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(flagged.forall(_._1 == 502L),
      s"boilerplate doc must generate no candidates, got $flagged")
    assert(flagged.contains((502L, 400L)), s"planted pair missed: $flagged")
    DedupIndex.drop(spark, "dedup_idx_hot")
  }

  test("forget: tombstoned witness stops flagging immediately; compact removes it physically") {
    val grow = java.nio.file.Files.createTempDirectory("dedup_forget_spec").toString
    val sink = java.nio.file.Files.createTempDirectory("dedup_forget_sink").toString
    // index holds doc 10 (= text a); doc 21 (= near-dup text b) would
    // flag against it
    DedupIndex.write(Seq((10L, a), (12L, c)).toDF("doc_id", "text"),
      "dedup_forget_idx", buckets = 4)
    val batch = Seq((21L, b)).toDF("doc_id", "text")
    DedupIndex.flagAndAdmit(spark, "dedup_forget_idx", grow, batch, 0L, sink)
    val before = spark.read
      .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
      .parquet(sink).select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(before == Set((21L, 10L)), s"expected the near-dup flag, got $before")
    // forget doc 10 -> replaying the SAME batch must flag nothing
    // (and the replay overwrites its own sink/extent partitions)
    DedupIndex.forget(spark, grow, Seq(10L).toDF("doc_id"), 1L)
    DedupIndex.flagAndAdmit(spark, "dedup_forget_idx", grow, batch, 0L, sink)
    val after = spark.read
      .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
      .parquet(sink).select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(after.isEmpty, s"forgotten witness must not flag: $after")
    // compact applies the tombstone physically: doc 10's bands and sv
    // rows leave the base tables, tombstone dir cleared
    DedupIndex.compact(spark, "dedup_forget_idx", grow, buckets = 4)
    assert(spark.table(DedupIndex.bandsTable("dedup_forget_idx"))
      .filter(col("doc_id") === 10L).count() == 0)
    assert(spark.table(DedupIndex.svTable("dedup_forget_idx"))
      .filter(col("doc_id") === 10L).count() == 0)
    val fs = new org.apache.hadoop.fs.Path(grow)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(DedupIndex.tombstonePath(grow))))
    DedupIndex.drop(spark, "dedup_forget_idx")
  }

  test("compactTiered: base + hot sidecar untouched below threshold, consolidated extents, flags invariant") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // twin setups (deterministic): base %8<7, admit %8==7 (~14% of
    // base), forget %9==0 of the raw %8<9... restricted to indexed
    // ids via the base predicate (extent survivors' forgetting is
    // covered by the postings/IVF twins; base-hitting tombstones are
    // the surviving class this test pins)
    def setup(table: String): String = {
      DedupIndex.write(docs.filter(col("doc_id") % 8 < 7), table, buckets = 4)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      val (grow, sink) = (s"$root/ext", s"$root/sink")
      DedupIndex.flagAndAdmit(spark, table, grow,
        docs.filter(col("doc_id") % 8 === 7), 0L, sink)
      DedupIndex.forget(spark, grow,
        docs.filter(col("doc_id") % 8 < 7 && col("doc_id") % 9 === 0)
          .select(col("doc_id")), 100L)
      root
    }
    val rootA = setup("dedup_tiered_a") // gets compactTiered
    val rootB = setup("dedup_tiered_b") // untouched twin
    val basePre = (warehouseFiles(DedupIndex.bandsTable("dedup_tiered_a")),
      warehouseFiles(DedupIndex.svTable("dedup_tiered_a")),
      warehouseFiles(DedupIndex.hotTable("dedup_tiered_a")))
    DedupIndex.compactTiered(spark, "dedup_tiered_a", s"$rootA/ext", buckets = 4)
    // 1. base tables AND the hot sidecar byte-identical
    assert((warehouseFiles(DedupIndex.bandsTable("dedup_tiered_a")),
      warehouseFiles(DedupIndex.svTable("dedup_tiered_a")),
      warehouseFiles(DedupIndex.hotTable("dedup_tiered_a"))) == basePre)
    // 2. extents consolidated, base-hitting tombstones survive
    val fs = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partitions(dir: String): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    val cons = s"batch_id=${graft.api.Lsm.ConsolidatedBatchId}"
    assert(partitions(DedupIndex.extentBandsPath(s"$rootA/ext")) == Seq(cons))
    assert(partitions(DedupIndex.extentSvPath(s"$rootA/ext")) == Seq(cons))
    assert(partitions(DedupIndex.tombstonePath(s"$rootA/ext")) == Seq(cons))
    val remaining = spark.read.schema("doc_id LONG")
      .parquet(DedupIndex.tombstonePath(s"$rootA/ext"))
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val expected = docs
      .filter(col("doc_id") % 8 < 7 && col("doc_id") % 9 === 0)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(remaining == expected)
    // 3. the next batch's flags are INVARIANT to the tiered fold:
    // same flags as the untouched twin (forgotten witnesses still
    // masked, consolidated extent still witnesses)
    def flagsOf(table: String, root: String): Set[(Long, Long)] = {
      DedupIndex.flagAndAdmit(spark, table, s"$root/ext",
        docs.filter(col("doc_id") % 8 === 3 && col("doc_id") % 2 === 1)
          .select(col("doc_id") + 100000L as "doc_id", col("text")),
        7L, s"$root/sink")
      spark.read
        .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
        .parquet(s"$root/sink").filter(col("batch_id") === 7L)
        .select(col("doc_id"), col("dup_of"))
        .as[(Long, Long)].collect().toSet
    }
    val fa = flagsOf("dedup_tiered_a", rootA)
    val fb = flagsOf("dedup_tiered_b", rootB)
    assert(fa == fb)
    assert(fa.nonEmpty, "probe batch should flag against the index")
    DedupIndex.drop(spark, "dedup_tiered_a")
    DedupIndex.drop(spark, "dedup_tiered_b")
  }

  test("forget contract guard: a batch reusing a tombstoned id is rejected, not silently mis-paired") {
    // VERDICT r10 #3: tombstoning an id that later arrives as a NEW
    // batch document would silently drop that batch's within-batch
    // pairs (the pair-side anti-join can't tell a forgotten witness
    // from a reborn doc). The violation must SURFACE.
    val grow = java.nio.file.Files.createTempDirectory("dedup_guard_spec").toString
    val sink = java.nio.file.Files.createTempDirectory("dedup_guard_sink").toString
    DedupIndex.write(Seq((10L, a), (12L, c)).toDF("doc_id", "text"),
      "dedup_guard_idx", buckets = 4)
    DedupIndex.forget(spark, grow, Seq(10L).toDF("doc_id"), 0L)
    val reborn = Seq((10L, "completely new text for a reused id"), (21L, b))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      DedupIndex.flagAndAdmit(spark, "dedup_guard_idx", grow, reborn, 1L, sink)
    }
    assert(e.getMessage.contains("tombstoned"), e.getMessage)
    // a clean batch on the same index still works
    DedupIndex.flagAndAdmit(spark, "dedup_guard_idx", grow,
      Seq((21L, b)).toDF("doc_id", "text"), 1L, sink)
    DedupIndex.drop(spark, "dedup_guard_idx")
  }

  test("crash-replay of the batch that admitted a later-forgotten doc proceeds (guard exempts own prior output)") {
    // r11 review finding: the first guard rejected this legitimate
    // streaming recovery path. Batch 0 admits doc 10 (and flags 21
    // against it); forget(10) — legal, 10 is indexed; a replay of
    // batch 0 must NOT be rejected as a rebirth: its ids are in the
    // batch's own sink/extent partitions, and the replayed sink drops
    // the forgotten witness's pairs (retroactive-replay contract).
    val grow = java.nio.file.Files.createTempDirectory("dedup_replay_spec").toString
    val sink = java.nio.file.Files.createTempDirectory("dedup_replay_sink").toString
    DedupIndex.write(Seq((12L, c)).toDF("doc_id", "text"),
      "dedup_replay_idx", buckets = 4)
    val batch0 = Seq((10L, a), (21L, b)).toDF("doc_id", "text")
    DedupIndex.flagAndAdmit(spark, "dedup_replay_idx", grow, batch0, 0L, sink)
    def sinkPairs() = spark.read
      .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
      .parquet(sink).select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(sinkPairs() == Set((21L, 10L))) // within-batch flag, 10 admitted
    DedupIndex.forget(spark, grow, Seq(10L).toDF("doc_id"), 1L)
    // the replay must proceed (no IllegalArgumentException) and its
    // rewritten sink must not cite the forgotten witness
    DedupIndex.flagAndAdmit(spark, "dedup_replay_idx", grow, batch0, 0L, sink)
    assert(sinkPairs().isEmpty,
      s"replayed sink must drop the forgotten witness's pairs: ${sinkPairs()}")
    // while the SAME id arriving in a DIFFERENT batch is still a rebirth
    val e = intercept[IllegalArgumentException] {
      DedupIndex.flagAndAdmit(spark, "dedup_replay_idx", grow,
        Seq((10L, "some entirely new document text")).toDF("doc_id", "text"),
        5L, sink)
    }
    assert(e.getMessage.contains("tombstoned"), e.getMessage)
    DedupIndex.drop(spark, "dedup_replay_idx")
  }
}
