package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FingerprintIndexSpec extends SparkSpec {

  import spark.implicits._

  private val Bits = 56

  test("flagAgainst == cross-boundary subset of the monolithic banded pair join") {
    val corpus = Seq((10L, 0xAAAA5555L), (12L, 0x00FF00FF00L))
      .toDF("media_id", "fp")
    val delta = Seq((21L, 0xAAAA5556L), // hamming 2 vs 10
      (22L, 0x123456789AL))             // unrelated
      .toDF("media_id", "fp")
    FingerprintIndex.write(corpus, "media_id", "fp", "fpidx_spec",
      Bits, maxHamming = 7, buckets = 4)
    val flagged = FingerprintIndex.flagAgainst(spark, "fpidx_spec", delta,
        "media_id", "fp", Bits, maxHamming = 7)
      .select("id", "dup_of", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(flagged == Set((21L, 10L, 2L)), s"got $flagged")
    // ground truth: monolithic pairs over the union, cross-boundary
    val all = corpus.unionByName(delta)
    val mono = Dedup.bandedHammingPairs(all, "media_id", "fp", Bits, 7)
      .as[(Long, Long, Long)].collect()
      .collect { case (a, b, h) if a < 20 && b >= 20 => (b, a, h) }
      .toSet
    assert(flagged == mono)
    FingerprintIndex.drop(spark, "fpidx_spec")
  }

  test("flag path never exchanges the stored band table (bucketed layout is load-bearing)") {
    val corpus = (1L to 500L).map(i => (i, i * 0x9E3779B97F4AL & ((1L << 56) - 1)))
      .toDF("media_id", "fp")
    FingerprintIndex.write(corpus, "media_id", "fp", "fpidx_plan",
      Bits, maxHamming = 7, buckets = 4)
    val flagged = FingerprintIndex.flagAgainst(spark, "fpidx_plan",
      Seq((900L, 0x1234L)).toDF("media_id", "fp"),
      "media_id", "fp", Bits, maxHamming = 7)
    flagged.collect()
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
    val underShuffle = nodes.collect {
      case sh: ShuffleExchangeExec => collectAll(sh).collect {
        case fs: FileSourceScanExec if fs.toString.contains("fpidx_plan") => fs
      }
    }.flatten
    assert(underShuffle.isEmpty,
      "stored band table must never sit under a shuffle:\n" +
        flagged.queryExecution.executedPlan)
    FingerprintIndex.drop(spark, "fpidx_plan")
  }

  test("growing index: within-batch greedy keep-one, cross-batch flags, replay idempotent, compact parity") {
    val grow = java.nio.file.Files.createTempDirectory("fpidx_grow").toString
    val sink = java.nio.file.Files.createTempDirectory("fpidx_sink").toString
    FingerprintIndex.write(Seq((10L, 0xAAAAL)).toDF("media_id", "fp"),
      "media_id", "fp", "fpidx_g", Bits, maxHamming = 7, buckets = 4)
    // batch 0: 21 dups base(10); 22+23 mutual dups (greedy: 23 flags
    // with witness 22, which itself survives); 24 novel
    val b0 = Seq((21L, 0xAAABL), (22L, 0x5500FF00L), (23L, 0x5500FF01L),
      (24L, 0x123456789AL)).toDF("media_id", "fp")
    FingerprintIndex.flagAndAdmit(spark, "fpidx_g", grow, b0,
      "media_id", "fp", Bits, 7, 0L, sink)
    def sinkRows() = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(sinkRows() == Set((21L, 10L), (23L, 22L)), sinkRows().toString)
    // batch 1: 31 dups the ADMITTED 22 (extent hit); 32 dups the
    // FLAGGED-never-admitted 23 -> must NOT flag (23 isn't indexed)
    val b1 = Seq((31L, 0x5500FF02L), (32L, 0x5500FF01L)).toDF("media_id", "fp")
    FingerprintIndex.flagAndAdmit(spark, "fpidx_g", grow, b1,
      "media_id", "fp", Bits, 7, 1L, sink)
    val after1 = sinkRows()
    assert(after1.contains((31L, 22L)) && !after1.exists(_._2 == 23L),
      after1.toString)
    // replay batch 1: bit-identical sink
    FingerprintIndex.flagAndAdmit(spark, "fpidx_g", grow, b1,
      "media_id", "fp", Bits, 7, 1L, sink)
    assert(sinkRows() == after1)
    // compact, then a new batch flags against the folded base alone
    FingerprintIndex.compact(spark, "fpidx_g", grow, buckets = 4)
    val fs = new org.apache.hadoop.fs.Path(grow)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      FingerprintIndex.extentPath(grow))))
    FingerprintIndex.flagAndAdmit(spark, "fpidx_g", grow,
      Seq((41L, 0x123456789BL)).toDF("media_id", "fp"), // dups novel 24
      "media_id", "fp", Bits, 7, 2L, sink)
    assert(sinkRows().contains((41L, 24L)))
    FingerprintIndex.drop(spark, "fpidx_g")
  }

  test("forget (image RTBF): tombstoned witness stops flagging; reborn id rejected; compact removes physically") {
    val grow = java.nio.file.Files.createTempDirectory("fpidx_forget").toString
    val sink = java.nio.file.Files.createTempDirectory("fpidx_fsink").toString
    FingerprintIndex.write(
      Seq((10L, 0xAAAAL), (12L, 0x123456789AL)).toDF("media_id", "fp"),
      "media_id", "fp", "fpidx_f", Bits, maxHamming = 7, buckets = 4)
    val batch = Seq((21L, 0xAAABL)).toDF("media_id", "fp") // hd 1 vs 10
    FingerprintIndex.flagAndAdmit(spark, "fpidx_f", grow, batch,
      "media_id", "fp", Bits, 7, 0L, sink)
    def sinkRows() = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(sinkRows() == Set((21L, 10L)))
    // forget image 10 -> replaying the same batch flags nothing
    FingerprintIndex.forget(spark, grow, Seq(10L).toDF("id"), 1L)
    FingerprintIndex.flagAndAdmit(spark, "fpidx_f", grow, batch,
      "media_id", "fp", Bits, 7, 0L, sink)
    assert(sinkRows().isEmpty, s"forgotten witness must not flag: ${sinkRows()}")
    // a batch reusing the tombstoned id is rejected, not mis-paired
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.flagAndAdmit(spark, "fpidx_f", grow,
        Seq((10L, 0x77777L)).toDF("media_id", "fp"),
        "media_id", "fp", Bits, 7, 2L, sink)
    }
    assert(e.getMessage.contains("tombstoned"), e.getMessage)
    // compact applies the tombstone physically and clears the dir
    FingerprintIndex.compact(spark, "fpidx_f", grow, buckets = 4)
    assert(spark.table(FingerprintIndex.bandsTable("fpidx_f"))
      .filter(col("id") === 10L).count() == 0)
    val fs = new org.apache.hadoop.fs.Path(grow)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      FingerprintIndex.tombstonePath(grow))))
    FingerprintIndex.drop(spark, "fpidx_f")
  }

  test("compactTiered: base untouched below threshold, consolidated extent still witnesses, base tombstone survives") {
    val grow = java.nio.file.Files.createTempDirectory("fpidx_tiered").toString
    val sink = java.nio.file.Files.createTempDirectory("fpidx_tsink").toString
    val mask = (1L << Bits) - 1
    def fp(i: Long): Long = (i * 0x9E3779B97F4AL) & mask
    // base 20 items, extent 2 (~10% of base row mass, under 20%)
    val base = (10L to 29L).map(i => (i, fp(i))).toDF("media_id", "fp")
    FingerprintIndex.write(base, "media_id", "fp", "fpidx_t",
      Bits, maxHamming = 7, buckets = 4)
    FingerprintIndex.flagAndAdmit(spark, "fpidx_t", grow,
      Seq((30L, fp(30L)), (31L, fp(31L))).toDF("media_id", "fp"),
      "media_id", "fp", Bits, 7, 0L, sink)
    // forget one BASE id (10) and one EXTENT id (30)
    FingerprintIndex.forget(spark, grow, Seq(10L, 30L).toDF("id"), 1L)
    val pre = warehouseFiles(FingerprintIndex.bandsTable("fpidx_t"))
    FingerprintIndex.compactTiered(spark, "fpidx_t", grow, buckets = 4)
    assert(warehouseFiles(FingerprintIndex.bandsTable("fpidx_t")) == pre)
    val fs = new org.apache.hadoop.fs.Path(grow)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partitions(dir: String): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    val cons = s"batch_id=${graft.api.Lsm.ConsolidatedBatchId}"
    assert(partitions(FingerprintIndex.extentPath(grow)) == Seq(cons))
    assert(partitions(FingerprintIndex.tombstonePath(grow)) == Seq(cons))
    val remaining = spark.read.schema("id LONG")
      .parquet(FingerprintIndex.tombstonePath(grow))
      .select(col("id")).as[Long].collect().toSeq
    assert(remaining == Seq(10L)) // extent-hitting 30 applied physically
    // probes: near-dups of a live base item (11), the forgotten base
    // item (10, still masked via the surviving tombstone), the live
    // consolidated-extent item (31), and the physically-removed
    // extent item (30)
    val probes = Seq((101L, fp(11L) ^ 1L), (102L, fp(10L) ^ 1L),
      (103L, fp(31L) ^ 1L), (104L, fp(30L) ^ 1L)).toDF("media_id", "fp")
    FingerprintIndex.flagAndAdmit(spark, "fpidx_t", grow, probes,
      "media_id", "fp", Bits, 7, 2L, sink)
    val flags = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).filter(col("batch_id") === 2L)
      .select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(flags == Set((101L, 11L), (103L, 31L)), s"got $flags")
    FingerprintIndex.drop(spark, "fpidx_t")
  }

  test("crash-replay of the batch that admitted a later-forgotten item proceeds") {
    val grow = java.nio.file.Files.createTempDirectory("fpidx_replay").toString
    val sink = java.nio.file.Files.createTempDirectory("fpidx_rsink").toString
    FingerprintIndex.write(Seq((12L, 0x123456789AL)).toDF("media_id", "fp"),
      "media_id", "fp", "fpidx_r", Bits, maxHamming = 7, buckets = 4)
    // batch 0 admits novel item 50 and flags 51 against it in-batch
    val b0 = Seq((50L, 0xAAAAL), (51L, 0xAAABL)).toDF("media_id", "fp")
    FingerprintIndex.flagAndAdmit(spark, "fpidx_r", grow, b0,
      "media_id", "fp", Bits, 7, 0L, sink)
    FingerprintIndex.forget(spark, grow, Seq(50L).toDF("id"), 1L)
    // replay of batch 0: exempt (own prior output), sink rewritten
    // without the forgotten witness's pairs
    FingerprintIndex.flagAndAdmit(spark, "fpidx_r", grow, b0,
      "media_id", "fp", Bits, 7, 0L, sink)
    val pairs = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(pairs.isEmpty, s"forgotten witness must not re-enter on replay: $pairs")
    // same id in a DIFFERENT batch is still a rebirth -> rejected
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.flagAndAdmit(spark, "fpidx_r", grow,
        Seq((50L, 0x7777L)).toDF("media_id", "fp"),
        "media_id", "fp", Bits, 7, 5L, sink)
    }
    assert(e.getMessage.contains("tombstoned"), e.getMessage)
    FingerprintIndex.drop(spark, "fpidx_r")
  }
}
