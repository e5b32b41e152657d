package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainReputationSpec extends SparkSpec {
  import spark.implicits._

  // 20 tokens, all stopwords, short words — passes every qualityOk rule
  private val goodText =
    Seq.fill(2)("the a of to and in is it that for").mkString(" ")

  private def repOf(rows: Seq[(Long, String, String)]): Map[String, String] =
    DomainReputation.rollup(rows.toDF("doc_id", "source", "text"))
      .select("source", "reputation").as[(String, String)].collect().toMap

  test("dup farm: internal template redundancy blocks the domain") {
    // 6 identical good docs -> n_dup_extra=5; 5*5 > 6*2 -> blocked,
    // even though every doc passes the per-doc quality filter
    val docs = (0L until 6L).map(i => (i, "dupfarm", goodText)) ++
      (10L until 16L).map(i => (i, "varied", goodText + s" x$i extra y$i"))
    val rep = repOf(docs)
    assert(rep("dupfarm") == "blocked")
    assert(rep("varied") == "clean")
  }

  test("pii hub: any-family hits block the domain; signals count docs once") {
    val docs = (0L until 6L).map(i =>
      (i, "piihub", goodText + s" mail user$i@mail.example")) ++
      (10L until 16L).map(i => (i, "phoney", goodText + " call +1 415 555 0101"))
    val r = DomainReputation.rollup(docs.toDF("doc_id", "source", "text"))
      .select("source", "n_pii_docs", "reputation")
      .as[(String, Long, String)].collect()
      .map { case (s, n, r) => (s, (n, r)) }.toMap
    assert(r("piihub") == (6L, "blocked"))
    assert(r("phoney") == (6L, "blocked"))
  }

  test("threshold boundaries are strict (rate exactly 1/3 and 2/5 stay below)") {
    val bad = "zz" // 1 token < QualityMinTokens
    // riskfive: 5 docs, 2 bad -> 2*5 = 5*2 NOT > -> not blocked;
    //           2*3 > 5*1 -> review
    val riskfive = (0L until 3L).map(i => (i, "riskfive", goodText + s" u$i")) ++
      Seq((3L, "riskfive", bad), (4L, "riskfive", bad + " q"))
    // third: 3 docs, 1 bad -> 1*5 < 3*2; 1*3 = 3*1 NOT > -> clean
    val third = Seq((10L, "third", bad)) ++
      (11L until 13L).map(i => (i, "third", goodText + s" u$i"))
    // hot: 3 docs, 2 bad -> 2*5 > 3*2 -> blocked
    val hot = Seq((20L, "hot", bad), (21L, "hot", bad + " q"),
      (22L, "hot", goodText))
    val rep = repOf(riskfive ++ third ++ hot)
    assert(rep == Map("riskfive" -> "review", "third" -> "clean",
      "hot" -> "blocked"))
  }

  test("streaming twin: frozen-rollup stream-static join equals the batch filter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rep = DomainReputation.rollup(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = DomainReputation.filterWith(docs, rep)
      .select("doc_id", "reputation", "kept")
      .as[(Long, String, Long)].collect().toSet
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamOps.domainFilterStream(
        in.toDF().toDF("doc_id", "source", "text"), rep)
      .writeStream.format("memory").queryName("domain_filter")
      .outputMode("append").start()
    // two arrival batches — the static side re-resolves per batch
    val rows = docs.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val (a, b) = rows.splitAt(rows.length / 2)
    in.addData(a); q.processAllAvailable()
    in.addData(b); q.processAllAvailable()
    q.stop()
    val got = spark.table("domain_filter")
      .select("doc_id", "reputation", "kept")
      .as[(Long, String, Long)].collect().toSet
    rep.unpersist(blocking = true)
    assert(got == batch)
  }

  test("streaming rollup (Complete mode) converges to the batch rollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = DomainReputation.rollup(docs)
      .as[(String, Long, Long, Long, Long, Long, String)].collect().toSet
    val in = MemoryStream[(Long, String, String)]
    val q = DomainReputation.rollupStream(
        in.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("domain_rollup_stream")
      .outputMode(OutputMode.Complete()).start()
    val rows = docs.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val (a, b) = rows.splitAt(rows.length / 3)
    in.addData(a); q.processAllAvailable()
    in.addData(b); q.processAllAvailable()
    q.stop()
    val got = spark.table("domain_rollup_stream")
      .as[(String, Long, Long, Long, Long, Long, String)].collect().toSet
    assert(got == batch)
  }

  test("sketched rollup stream: bounded state, exact while under-full (r15 KMV swap)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = DomainReputation.rollup(docs)
      .as[(String, Long, Long, Long, Long, Long, String)].collect().toSet
    val in = MemoryStream[(Long, String, String)]
    // k = 4096 >> any domain's distinct docs at sf0.001: the sketch is
    // under-full everywhere, so the final emission must equal the
    // exact batch rollup bit-for-bit
    val q = DomainReputation.rollupStreamSketched(
        in.toDF().toDF("doc_id", "source", "text"), k = 4096)
      .writeStream.format("memory").queryName("domain_rollup_kmv")
      .outputMode(OutputMode.Update()).start()
    val rows = docs.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val (a, b) = rows.splitAt(rows.length / 3)
    in.addData(a); q.processAllAvailable()
    in.addData(b); q.processAllAvailable()
    q.stop()
    // Update mode re-emits a domain's row each batch it changes in —
    // the final state is the row with the largest n_docs per domain
    val got = spark.table("domain_rollup_kmv")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map(_._2.maxBy(_._2)).toSet
    assert(got == batch)
  }

  test("sketched rollup: the full sketch estimates dups within KMV error, counters stay exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // a template farm: 3000 docs but only 300 distinct texts — with
    // k=64 the sketch saturates, n_dup_extra reads from the KMV
    // estimate (~1/sqrt(64) = 12.5% relative error class), and the
    // state stays 64 longs where collect_set would hold 300
    val distinctTexts = (0 until 300).map(i => goodText + s" farm variant $i")
    val rows = (0 until 3000).map(i => (i.toLong, "farm", distinctTexts(i % 300)))
    val in = MemoryStream[(Long, String, String)]
    val q = DomainReputation.rollupStreamSketched(
        in.toDF().toDF("doc_id", "source", "text"), k = 64)
      .writeStream.format("memory").queryName("domain_rollup_kmv_full")
      .outputMode(OutputMode.Update()).start()
    in.addData(rows); q.processAllAvailable()
    q.stop()
    val got = spark.table("domain_rollup_kmv_full")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .maxBy(_._2)
    assert(got._2 == 3000L, "n_docs exact")
    assert(got._3 == 0L && got._5 == 0L, "quality/PII counters exact")
    // ground truth = the batch rollup's EXACT count_distinct over the
    // same fingerprint signal (the rolling fingerprint itself collides
    // on number-suffix variants — the sketch must track the signal it
    // actually sees, not the text cardinality)
    val exact = DomainReputation.rollup(rows.toDF("doc_id", "source", "text"))
      .as[(String, Long, Long, Long, Long, Long, String)].collect().head
    val exactDistinct = exact._2 - exact._4
    val estDistinct = got._2 - got._4
    assert(math.abs(estDistinct - exactDistinct) <= exactDistinct / 4,
      s"KMV distinct read $estDistinct, exact $exactDistinct (want +-25%)")
  }

  test("kmv bottom-k state: bounded, deduplicating, exact under-full (unit)") {
    val k = 8
    var b = Vector.empty[Long]
    val hs = Seq(50L, 10L, 30L, 10L, 90L, 70L, 20L, 40L, 60L, 80L, 5L, 30L)
    hs.foreach(h => b = DomainReputation.kmvInsert(b, h, k))
    assert(b.length <= k, "state must stay bounded by k")
    assert(b == b.sorted && b.distinct == b, "sorted, deduplicated")
    // the bottom 8 of the 10 distinct values
    assert(b == Vector(5L, 10L, 20L, 30L, 40L, 50L, 60L, 70L))
    // under-full: exact count of distinct insertions
    var u = Vector.empty[Long]
    Seq(3L, 1L, 3L, 2L).foreach(h => u = DomainReputation.kmvInsert(u, h, k))
    assert(DomainReputation.kmvDistinct(u, k) == 3L)
  }

  test("filterWith: blocked domains drop wholesale; review keeps only quality-ok docs") {
    val docs = Seq(
      (0L, "okdom", goodText), (1L, "okdom", goodText + " u1"),
      (2L, "okdom", goodText + " u2"),
      (10L, "revdom", "zz"), (13L, "revdom", "zz q"),
      (11L, "revdom", goodText + " a1"), (12L, "revdom", goodText + " a2"),
      (14L, "revdom", goodText + " a3"), // 2 bad of 5: review

      (20L, "blockdom", "zz"), (21L, "blockdom", "zz q"),
      (22L, "blockdom", goodText)).toDF("doc_id", "source", "text")
    val rep = DomainReputation.rollup(docs)
    val out = DomainReputation.filterWith(docs, rep)
      .select("doc_id", "reputation", "kept")
      .as[(Long, String, Long)].collect()
      .map { case (d, r, k) => (d, (r, k)) }.toMap
    assert(out(0L) == (("clean", 1L)))
    assert(out(10L) == (("review", 0L))) // fails per-doc quality
    assert(out(11L) == (("review", 1L)))
    assert(out(20L) == (("blocked", 0L)))
    assert(out(22L) == (("blocked", 0L))) // quality-ok doc, blocked domain
  }

  test("unknown domain (absent from the frozen rollup) surfaces, not-blocked") {
    // review r14 #2: a domain first crawled AFTER the rollup refresh
    // has no reputation row — its docs must flow through as `unknown`
    // with per-doc rules still applied, never silently vanish
    val trained = Seq((0L, "olddom", goodText), (1L, "olddom", goodText + " u"))
      .toDF("doc_id", "source", "text")
    val rep = DomainReputation.rollup(trained)
    val arriving = Seq(
      (10L, "olddom", goodText),
      (11L, "newdom", goodText), // quality-ok, unknown domain
      (12L, "newdom", "zz")      // quality-bad, unknown domain
    ).toDF("doc_id", "source", "text")
    val out = DomainReputation.filterWith(arriving, rep)
      .select("doc_id", "reputation", "kept")
      .as[(Long, String, Long)].collect()
      .map { case (d, r, k) => (d, (r, k)) }.toMap
    assert(out.size == 3)
    assert(out(10L) == (("clean", 1L)))
    assert(out(11L) == (("unknown", 1L)))
    assert(out(12L) == (("unknown", 0L)))
  }
}
