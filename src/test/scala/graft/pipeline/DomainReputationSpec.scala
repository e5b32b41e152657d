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
