package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{array_distinct, col, explode, expr, lit, pmod, slice}
import org.apache.spark.sql.streaming.OutputMode

/** Unbounded-execution tests: the batch corpus pins windowed semantics
  * (oracle-checked); these pin the genuinely-streaming behaviors —
  * incremental processing, watermark late-data drop, stateful dedup,
  * custom mapGroupsWithState state evolution. */
class StreamOpsSpec extends SparkSpec {

  import StreamOps.{Event, UserStat}

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "click",
      value: Double = 1.0): Event =
    Event(id, ts(minute), user, typ, value, "{}")

  test("tumbling window aggregation over a stream (append after watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val agg = StreamOps.tumblingAggStream(in.toDF(), "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("tumbling").start()
    in.addData(ev(1, 0), ev(2, 5), ev(3, 59, typ = "view"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumbling").as[(Long, String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val hour = ts(0).getTime / 1000
    assert(got == Seq((hour, "click", 2L, 2.0), (hour, "view", 1L, 1.0)))
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val agg = StreamOps.tumblingAggStream(in.toDF(), "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late").start()
    // batch 1: events in window [10:00,10:10); max ts 10:29 -> watermark 10:24
    in.addData(ev(1, 0), ev(2, 29))
    q.processAllAvailable()
    // batch 2: a late event for the already-closed [10:00,10:10) window
    in.addData(ev(3, 1))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to emit remaining windows
    in.addData(ev(4, 59))
    q.processAllAvailable(); q.stop()
    val got = spark.table("late").as[(Long, String, Long, Double)].collect()
    val w0 = got.find(_._1 == ts(0).getTime / 1000)
    // the late event (id=3) must NOT be counted: window [10:00,10:10) has 1 event
    assert(w0.exists(_._3 == 1L), s"late event leaked into closed window: ${got.toSeq}")
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val dedup = StreamOps.dedupStream(in.toDF(), "1 hour")
    val q = dedup.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup").start()
    in.addData(ev(1, 0), ev(1, 0), ev(2, 5))
    q.processAllAvailable()
    in.addData(ev(2, 6), ev(3, 7)) // id=2 repeats across batches
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").count() == 3)
  }

  test("near-dup stream drops simhash-colliding rewordings, keeps distinct docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val near = StreamOps.dedupNearStream(
      in.toDF().toDF("ts", "text"), "ts", "text", "1 hour")
    val q = near.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("neardup").start()
    // batch-side ground truth: the stream must drop exactly the docs
    // whose simhash was already seen (same codegen'd expression)
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and twice" // simhash-equal near-copy
    val c = "completely different words about spark catalyst tungsten shuffles"
    val sh = Seq(a, b, c).toDF("text")
      .select(graft.dedup.Dedup.simhash(col("text"))).as[Long].collect()
    assert(sh(0) == sh(1) && sh(0) != sh(2), sh.toSeq.toString) // fixture sanity
    in.addData((ts(0), a), (ts(1), b), (ts(2), c))
    q.processAllAvailable()
    in.addData((ts(3), a)) // replay across batches — state remembers
    q.processAllAvailable(); q.stop()
    assert(spark.table("neardup").as[(Timestamp, String)].collect()
      .map(_._2).sorted.toSeq == Seq(a, c).sorted)
  }

  test("min_by/max_by attribution aggregation runs unchanged on a stream (update mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{min_by, max_by, struct, count, lit}
    val in = MemoryStream[Event]
    // the same arg-extremum aggregation q_attribution uses in batch,
    // executed incrementally: update mode re-emits the refined row
    val agg = in.toDF()
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"), struct(col("sec"), col("event_id"))).as("first_touch"),
        max_by(col("event_type"), struct(col("sec"), col("event_id"))).as("last_touch"),
        count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("attrib").start()
    in.addData(ev(1, 5, typ = "click"), ev(2, 9, typ = "cart"))
    q.processAllAvailable()
    in.addData(ev(3, 2, typ = "view"), ev(4, 12, typ = "purchase"))
    q.processAllAvailable(); q.stop()
    // last update-mode emission reflects all four events
    val last = spark.table("attrib")
      .as[(Long, String, String, Long)].collect().toSeq.last
    assert(last == ((1L, "view", "purchase", 4L)))
  }

  test("session windows merge events within gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sess = StreamOps.sessionAggStream(in.toDF(), "10 minutes", "5 minutes")
    val q = sess.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sessions").start()
    // user 1: events at 10:00,10:03,10:06 (one session), 10:30 (new session)
    in.addData(ev(1, 0), ev(2, 3), ev(3, 6), ev(4, 30))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions").as[(Long, Long, Long)]
      .collect().sortBy(_._2).toSeq
    assert(got.map(_._3) == Seq(3L, 1L))
  }

  test("mapGroupsWithState evolves per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val stats = StreamOps.runningUserStats(in.toDS())
    val q = stats.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("userstats").start()
    in.addData(ev(1, 0, user = 7, value = 2.0), ev(2, 1, user = 7, value = 3.0))
    q.processAllAvailable()
    in.addData(ev(3, 2, user = 7, value = 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("userstats").as[UserStat].collect()
    // last emitted state for user 7 must reflect all 3 events
    assert(rows.exists(s => s.user_id == 7 && s.n_events == 3 && s.total_value == 10.0),
      rows.toSeq.toString)
  }

  test("file stream over the real events parquet processes end-to-end") {
    // the streaming file source needs a directory; link the real file in
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"))
    val stream = StreamOps.readEventStream(spark, dir.toString)
    assert(stream.isStreaming)
    val agg = StreamOps.tumblingAggStream(stream, "1 hour", "1 day")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("filestream").start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("filestream").count()
    assert(n > 0 && n <= 31 * 5) // bounded by days x event types
  }

  test("flatMapGroupsWithState sessionizer emits sessions after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = StreamOps.sessionizeWithState(in.toDS(), "5 minutes",
      gapMillis = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fmgws").start()
    // one session for user 1: events at 10:00 and 10:10
    in.addData(ev(1, 0), ev(2, 10))
    q.processAllAvailable()
    // far-future event advances the watermark past the session's gap
    in.addData(Event(99, Timestamp.valueOf("2024-01-02 10:00:00"), 2L,
      "click", 1.0, "{}"))
    q.processAllAvailable()
    in.addData(Event(100, Timestamp.valueOf("2024-01-03 10:00:00"), 2L,
      "click", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("fmgws").as[StreamOps.Session].collect()
    assert(got.exists(s => s.user_id == 1 && s.n_events == 2),
      s"expected user 1's closed session, got ${got.toSeq}")
  }

  test("sessionizer merges late events by overlap, not only into the newest session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = StreamOps.sessionizeWithState(in.toDS(), "10 hours",
      gapMillis = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fmgws_late").start()
    // two open sessions for user 1: 10:00 and 11:00 (> 30 min apart)
    in.addData(ev(1, 0), ev(2, 60))
    q.processAllAvailable()
    // late event at 10:10 belongs to the OLD session (10:00), not the
    // newest (11:00); then 10:40 bridges both into one session
    in.addData(ev(3, 10))
    q.processAllAvailable()
    in.addData(ev(4, 40))
    q.processAllAvailable()
    // advance the watermark far enough to flush
    in.addData(Event(99, Timestamp.valueOf("2024-01-03 10:00:00"), 2L,
      "click", 1.0, "{}"))
    q.processAllAvailable()
    in.addData(Event(100, Timestamp.valueOf("2024-01-04 10:00:00"), 2L,
      "click", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("fmgws_late").as[StreamOps.Session].collect()
      .filter(_.user_id == 1)
    assert(got.length == 1 && got.head.n_events == 4,
      s"expected one merged 4-event session, got ${got.toSeq}")
  }

  test("pipeline split/sample expressions run unchanged on a stream") {
    import spark.implicits._
    import graft.pipeline.Sampling
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val labeled = in.toDS().toDF()
      .withColumn("split", Sampling.splitLabel(col("event_id")))
      .filter(Sampling.sampleFilter(col("event_id"), keep = 1000)) // keep all
    val q = labeled.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_split").start()
    in.addData((1L to 50L).map(i => ev(i, i.toInt)): _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_split")
      .select("event_id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 50)
    // identical assignment to the batch expression
    val batch = (1L to 50L).toDF("event_id")
      .select(col("event_id"), Sampling.splitLabel(col("event_id")).as("split"))
      .as[(Long, String)].collect().toMap
    assert(got == batch)
  }

  test("normalization + blocklist expressions run unchanged on a stream (per-row, stateless)") {
    import spark.implicits._
    import graft.text.TextFunctions
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val flagged = in.toDS().toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.normalizeText(col("text")).as("norm"),
        org.apache.spark.sql.functions.array_intersect(
          TextFunctions.shingles(col("text")),
          org.apache.spark.sql.functions.array(
            graft.ops.TextOps.Blocklist.map(lit): _*)).as("hits"))
    val q = flagged.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_norm").start()
    in.addData(
      (1L, "é  big order scan here"),
      (2L, "\talready clean text"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_norm").orderBy("doc_id")
      .select("norm", "hits").as[(String, Seq[String])].collect()
    assert(got(0)._1 == "é big order scan here")
    assert(got(0)._2 == Seq("big order scan"))
    assert(got(1) == (("already clean text", Seq())))
  }

  test("token-window chunking runs unchanged on a stream (per-row, stateless)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val chunked = graft.pipeline.Chunking.chunkTokens(
      in.toDF().toDF("doc_id", "text"), chunkSize = 4, stride = 3)
    val q = chunked.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_chunks").start()
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    in.addData((1L, text), (2L, text))
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_chunks")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = graft.pipeline.Chunking.chunkTokens(
      Seq((1L, text), (2L, text)).toDF("doc_id", "text"), 4, 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == batch && got.size == 8) // ceil(10/3)=4 windows per doc
  }

  test("stream-stream interval join matches purchases to preceding clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val left = clicks.toDF()
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("ts"))
    val right = purchases.toDF()
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("ts"))
    val joined = StreamOps.intervalJoin(left, right,
      "10 minutes", "10 minutes",
      col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 10 MINUTES"))
      .select(col("cu"), col("cts"), col("pts"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sjoin").start()
    // user 1 clicks at 10:00, purchases at 10:05 (match) and 10:30 (no match)
    clicks.addData(ev(1, 0, user = 1), ev(2, 0, user = 2))
    purchases.addData(ev(10, 5, user = 1, typ = "purchase"),
      ev(11, 30, user = 1, typ = "purchase"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sjoin").collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L, got.toSeq.toString)
  }

  test("parquet streaming sink writes append-mode files") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink")
    val in = MemoryStream[Event]
    val agg = in.toDF().withWatermark("ts", "1 minute")
      .select(col("event_id"), col("user_id"), col("value"))
    val q = StreamOps.writeParquetStream(agg, s"$dir/out", s"$dir/ckpt")
    in.addData(ev(1, 0), ev(2, 5))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }

  test("file source -> parquet sink recovers from an existing checkpoint") {
    // e2e restart: batch 1 processed, query STOPPED, batch 2 lands, a
    // NEW query starts against the SAME checkpoint — it must resume
    // from the recorded file offset: batch 1 files are not reprocessed
    // (no duplicate output rows) and batch 2 is picked up exactly once
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
    val (src, sink, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    def writeBatch(ids: Seq[Long]): Unit =
      ids.map(i => (i, i * 60000000000L, i % 7, "click", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(src)

    writeBatch(1L to 20L)
    val events = StreamOps.readEventStream(spark, src)
      .select(col("event_id"), col("user_id"), col("ts"))
    val q1 = StreamOps.writeParquetStream(events, sink, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(sink).count() == 20)

    writeBatch(21L to 30L)
    val q2 = StreamOps.writeParquetStream(
      StreamOps.readEventStream(spark, src)
        .select(col("event_id"), col("user_id"), col("ts")), sink, ckpt)
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(sink).select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(got == (1L to 30L), s"restart must not duplicate or drop: $got")
  }

  test("incremental dedup stream flags micro-batches against a persisted index, resumes from checkpoint") {
    // e2e of the production "is today's crawl already in the corpus"
    // loop: index written ONCE from the corpus; delta docs arrive as
    // parquet files; each micro-batch is flagged via foreachBatch into
    // a batch_id-partitioned sink; a restart against the same
    // checkpoint must not re-flag batch 1 and must pick up batch 2.
    import spark.implicits._
    // the DedupIndexSpec LSH fixture: a~b near-dups, c disjoint
    val a = "zulu oscar charlie amber basil india papa whiskey victor dune bravo juliet cedar sierra"
    val b = "zulu oscar charlie amber basil india papa whiskey victor dune bravo tango xray quebec"
    val c = "mike november romeo uniform yankee foxtrot golf kilo echo delta"
    graft.dedup.DedupIndex.write(
      Seq((10L, a), (12L, c)).toDF("doc_id", "text"), "dedup_idx_stream", buckets = 4)

    val root = java.nio.file.Files.createTempDirectory("graft-idxstream")
    val (src, sink, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    def writeDelta(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(src)
    def startQuery() = StreamOps.flagAgainstIndexStream(spark, "dedup_idx_stream",
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src),
      sink, ckpt, 0.5)

    writeDelta(Seq((21L, b), (22L, "hotel alpha lima sierra tango unused words here again ok")))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val got1 = spark.read.parquet(sink)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(got1 == Set((21L, 10L)), s"batch 1: $got1")

    writeDelta(Seq((23L, b), (24L, "papa golf kilo echo unrelated filler words entirely new")))
    val q2 = startQuery() // NEW query, SAME checkpoint: resume, don't replay
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.read.parquet(sink)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSeq
    // batch 1's flag appears exactly ONCE (no reprocessing), batch 2's
    // near-dup (23 vs indexed 10) exactly once
    assert(got2.sorted == Seq((21L, 10L), (23L, 10L)), s"after resume: $got2")
    graft.dedup.DedupIndex.drop(spark, "dedup_idx_stream")
  }

  test("growing dedup stream admits survivors and flags later batches against them") {
    // e2e of the GROWING "corpus grows with the crawl" loop (VERDICT
    // r7 #4): batch 1 admits a new doc (and greedily drops its
    // within-batch near-copy); after a checkpoint restart, batch 2's
    // near-copy of the ADMITTED doc is flagged against it; compaction
    // folds the extents into the bucketed base and the flag still
    // resolves from the base alone.
    import spark.implicits._
    val a = "zulu oscar charlie amber basil india papa whiskey victor dune bravo juliet cedar sierra"
    val b = "zulu oscar charlie amber basil india papa whiskey victor dune bravo tango xray quebec"
    val c = "mike november romeo uniform yankee foxtrot golf kilo echo delta"
    // d-family: fresh vocabulary, same 11-of-14-words overlap shape as
    // a/b (9 of 15 distinct 3-shingles shared = Jaccard 0.6 >= 0.5)
    val d = "argon bismuth cobalt dysprosium erbium fermium gallium hafnium iridium krypton lithium mercury neon osmium"
    val d2 = "argon bismuth cobalt dysprosium erbium fermium gallium hafnium iridium krypton lithium radon sulfur tantalum"
    val d3 = "argon bismuth cobalt dysprosium erbium fermium gallium hafnium iridium krypton lithium uranium vanadium wolfram"
    val d4 = "argon bismuth cobalt dysprosium erbium fermium gallium hafnium iridium krypton lithium xenon ytterbium zirconium"
    graft.dedup.DedupIndex.write(
      Seq((10L, a), (12L, c)).toDF("doc_id", "text"), "dedup_idx_grow", buckets = 4)

    val root = java.nio.file.Files.createTempDirectory("graft-growstream")
    val (src, sink, ckpt, grow) = (s"$root/src", s"$root/out", s"$root/ckpt", s"$root/grow")
    def writeDelta(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(src)
    def startQuery() = StreamOps.growIndexStream(spark, "dedup_idx_grow", grow,
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src),
      sink, ckpt, 0.5)

    // batch 1: d is new (admitted); d2 is its within-batch near-copy
    // (dropped with the smaller id as witness)
    writeDelta(Seq((21L, d), (22L, d2)))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val got1 = spark.read.parquet(sink)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(got1 == Set((22L, 21L)), s"batch 1: $got1")

    // batch 2 after a restart from the same checkpoint: d3 must flag
    // against doc 21 ADMITTED IN BATCH 1 (not in the base index), b
    // against the base corpus, and the unrelated doc is admitted
    writeDelta(Seq((23L, d3), (24L, b),
      (25L, "quinoa basmati farro millet barley sorghum teff amaranth buckwheat spelt")))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.read.parquet(sink)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSeq.sorted
    assert(got2 == Seq((22L, 21L), (23L, 21L), (24L, 10L)), s"after resume: $got2")

    // compact: extents fold into the bucketed base and are deleted;
    // a plain flagAgainst (base tables only) now sees doc 21
    graft.dedup.DedupIndex.compact(spark, "dedup_idx_grow", grow, buckets = 4)
    val fs = new org.apache.hadoop.fs.Path(grow)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      graft.dedup.DedupIndex.extentBandsPath(grow))), "bands extents not deleted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      graft.dedup.DedupIndex.extentSvPath(grow))), "sv extents not deleted")
    val compacted = spark.table(graft.dedup.DedupIndex.svTable("dedup_idx_grow"))
      .select("doc_id").as[Long].collect().toSet
    assert(compacted == Set(10L, 12L, 21L, 25L), s"compacted corpus: $compacted")
    val flagged = graft.dedup.DedupIndex.flagAgainst(spark, "dedup_idx_grow",
      Seq((31L, d4)).toDF("doc_id", "text"), 0.5)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(flagged == Set((31L, 21L)), s"post-compact flag: $flagged")
    graft.dedup.DedupIndex.drop(spark, "dedup_idx_grow")
  }

  test("batch and streaming tumbling agg agree on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(ev(1, 0), ev(2, 5), ev(3, 59, typ = "view"), ev(4, 61))
    val batch = StreamOps.tumblingAgg(data.toDF(), "1 hour")
      .as[(Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val in = MemoryStream[Event]
    val q = StreamOps.tumblingAggStream(in.toDF(), "10 minutes", "1 hour")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("parity").start()
    in.addData(data: _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("parity").as[(Long, String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(batch == stream)
  }

  test("transformWithState running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // TWS requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val q = StreamOps.runningTotals(in.toDF())
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("tws").start()
      in.addData(ev(1, 0, user = 1, value = 1.5), ev(2, 1, user = 1, value = 2.0),
        ev(3, 2, user = 2, value = 10.0))
      q.processAllAvailable()
      in.addData(ev(4, 3, user = 1, value = 0.25))
      q.processAllAvailable(); q.stop()
      val got = spark.table("tws").as[(Long, Long, Double)].collect()
      // last emission per key carries the full running state
      val last = got.groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last(1L) == ((1L, 3L, 3.75)), s"got ${got.toSeq}")
      assert(last(2L) == ((2L, 1L, 10.0)), s"got ${got.toSeq}")
      // exactness parity with the batch aggregate (cents discipline)
      val batchTotal = Seq(1.5, 2.0, 0.25).map(v => math.round(v * 100)).sum / 100.0
      assert(last(1L)._3 == batchTotal)
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("pattern stream counts first->second matches across batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val out = StreamOps.patternMatchStream(in.toDS(), "click", "purchase", 3600L)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("patterns").start()
    // batch 1: click at :00 — no match yet
    in.addData(ev(1, 0))
    q.processAllAvailable()
    // batch 2: purchase at :10 — the pattern STRADDLES the boundary;
    // then a view breaks adjacency, so the next purchase is no match
    in.addData(ev(2, 10, typ = "purchase"), ev(3, 20, typ = "view"),
      ev(4, 25, typ = "purchase"))
    q.processAllAvailable()
    // batch 3: click then purchase within the same batch — second match
    in.addData(ev(5, 30), ev(6, 31, typ = "purchase"))
    q.processAllAvailable(); q.stop()
    val last = spark.table("patterns").as[StreamOps.PatternMatch]
      .collect().filter(_.user_id == 1L)
    assert(last.map(_.n_matches).max == 2L, last.toSeq.toString)
  }

  test("funnel stream matches the batch stage machine, patterns straddling batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      // user 1 completes the funnel across THREE batches
      ev(1, 0, user = 1, typ = "signup"), ev(2, 5, user = 1),
      ev(3, 10, user = 1, typ = "purchase"),
      // user 2: signup then click outside the 600s window
      ev(4, 0, user = 2, typ = "signup"), ev(5, 20, user = 2),
      // user 3: reset by signup between click and purchase
      ev(6, 0, user = 3, typ = "signup"), ev(7, 1, user = 3),
      ev(8, 2, user = 3, typ = "signup"), ev(9, 3, user = 3, typ = "purchase"))
    val in = MemoryStream[Event]
    val q = StreamOps.funnelStream(in.toDS(), boundSec = 600L)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnelstream").start()
    events.grouped(3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("funnelstream")
      .as[StreamOps.FunnelStage].collect()
      .groupBy(_.user_id).map { case (u, ss) => u -> ss.map(_.stage).max }
    val batch = Events.funnelStages(
      events.map(e => (e.user_id, e.event_id, e.event_type, e.ts.getTime / 1000))
        .toDF("user_id", "event_id", "event_type", "sec"), bound = 600L)
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("funnel state expires after the bound; a late event restarts at stage 0") {
    // VERDICT r8 #3: unbounded user cardinality must not grow the
    // state store forever. boundSec is the TTL: once the watermark
    // passes last-event + boundSec, the user's state is dropped.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // in-order feed, so a zero-delay watermark is exact here
    val q = StreamOps.funnelStream(in.toDS(), boundSec = 600L,
        watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_ttl").start()
    // user 1 reaches stage 2 by minute 1
    in.addData(ev(1, 0, typ = "signup"), ev(2, 1))
    q.processAllAvailable()
    // user 2 at minute 30 pushes the watermark past 1min + 600s
    in.addData(ev(3, 30, user = 2L))
    q.processAllAvailable()
    // next batch runs the timeout: user 1's state is emitted once
    // more (stage 2) and REMOVED
    in.addData(ev(4, 31, user = 2L))
    q.processAllAvailable()
    // user 1 returns with a purchase: restarted state is (0, 0), and
    // a purchase cannot advance stage 0 -> emitted stage must be 0.
    // (Un-expired old state would also emit — entry is 25min stale —
    // but via the stage-2 'sec - entry > bound' branch; the pinned
    // distinction is the state REMOVAL path, observed below.)
    in.addData(ev(5, 32, typ = "purchase"))
    q.processAllAvailable(); q.stop()
    val u1 = spark.table("funnel_ttl").as[StreamOps.FunnelStage]
      .collect().filter(_.user_id == 1L).map(_.stage).toSeq
    // emissions: batch1 (stage 2), timeout (stage 2), restart (stage 0)
    assert(u1.sorted == Seq(0L, 2L, 2L), u1.toString)
    // pattern counter: same TTL discipline; count restarts per journey
    val pin = MemoryStream[Event]
    val pq = StreamOps.patternMatchStream(pin.toDS(), "click", "purchase", 600L,
        watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("patterns_ttl").start()
    pin.addData(ev(1, 0), ev(2, 1, typ = "purchase")) // match -> m=1
    pq.processAllAvailable()
    pin.addData(ev(3, 30, user = 2L)) // watermark past 1min + 600s
    pq.processAllAvailable()
    pin.addData(ev(4, 31, user = 2L)) // timeout fires: final m=1, state gone
    pq.processAllAvailable()
    pin.addData(ev(5, 32), ev(6, 33, typ = "purchase")) // fresh journey -> m=1
    pq.processAllAvailable(); pq.stop()
    val u1p = spark.table("patterns_ttl").as[StreamOps.PatternMatch]
      .collect().filter(_.user_id == 1L).map(_.n_matches).toSeq
    // un-expired state would make the last emission m=2; per-journey
    // restart keeps every emission at 1 (initial, timeout-final, fresh)
    assert(u1p.sorted == Seq(1L, 1L, 1L), u1p.toString)
  }

  test("sub-second events fold in batch order: (truncated second, event_id), not arrival millis") {
    // ADVICE r8: the driver's timestamps are microsecond-precision,
    // but both batch twins order by (TRUNCATED second, event_id) — so
    // two same-second events whose event_id order OPPOSES their
    // sub-second order must fold by event_id in the stream too.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = ts(30).getTime
    def evMs(id: Long, offMs: Long, typ: String, user: Long = 1L): Event =
      Event(id, new Timestamp(base + offMs), user, typ, 1.0, "{}")
    // user 1 funnel: click (id 1) at +900ms, signup (id 2) at +500ms —
    // same second. Batch folds click first (no-op at stage 0) then
    // signup -> final stage 1. A millis-ordered fold would see signup
    // first, then the click in the same second -> stage 2 (wrong).
    val funnelEvents = Seq(
      evMs(1, 900, "click"), evMs(2, 500, "signup"))
    val fin = MemoryStream[Event]
    val fq = StreamOps.funnelStream(fin.toDS(), boundSec = 600L)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_subsec").start()
    fin.addData(funnelEvents: _*); fq.processAllAvailable(); fq.stop()
    val fStream = spark.table("funnel_subsec").as[StreamOps.FunnelStage]
      .collect().map(_.stage).max
    val fBatch = Events.funnelStages(
      funnelEvents.map(e => (e.user_id, e.event_id, e.event_type, e.ts.getTime / 1000))
        .toDF("user_id", "event_id", "event_type", "sec"), bound = 600L)
      .as[(Long, Long)].collect().head._2
    assert(fBatch == 1L, s"batch twin should end at stage 1, got $fBatch")
    assert(fStream == fBatch, s"stream=$fStream batch=$fBatch")
    // pattern counter: purchase (id 1) at +900ms, click (id 2) at
    // +100ms — batch order (purchase, click) has NO click->purchase
    // adjacency; millis order would count one match.
    val patEvents = Seq(
      evMs(1, 900, "purchase", user = 2L), evMs(2, 100, "click", user = 2L))
    val pin = MemoryStream[Event]
    val pq = StreamOps.patternMatchStream(pin.toDS(), "click", "purchase", 3600L)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("patterns_subsec").start()
    pin.addData(patEvents: _*); pq.processAllAvailable(); pq.stop()
    val matches = spark.table("patterns_subsec").as[StreamOps.PatternMatch]
      .collect().map(_.n_matches).max
    assert(matches == 0L, s"same-second id-order adjacency must match batch: $matches")
  }

  test("pattern stream final counts equal the batch directly-follows cell") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(1, 0, user = 1), ev(2, 5, user = 1, typ = "purchase"),
      ev(3, 6, user = 1), ev(4, 7, user = 1, typ = "purchase"),
      ev(5, 0, user = 2, typ = "purchase"), ev(6, 1, user = 2),
      ev(7, 2, user = 2, typ = "view"), ev(8, 3, user = 2, typ = "purchase"))
    val in = MemoryStream[Event]
    val out = StreamOps.patternMatchStream(in.toDS(), "click", "purchase", 3600L)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("patterns_parity").start()
    events.grouped(3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("patterns_parity")
      .as[StreamOps.PatternMatch].collect()
      .groupBy(_.user_id).map { case (u, ms) => u -> ms.map(_.n_matches).max }
    // batch twin: lag() directly-follows count of (click -> purchase)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val batch = events.toDF()
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("ts").cast("long")).as("sec"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev") === "click" && col("event_type") === "purchase")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    // the stream also emits zero-count users (state exists, no match);
    // the batch filter drops them — compare the matched set
    assert(streamed.filter(_._2 > 0) == batch, s"streamed=$streamed batch=$batch")
  }

  test("vector admission stream grows the served IVF index across restarts") {
    // the ANN twin of the growing dedup stream: vectors admitted by a
    // streaming crawl are served by searchGrown, a restart resumes
    // from the checkpoint without re-admitting, and compaction folds
    // extents into the base so plain search() sees them
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0),
      "ivf_grow_stream", nlist = 8, iterations = 2)

    val root = java.nio.file.Files.createTempDirectory("graft-ivfstream")
    val (src, ckpt, grow) = (s"$root/src", s"$root/ckpt", s"$root/grow")
    def startQuery() = StreamOps.admitVectorsStream(spark, "ivf_grow_stream",
      grow, spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .parquet(src), ckpt)
    val queries = emb.filter(col("vec_id") < 4)

    // batch 1: odd vectors vec_id%4==1 plus an exact copy of query 0
    emb.filter(pmod(col("vec_id"), lit(4)) === 1)
      .unionByName(emb.filter(col("vec_id") === 0)
        .select(lit(999001L).as("vec_id"), col("embedding")))
      .write.mode("append").parquet(src)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    val top1 = graft.sim.IvfIndex.searchGrown(spark, "ivf_grow_stream", grow,
      queries, 3).filter(col("qid") === 0 && col("rk") === 1)
      .select("cid", "sim").as[(Long, Double)].collect().head
    assert(top1 == ((999001L, 1.0)), s"planted dup must be top-1: $top1")

    // batch 2 after restart: the remaining odds; prior admissions survive
    emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .write.mode("append").parquet(src)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val grown = graft.sim.IvfIndex.searchGrown(spark, "ivf_grow_stream", grow,
      queries, 3).orderBy("qid", "rk").collect().toSeq
    assert(grown.exists(_.getLong(1) == 999001L), "batch-1 admission lost")

    // compact with the stream stopped: extents fold into the base and
    // plain search answers identically
    graft.sim.IvfIndex.compact(spark, "ivf_grow_stream", grow)
    val served = graft.sim.IvfIndex.search(spark, "ivf_grow_stream",
      queries, 3).orderBy("qid", "rk").collect().toSeq
    assert(served == grown, s"post-compact drift: $served vs $grown")

    spark.sql("DROP TABLE IF EXISTS ivf_grow_stream")
    spark.sql("DROP TABLE IF EXISTS ivf_grow_stream_centroids")
  }

  test("image dedup stream: crawl batches flag perceptual near-dups against the growing fingerprint store") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // index = images of the first 60 docs
    val baseMedia = graft.multimodal.Multimodal.asMediaTable(docs.limit(60))
    graft.dedup.FingerprintIndex.write(
      graft.multimodal.Multimodal.imageFingerprints(baseMedia),
      "media_id", "fp", "img_stream_idx",
      graft.functions.ImageHash.DHashBits, maxHamming = 7, buckets = 4)
    val root = java.nio.file.Files.createTempDirectory("graft-imgstream")
    val (src, ckpt, grow, sink) =
      (s"$root/src", s"$root/ckpt", s"$root/grow", s"$root/sink")
    def startQuery() = StreamOps.imageDedupStream(spark, "img_stream_idx",
      grow, spark.readStream
        .schema("media_id LONG, payload BINARY, format STRING, n_bytes LONG")
        .parquet(src), sink, ckpt)
    // batch 1: dithered variants of every 10th indexed doc (ids +100k)
    // plus one novel image (doc 105, outside the indexed range; its
    // dither hashes at hd 1, well inside the radius — doc choice
    // matters: the dither spread is 0-10 and e.g. doc 400 sits at 8)
    graft.multimodal.Multimodal.mediaVariants(docs.limit(60), every = 10,
        idOffset = 100000L)
      .unionByName(graft.multimodal.Multimodal.asMediaTable(
        docs.filter(col("doc_id") === 105)))
      .write.mode("append").parquet(src)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    val flagged1 = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).select("id", "dup_of").as[(Long, Long)].collect().toSet
    // every variant that hashes within the radius flags its original;
    // at minimum the hd<=7 planted copies surface, the novel one not
    assert(flagged1.nonEmpty && flagged1.forall(p => p._1 >= 100000L),
      s"only variants may flag: $flagged1")
    assert(flagged1.exists(p => p._2 == p._1 - 100000L),
      s"variant must cite its source: $flagged1")
    assert(!flagged1.exists(_._1 == 105L), "novel image must not flag")
    // batch 2 after restart: a dithered copy of the NOVEL image from
    // batch 1 — it must flag against the batch-1 ADMITTED extent
    graft.multimodal.Multimodal.mediaVariants(
        docs.filter(col("doc_id") === 105), every = 1, idOffset = 200000L)
      .write.mode("append").parquet(src)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val flagged2 = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(flagged2.contains((200105L, 105L)),
      s"batch-2 copy must flag the batch-1 admitted image: $flagged2")
    graft.dedup.FingerprintIndex.drop(spark, "img_stream_idx")
  }

  test("media dedup stream is fingerprint-generic: the audio plug flags dithered clips") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val baseAudio = graft.multimodal.Multimodal.asAudioTable(docs.limit(40))
    graft.dedup.FingerprintIndex.write(
      graft.multimodal.Multimodal.audioFingerprints(baseAudio),
      "media_id", "fp", "aud_stream_idx",
      graft.functions.AudioHash.Bits, maxHamming = 7, buckets = 4)
    val root = java.nio.file.Files.createTempDirectory("graft-audstream")
    val (src, ckpt, grow, sink) =
      (s"$root/src", s"$root/ckpt", s"$root/grow", s"$root/sink")
    // audio variants of every 10th doc (+8 comb dither) land first
    graft.multimodal.Multimodal
      .asAudioTableWithVariants(docs.limit(40), every = 10,
        idOffset = 100000L)
      .filter(col("media_id") >= 100000L)
      .write.mode("append").parquet(src)
    // the SAME stream operator, audio fingerprint fn plugged in
    // (audioFingerprints keeps sample_rate; project to (media_id, fp))
    val q = StreamOps.imageDedupStream(spark, "aud_stream_idx", grow,
      spark.readStream
        .schema("media_id LONG, payload BINARY, format STRING, n_bytes LONG")
        .parquet(src), sink, ckpt,
      fingerprint = m => graft.multimodal.Multimodal.audioFingerprints(m)
        .select("media_id", "fp"))
    q.processAllAvailable(); q.stop()
    val flagged = spark.read
      .schema("id LONG, dup_of LONG, hamming LONG, batch_id LONG")
      .parquet(sink).select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(flagged.exists(p => p._2 == p._1 - 100000L),
      s"audio variant must flag its source clip: $flagged")
    graft.dedup.FingerprintIndex.drop(spark, "aud_stream_idx")
  }

  test("vector deletion stream: tombstones mask served results mid-stream; replay is idempotent") {
    // right-to-be-forgotten in the serving loop (VERDICT r10 #7): the
    // delete twin of the admission stream — no batch job needed to
    // honor an erasure request while the index keeps serving
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0),
      "ivf_del_stream", nlist = 8, iterations = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-ivfdelstream")
    val (ckpt, grow) = (s"$root/ckpt", s"$root/grow")
    val queries = emb.filter(col("vec_id") < 4)
    // plant an exact copy of query 0 as an admitted extent vector
    graft.sim.IvfIndex.admit(spark, "ivf_del_stream", grow,
      emb.filter(col("vec_id") === 0)
        .select(lit(999001L).as("vec_id"), col("embedding")), 1L)
    def top1() = graft.sim.IvfIndex.searchGrown(spark, "ivf_del_stream",
        grow, queries, 3)
      .filter(col("qid") === 0 && col("rk") === 1)
      .select("cid").as[Long].collect().head
    assert(top1() == 999001L, "planted dup must serve as top-1 before deletion")

    // erasure request arrives ON THE STREAM: the planted dup + one
    // base vector; the next search must not surface either
    val in = MemoryStream[Long]
    val q = StreamOps.deleteVectorsStream(spark, grow,
      in.toDF().select(col("value").as("vec_id")), ckpt)
    in.addData(999001L, 2L)
    q.processAllAvailable()
    val afterFirst = top1()
    assert(afterFirst != 999001L, "deleted vector must stop serving immediately")
    // a second micro-batch through the SAME running stream
    in.addData(afterFirst)
    q.processAllAvailable()
    q.stop()
    val afterSecond = top1()
    assert(afterSecond != 999001L && afterSecond != afterFirst)
    val served = graft.sim.IvfIndex.searchGrown(spark, "ivf_del_stream",
      grow, queries, 3).orderBy("qid", "rk").collect().toSeq
    // replaying a delete batch overwrites its own tombstone partition:
    // served results are bit-identical
    graft.sim.IvfIndex.delete(spark, grow,
      Seq(999001L, 2L).toDF("vec_id"), 0L)
    val replayed = graft.sim.IvfIndex.searchGrown(spark, "ivf_del_stream",
      grow, queries, 3).orderBy("qid", "rk").collect().toSeq
    assert(replayed == served, "delete replay must be idempotent")
    // compact applies the streamed tombstones physically
    graft.sim.IvfIndex.compact(spark, "ivf_del_stream", grow)
    assert(spark.table("ivf_del_stream")
      .filter(col("vec_id").isin(999001L, 2L, afterFirst)).count() == 0)
    spark.sql("DROP TABLE IF EXISTS ivf_del_stream")
    spark.sql("DROP TABLE IF EXISTS ivf_del_stream_centroids")
  }

  test("doc admission stream grows the served lexical index; forget masks mid-stream; compact folds") {
    // the retrieval twin of the vector admission/deletion streams:
    // crawl batches admitted to the postings index are served by
    // searchGrown with exact df/N/avgdl, a streamed forget masks docs
    // from the NEXT query on, and search always equals brute-force
    // BM25 over the live set
    import graft.text.{PostingsIndex, Retrieval, TextFunctions}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val queries = docs.filter(col("doc_id") < 10).limit(10)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(
          slice(TextFunctions.tokens(col("text")), 1, 5))).as("tok"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rk").collect().toSeq

    PostingsIndex.write(docs.filter(col("doc_id") % 3 === 0), "pidx_stream")
    val root = java.nio.file.Files.createTempDirectory("graft-pidxstream")
    val (src, ckpt, grow) = (s"$root/src", s"$root/ckpt", s"$root/grow")
    val (fsrc, fckpt) = (s"$root/fsrc", s"$root/fckpt")
    def startAdmit() = StreamOps.admitDocsStream(spark, "pidx_stream", grow,
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src), ckpt)

    // batch 1 admitted; restart; batch 2 admitted — grown == monolithic
    docs.filter(col("doc_id") % 3 === 1).write.mode("append").parquet(src)
    val q1 = startAdmit(); q1.processAllAvailable(); q1.stop()
    docs.filter(col("doc_id") % 3 === 2).write.mode("append").parquet(src)
    val q2 = startAdmit(); q2.processAllAvailable(); q2.stop()
    assert(rows(PostingsIndex.searchGrown(spark, "pidx_stream", grow, queries, 3)) ==
      rows(Retrieval.bm25TopK(docs, queries, 3)))

    // streamed forget: masked from the next search, stats-exact
    docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      .write.mode("append").parquet(fsrc)
    val qf = StreamOps.forgetDocsStream(spark, grow,
      spark.readStream.schema("doc_id LONG").parquet(fsrc), fckpt)
    qf.processAllAvailable(); qf.stop()
    val live = docs.filter(col("doc_id") % 5 =!= 0)
    val masked = rows(PostingsIndex.searchGrown(spark, "pidx_stream", grow, queries, 3))
    assert(masked == rows(Retrieval.bm25TopK(live, queries, 3)))

    // compact with streams stopped: base-only search unchanged
    PostingsIndex.compact(spark, "pidx_stream", grow)
    assert(rows(PostingsIndex.search(spark, "pidx_stream", queries, 3)) == masked)
    PostingsIndex.drop(spark, "pidx_stream")
  }

  test("streaming KMV extents roll up to the batch estimate; replay cannot skew it") {
    import graft.sketch.Sketches
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val root = java.nio.file.Files.createTempDirectory("graft-kmvstream")
    val (src, ckpt, kmv) = (s"$root/src", s"$root/ckpt", s"$root/kmv")

    li.filter(col("l_orderkey") % 2 === 0).write.mode("append").parquet(src)
    def start() = StreamOps.kmvStream(
      spark.readStream.schema("l_orderkey LONG, l_partkey LONG").parquet(src),
      "l_partkey", kmv, ckpt, k = 64)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    li.filter(col("l_orderkey") % 2 === 1).write.mode("append").parquet(src)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    def est1(df: org.apache.spark.sql.DataFrame) =
      df.select(col("h_k"), col("est")).collect().head
    val streamed = est1(StreamOps.readKmvEstimate(spark, kmv, 64))
    val batch = est1(Sketches.kmvEstimate(li, "l_partkey", 64))
    assert(streamed == batch)
    // a replayed batch overwrites its own extent
    Sketches.bottomK(li.filter(col("l_orderkey") % 2 === 0), "l_partkey", 64)
      .write.mode("overwrite").parquet(s"$kmv/batch_id=0")
    assert(est1(StreamOps.readKmvEstimate(spark, kmv, 64)) == batch)
  }

  test("streaming count-min extents sum to the batch sketch bit-for-bit; replay cannot double-count") {
    import graft.sketch.Sketches
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), Sketches.tokVal(col("tok")).as("v"))
    val root = java.nio.file.Files.createTempDirectory("graft-cmsstream")
    val (src, ckpt, cms) = (s"$root/src", s"$root/ckpt", s"$root/cms")

    toks.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(src)
    def start() = StreamOps.cmsStream(
      spark.readStream.schema("doc_id LONG, v LONG").parquet(src), cms, ckpt)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    toks.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("row_i", "bucket").collect().toSeq
    val accumulated = sorted(StreamOps.readCms(spark, cms))
    val batch = sorted(Sketches.cmsSketch(toks, col("v")))
    assert(accumulated == batch)

    // a replayed batch overwrites its own extent partition
    Sketches.cmsSketch(toks.filter(col("doc_id") % 2 === 0), col("v"))
      .write.mode("overwrite").parquet(s"$cms/batch_id=0")
    assert(sorted(StreamOps.readCms(spark, cms)) == batch)
  }

  test("streaming quantile extents read out to the batch estimate bit-for-bit; replay cannot double-count") {
    import graft.sketch.Sketches
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val root = java.nio.file.Files.createTempDirectory("graft-qsstream")
    val (src, ckpt, qs) = (s"$root/src", s"$root/ckpt", s"$root/qs")

    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(src)
    def start() = StreamOps.quantileStream(
      spark.readStream.schema("doc_id LONG, v LONG").parquet(src), qs, ckpt)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    def out(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("p").collect().toSeq
    val streamed = out(StreamOps.readQuantiles(spark, qs, Seq(50, 90, 99)))
    val batch = out(Sketches.quantileSketchEstimate(
      docs, col("v"), Seq(50, 90, 99)))
    assert(streamed == batch)

    // a replayed batch overwrites its own extent partition
    Sketches.quantileSketch(docs.filter(col("doc_id") % 2 === 0), col("v"))
      .write.mode("overwrite").parquet(s"$qs/batch_id=0")
    assert(out(StreamOps.readQuantiles(spark, qs, Seq(50, 90, 99))) == batch)
  }

  test("streaming hybrid serving: each query batch answered from the persisted indexes equals the batch-mode hybrid") {
    import graft.text.{PostingsIndex, Retrieval, TextFunctions}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // persisted serving state: full-corpus lexical + vector indexes
    PostingsIndex.write(docs, "hybrid_serve_lex")
    graft.sim.IvfIndex.write(emb, "hybrid_serve_ivf")
    val (qTerms, kEach, k) = (5, 10, 5)
    // the query stream's rows: qid + text + embedding (what a real
    // search request carries)
    val allQueries = docs.filter(col("doc_id") < 40)
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .select(col("doc_id").as("qid"), col("text"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft-hybridserve")
    val (src, ckpt, sink) = (s"$root/src", s"$root/ckpt", s"$root/sink")
    val schema = "qid LONG, text STRING, embedding ARRAY<FLOAT>"
    def start() = StreamOps.hybridServeStream(spark, "hybrid_serve_lex",
      "hybrid_serve_ivf",
      spark.readStream.schema(schema).parquet(src),
      sink, ckpt, qTerms, kEach, k)
    // queries arrive in 3 batches
    val slices = Seq(col("qid") < 14, col("qid") >= 14 && col("qid") < 27,
      col("qid") >= 27)
    slices.foreach { pred =>
      allQueries.filter(pred).write.mode("append").parquet(src)
      val q = start(); q.processAllAvailable(); q.stop()
    }
    // per batch: the streamed answer equals the batch-mode fully-
    // served hybrid over exactly that batch's queries
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Int)] =
      df.select(col("qid"), col("doc_id"), col("rrf"), col("rk"))
        .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    slices.zipWithIndex.foreach { case (pred, i) =>
      val batchQ = allQueries.filter(pred)
      val qset = batchQ.select(col("qid"), explode(array_distinct(
        slice(TextFunctions.tokens(col("text")), 1, qTerms))).as("tok"))
      val expect = Retrieval.hybridFuse(
        PostingsIndex.lexRanked(spark, "hybrid_serve_lex", qset, kEach),
        graft.sim.IvfIndex.search(spark, "hybrid_serve_ivf",
          batchQ.select(col("qid").as("vec_id"), col("embedding")), kEach)
          .select(col("qid"), col("cid").as("id"), col("rk")),
        k)
      val got = spark.read
        .schema("qid LONG, doc_id LONG, rrf LONG, rk INT")
        .parquet(s"$sink/batch_id=$i")
      assert(rows(got) == rows(expect), s"batch $i diverged")
      assert(rows(got).nonEmpty, s"batch $i empty")
    }

    // excludeSelf = false (the external-id-space serving mode, ADVICE
    // r12): a qid that collides with a corpus id must KEEP that corpus
    // doc as a candidate on both legs — here qids are corpus ids, so
    // the identical doc is each query's best hit on both legs and must
    // surface instead of being silently dropped
    val (src2, ckpt2, sink2) = (s"$root/src2", s"$root/ckpt2", s"$root/sink2")
    allQueries.filter(col("qid") < 14).write.mode("append").parquet(src2)
    val qOpen = StreamOps.hybridServeStream(spark, "hybrid_serve_lex",
      "hybrid_serve_ivf",
      spark.readStream.schema(schema).parquet(src2),
      sink2, ckpt2, qTerms, kEach, k, excludeSelf = false)
    qOpen.processAllAvailable(); qOpen.stop()
    val gotOpen = spark.read
      .schema("qid LONG, doc_id LONG, rrf LONG, rk INT")
      .parquet(s"$sink2/batch_id=0")
    val batchQ0 = allQueries.filter(col("qid") < 14)
    val qset0 = batchQ0.select(col("qid"), explode(array_distinct(
      slice(TextFunctions.tokens(col("text")), 1, qTerms))).as("tok"))
    val expectOpen = Retrieval.hybridFuse(
      PostingsIndex.lexRanked(spark, "hybrid_serve_lex", qset0, kEach,
        excludeSelf = false),
      graft.sim.IvfIndex.search(spark, "hybrid_serve_ivf",
        batchQ0.select(col("qid").as("vec_id"), col("embedding")), kEach,
        excludeSelf = false)
        .select(col("qid"), col("cid").as("id"), col("rk")),
      k)
    assert(rows(gotOpen) == rows(expectOpen), "open-mode batch diverged")
    val selfHits = rows(gotOpen).filter(r => r._1 == r._2)
    assert(selfHits.size == 14,
      s"every query must keep its identical corpus doc: $selfHits")

    PostingsIndex.drop(spark, "hybrid_serve_lex")
    graft.api.Bucketing.resetManaged(spark, "hybrid_serve_ivf")
    graft.api.Bucketing.resetManaged(spark, "hybrid_serve_ivf_centroids")
  }

  test("warc segment ingestion stream: arriving segments run the funnel per micro-batch (r16)") {
    import graft.text.Warc
    val root = java.nio.file.Files.createTempDirectory("graft-warcstream")
    val segDir = new java.io.File(root.toFile, "segments")
    segDir.mkdirs()
    // encoded wire bands flow through the stream too: the decode
    // layer (chunked/gzip/deflate) is part of the ingestion path
    def writeSegment(name: String, ids: Seq[Long]): Unit = {
      val fos = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(new java.io.File(segDir, name)))
      try Warc.writeGzMembers(fos, ids.iterator.map { id =>
        Warc.warcifyBytes(id, Warc.encodeHttpBand(id,
          s"<p>page body $id with enough words</p>".getBytes("UTF-8")))
      })
      finally fos.close()
    }
    writeSegment("segment-00000.warc.gz", 0L to 9L)
    writeSegment("segment-00001.warc.gz", 10L to 19L)
    val q = StreamOps.ingestWarcSegmentsStream(spark, segDir.toString,
      s"$root/out", s"$root/ckpt")
    q.processAllAvailable()
    // the second arrival wave lands AFTER the first is fully processed
    writeSegment("segment-00002.warc.gz", 20L to 29L)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$root/out")
    // two arrival waves → at least two batch partitions
    assert(streamed.select("batch").distinct().count() >= 2,
      "expected per-wave batch partitions")
    val got = streamed.select("uri", "status", "clean")
      .collect().map(r => (r.getString(0), r.get(1), r.getString(2))).toSet
    // stream-final ≡ the batch funnel over the same directory
    val expect = Warc.extractResponses(Warc.readWarcGz(spark, segDir.toString))
      .select("uri", "status", "clean")
      .collect().map(r => (r.getString(0), r.get(1), r.getString(2))).toSet
    assert(got == expect, "stream-final must equal the batch funnel")
    assert(got.size == 30 && got.forall(_._3.contains("page body")))
  }
}
