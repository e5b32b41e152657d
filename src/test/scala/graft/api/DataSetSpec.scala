package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Top-level so Spark serializes only the function, not the suite. */
class LookupRich extends RichMapFunction[Int, String] {
  @transient private var m: Map[Int, String] = _
  override def open(): Unit =
    m = getBroadcastVariable[(Int, String)]("lookup").toMap
  def map(i: Int): String = m.getOrElse(i, "?")
}

/** Mirrors the reference's javaApiOperators ITCases (SURVEY.md §5):
  * tiny inline datasets, unordered golden-set compares. */
class DataSetSpec extends SparkSpec {

  lazy val env = new GraftEnvironment(spark)
  import spark.implicits._

  // the reference's canonical 3-tuple fixture ([U] CollectionDataSets.java)
  def tuples3: GDataSet[(Int, Long, String)] = env.fromCollection(Seq(
    (1, 1L, "Hi"), (2, 2L, "Hello"), (3, 2L, "Hello world"),
    (4, 3L, "Hello world, how are you?"), (5, 3L, "I am fine."),
    (6, 3L, "Luke Skywalker")))

  test("map: 1->1 transform") {
    val got = tuples3.map(t => (t._1 + 1, t._3.length)).collectSeq().sorted
    assert(got == Seq((2, 2), (3, 5), (4, 11), (5, 25), (6, 10), (7, 14)))
  }

  test("flatMap with Collector (reference FlatMapFunction shape)") {
    val got = env.fromElements("a b", "c")
      .flatMapWithCollector[String]((s, out) => s.split(" ").foreach(out.collect))
      .collectSeq().sorted
    assert(got == Seq("a", "b", "c"))
  }

  test("filter") {
    assert(tuples3.filter(_._2 == 3L).count() == 3)
  }

  test("project drops to DataFrame columns") {
    val got = tuples3.project("_1", "_3")
    assert(got.columns.toSeq == Seq("_1", "_3") && got.count() == 6)
  }

  test("mapPartition: whole-partition iterator UDF") {
    val got = env.fromElements(1, 2, 3, 4).rebalance(2)
      .mapPartition(it => Seq(it.sum))
      .collectSeq()
    assert(got.size == 2 && got.sum == 10)
  }

  test("distinct + union (bag semantics: union = UNION ALL)") {
    val a = env.fromElements(1, 2, 2, 3)
    val b = env.fromElements(3, 4)
    assert(a.union(b).count() == 6) // no implicit dedup
    assert(a.union(b).distinct().count() == 4)
  }

  test("join where/equalTo with JoinFunction") {
    val words = env.fromCollection(Seq((1, "one"), (2, "two"), (2, "zwei")))
    val got = tuples3.join(words).where(_._1).equalTo(_._1)
      .apply((l, r) => (l._3, r._2)).collectSeq().sorted
    assert(got == Seq(("Hello", "two"), ("Hello", "zwei"), ("Hi", "one")))
  }

  test("joinWithTiny broadcasts the small side") {
    val tiny = env.fromCollection(Seq((1, "x")))
    val j = tuples3.joinWithTiny(tiny).where(_._1).equalTo(_._1).build
    val plan = j.ds.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in plan:\n$plan")
    assert(j.count() == 1)
  }

  test("composite keys: join and groupBy on tuple key selectors") {
    val other = env.fromCollection(Seq((2L, "Hello", 10), (3L, "I am fine.", 20)))
    val joined = tuples3.join(other)
      .where(t => (t._2, t._3)).equalTo(u => (u._1, u._2))
      .apply((l, r) => (l._1, r._3)).collectSeq().sorted
    assert(joined == Seq((2, 10), (5, 20)))
    val grouped = tuples3.groupBy(t => (t._2, t._3.startsWith("Hello")))
      .reduceGroup[((Long, Boolean), Int)]((k, it) => Seq((k, it.size)))
      .collectSeq().sortBy(r => (r._1._1, r._1._2))
    // groups: (1,F)=1, (2,T)={"Hello","Hello world"}=2, (3,F)=2, (3,T)=1
    assert(grouped.map(_._2).sum == 6 && grouped.size == 4)
  }

  test("coGroup: per-key iterator pair (outer-join-like semantics)") {
    val a = env.fromCollection(Seq((1, "a1"), (1, "a2"), (2, "b")))
    val b = env.fromCollection(Seq((2, "x"), (3, "y")))
    val got = a.coGroup(b).where(_._1).equalTo(_._1)
      .apply[(Int, Int, Int)]((k, l, r) => Seq((k, l.size, r.size)))
      .collectSeq().sorted
    assert(got == Seq((1, 2, 0), (2, 1, 1), (3, 0, 1)))
  }

  test("cross: cartesian with pair output") {
    val got = env.fromElements(1, 2).cross(env.fromElements("a", "b")).collectSeq().sorted
    assert(got == Seq((1, "a"), (1, "b"), (2, "a"), (2, "b")))
  }

  test("groupBy.reduce: per-key pairwise reduce") {
    val got = tuples3.groupBy(_._2).reduce((a, b) =>
        (a._1 + b._1, a._2, if (a._1 < b._1) a._3 else b._3))
      .map(_._2).collectSeq().map(t => (t._1, t._2)).sorted
    assert(got == Seq((1, 1L), (5, 2L), (15, 3L)))
  }

  test("groupBy.reduceGroup: full-group iterator") {
    val got = tuples3.groupBy(_._2)
      .reduceGroup[(Long, Int)]((k, it) => Seq((k, it.size)))
      .collectSeq().sorted
    assert(got == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("sortGroup + reduceGroup: secondary sort order inside group") {
    val got = tuples3.groupBy(_._2)
      .sortGroupReduce[(Long, String)](col("_1").desc) { (k, it) =>
        Seq((k, it.map(_._1).mkString("-")))
      }.collectSeq().sorted
    assert(got == Seq((1L, "1"), (2L, "3-2"), (3L, "6-5-4")))
  }

  test("global reduce (AllReduce)") {
    val got = env.fromElements(1, 2, 3, 4).reduce(_ + _).collectSeq()
    assert(got == Seq(10))
  }

  test("global reduceGroup sees everything as one group") {
    val got = env.fromElements(3, 1, 2)
      .reduceGroup[Int](it => Seq(it.sum)).collectSeq()
    assert(got == Seq(6))
  }

  test("first(n) global and per group") {
    assert(tuples3.first(2).count() == 2)
    val perGroup = tuples3.groupBy(_._2).first(2).count()
    assert(perGroup == 5) // groups of size 1,2,3 -> 1+2+2
  }

  test("partitionByHash keeps data intact; rebalance round-robins") {
    assert(tuples3.partitionByHash("_2").count() == 6)
    val reb = tuples3.rebalance(3)
    assert(reb.ds.rdd.getNumPartitions == 3 && reb.count() == 6)
  }

  test("mapRich: open/close + broadcast set (withBroadcastSet parity)") {
    val lookup = env.fromCollection(Seq((1, "one"), (2, "two"), (3, "three")))
    val withBc = RichMapFunction.withBroadcastSet(new LookupRich, lookup, "lookup")
    val got = env.fromElements(1, 3, 9).mapRich(withBc).collectSeq().sorted
    assert(got == Seq("?", "one", "three"))
  }

  test("coGroup with sortFirstGroup/sortSecondGroup: both iterators arrive ordered") {
    val left = env.fromCollection(Seq(
      (1, 30, "a"), (1, 10, "b"), (1, 20, "c"), (2, 5, "d")))
    val right = env.fromCollection(Seq(
      (1, "z"), (1, "x"), (1, "y"), (3, "w")))
    val got = left.coGroup(right).where(_._1).equalTo(_._1)
      .sortFirstGroup(col("_2"))        // left by the int field asc
      .sortSecondGroup(col("_2").desc)  // right by the string field desc
      .apply { (k, li, ri) =>
        Iterator((k, li.map(_._2).mkString(","), ri.map(_._2).mkString(",")))
      }
      .collectSeq().sortBy(_._1)
    assert(got == Seq(
      (1, "10,20,30", "z,y,x"),
      (2, "5", ""),
      (3, "", "w")))
  }

  test("withBroadcastSet: oversized set fails fast at the configured cap") {
    spark.conf.set("spark.graft.broadcastSet.maxRows", "10")
    try {
      val big = env.fromCollection((1 to 100).map(i => (i, s"v$i")))
      val ex = intercept[IllegalArgumentException] {
        RichMapFunction.withBroadcastSet(new LookupRich, big, "lookup")
      }
      assert(ex.getMessage.contains("spark.graft.broadcastSet.maxRows"))
      // exactly at the cap still works
      val atCap = env.fromCollection((1 to 10).map(i => (i, s"v$i")))
      val fn = RichMapFunction.withBroadcastSet(new LookupRich, atCap, "lookup")
      assert(env.fromElements(3, 42).mapRich(fn).collectSeq().sorted
        == Seq("?", "v3"))
    } finally spark.conf.unset("spark.graft.broadcastSet.maxRows")
  }

  test("flatMapRich and filterRich: open/close + broadcast-set access") {
    val lookup = env.fromCollection(Seq(2, 4))
    class EvenExpander extends RichFlatMapFunction[Int, String] {
      @transient private var keep: Set[Int] = _
      override def open(): Unit = { keep = getBroadcastVariable[Int]("keep").toSet }
      override def flatMap(t: Int, out: Collector[String]): Unit =
        if (keep(t)) { out.collect(s"$t"); out.collect(s"$t!") }
    }
    val fm = RichMapFunction.withBroadcastSet(new EvenExpander, lookup, "keep")
    assert(env.fromElements(1, 2, 3, 4).flatMapRich(fm).collectSeq().sorted
      == Seq("2", "2!", "4", "4!"))

    class KeepRich extends RichFilterFunction[Int] {
      @transient private var keep: Set[Int] = _
      override def open(): Unit = { keep = getBroadcastVariable[Int]("keep").toSet }
      override def filter(t: Int): Boolean = keep(t)
    }
    val fr = RichMapFunction.withBroadcastSet(new KeepRich, lookup, "keep")
    assert(env.fromElements(1, 2, 3, 4).filterRich(fr).collectSeq().sorted == Seq(2, 4))
  }

  test("accumulator parity (LongCounter)") {
    val acc = env.longCounter("seen")
    env.fromElements(1, 2, 3).map { i => acc.add(1); i }.count()
    assert(acc.value == 3)
  }

  test("accumulator parity (DoubleCounter + Histogram)") {
    val d = env.doubleCounter("weight")
    val h = env.histogram("buckets")
    env.fromElements(1, 2, 2, 3, 3, 3).map { i => d.add(i * 0.5); h.add(i); i }
      .count()
    assert(d.value == 7.0)
    assert(h.value == Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("bulk iteration: incrementing converges at maxIterations") {
    val got = env.fromElements(0, 10).iterate(5)(d => d.map(_ + 1))
      .collectSeq().sorted
    assert(got == Seq(5, 15))
  }

  test("aggregate builder: SUM/MIN/MAX chaining, grouped and global") {
    val global = tuples3.aggregate(Aggregations.SUM, "_1")
      .and(Aggregations.MAX, "_2").result.collect()(0)
    assert(global.getLong(0) == 21L && global.getLong(1) == 3L) // sum(int) -> long
    val grouped = tuples3.groupByFields("_2")
      .aggregate(Aggregations.SUM, "_1").and(Aggregations.MIN, "_1").result
      .orderBy(col("_2")).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(grouped == Seq((1L, 1L, 1), (2L, 5L, 2), (3L, 15L, 4)))
  }

  test("iterateDelta sugar on the facade") {
    val sol = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val ws = Seq((1L, 1L)).toDF("k", "v")
    val got = new GDataSet(sol).iterateDelta(ws, Seq("k"), 3) { (_, w) =>
      // single step: replace key 1's value with 99, then stop
      val delta = w.filter(col("v") === 1L)
        .select(col("k"), lit(99L).as("v"))
      (delta, delta.filter(lit(false)))
    }
    assert(got.orderBy("k").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 99L), (2L, 20L)))
  }

  test("join hints: sort-merge and shuffle-hash plan as hinted") {
    val words = env.fromCollection(Seq((1, "one"), (2, "two")))
    val smj = tuples3.joinWithHint(words, JoinHint.SortMerge)
      .where(_._1).equalTo(_._1).build
    assert(smj.ds.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    val shj = tuples3.joinWithHint(words, JoinHint.ShuffleHash)
      .where(_._1).equalTo(_._1).build
    assert(shj.ds.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    assert(smj.count() == 2 && shj.count() == 2)
  }

  test("sortPartition orders within partitions") {
    val sorted = tuples3.rebalance(2).sortPartition(col("_1").desc)
    val perPart = sorted.ds.rdd.mapPartitions(it => Iterator(it.map(_._1).toList))
      .collect()
    assert(perPart.forall(l => l == l.sorted.reverse))
  }

  test("distributed cache: file shipped to tasks (SparkFiles)") {
    val f = java.nio.file.Files.createTempFile("graft-cache", ".txt")
    java.nio.file.Files.writeString(f, "lookup-payload")
    env.registerCachedFile(f.toString)
    val name = f.getFileName.toString
    val got = env.fromElements(1, 2).map { _ =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(org.apache.spark.SparkFiles.get(name))))
    }.collectSeq()
    assert(got == Seq("lookup-payload", "lookup-payload"))
  }

  test("typed Aggregator: bounded top-k with partial aggregation (combiner)") {
    val got = tuples3.groupBy(_._2)
      .aggWith(Aggregators.topK[(Int, Long, String)](2, _._1.toDouble))
      .collectSeq().map { case (k, v) => (k, v.map(_._1)) }.sortBy(_._1)
    assert(got == Seq((1L, Seq(1)), (2L, Seq(2, 3)), (3L, Seq(4, 5))))
  }

  test("observed metrics surface via Observation (accumulator parity)") {
    val obs = new org.apache.spark.sql.Observation()
    val ds2 = tuples3.observed(obs, count(lit(1)).as("rows"),
      sum(col("_1")).as("sum1"))
    ds2.count()
    val m = obs.get
    assert(m("rows") == 6L && m("sum1") == 21L)
  }

  test("salted two-phase aggregation equals the plain aggregate") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"), sum(lit(1L)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Salting.saltedSum(li, Seq("l_returnflag"),
        Seq((col("l_quantity"), "q"), (lit(1L), "n")), saltBuckets = 8)
      .orderBy("l_returnflag").collect().toSeq
    assert(plain.map(_.toString) == salted.map(_.toString))
  }

  test("salted join equals the plain join for inner and left; rejects right/full") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_suppkey"), col("l_quantity"))
    // drop a few build keys so the LEFT case has genuinely unmatched probes
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .filter(col("s_suppkey") % 5 =!= 0)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(sup, Seq("l_suppkey"), jt)
        .groupBy(col("s_nationkey"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
        .orderBy(col("s_nationkey").asc_nulls_first).collect().toSeq
      val salted = Salting.saltedJoin(li, sup, Seq("l_suppkey"),
          saltBuckets = 8, joinType = jt)
        .groupBy(col("s_nationkey"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
        .orderBy(col("s_nationkey").asc_nulls_first).collect().toSeq
      assert(plain.map(_.toString) == salted.map(_.toString), jt)
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(li, sup, Seq("l_suppkey"), joinType = "right")
    }
  }

  test("csv/text round trip (FileOutputFormat part-file model)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    tuples3.writeAsCsv(s"$dir/csv")
    val back = env.readCsvFile(s"$dir/csv", header = true)
    assert(back.count() == 6)
    // includeFields positional mask (reference CsvInputFormat feature)
    val masked = env.readCsvFile(s"$dir/csv", header = true, includedFields = Seq(0, 2))
    assert(masked.ds.columns.length == 2 && masked.count() == 6)
    env.fromElements("x", "y").writeAsText(s"$dir/txt")
    assert(env.readTextFile(s"$dir/txt").collectSeq().sorted == Seq("x", "y"))
  }

  test("approx_count_distinct (HLL) lands within 5% of exact (not oracle-able cross-engine)") {
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val row = li.agg(countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("reduceGroup streams a huge group through the iterator (SURVEY 7.4 risk 2)") {
    import spark.implicits._
    // 2M rows on ONE key: flatMapGroups must stream the sorted group,
    // and the UDF folds without materializing it — completes in bounded
    // memory where a naive it.toSeq would balloon
    val n = 2000000L
    val got = new GDataSet(spark.range(n).map(i => (1, i)))
      .groupBy(_._1)
      .reduceGroup { (k, it) =>
        var cnt = 0L; var sum = 0L
        it.foreach { t => cnt += 1; sum += t._2 }
        Iterator((k, cnt, sum))
      }
      .collectSeq()
    assert(got == Seq((1, n, n * (n - 1) / 2)))
  }

  test("readExternalProcess: one process per split, stdout lines as records") {
    // each split's process sees its index via $GRAFT_SPLIT:
    // split 0 emits nothing (seq 0), split 1 emits 1, split 2 emits 1 2
    val got = env.readExternalProcess(
      Seq("sh", "-c", "seq $GRAFT_SPLIT"), splits = 3)
      .collectSeq().map(_.toInt).sorted
    assert(got == Seq(1, 1, 2))
    // non-zero exit surfaces as a task failure, not silent truncation
    intercept[org.apache.spark.SparkException] {
      env.readExternalProcess(Seq("sh", "-c", "echo oops; exit 3")).count()
    }
  }

  test("pipe: partition-wise external command transform") {
    // awk, not grep: grep exits 1 on a partition with zero matches and
    // PipedRDD treats non-zero exit as task failure
    val got = env.fromElements("apple", "banana", "cherry")
      .pipe(Seq("awk", "!/banana/"))
      .collectSeq().sorted
    assert(got == Seq("apple", "cherry"))
    // multi-column rows enter stdin comma-joined
    val summed = tuples3.pipe(Seq("awk", "-F,", "{ print $2 }")).ds
    assert(summed.count() == 6)
  }
}
