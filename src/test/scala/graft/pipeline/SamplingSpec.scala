package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("splitLabel partitions ~80/10/10 and is deterministic") {
    val counts = docs
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / n - 0.8) < 0.05, counts.toString)
    assert(math.abs(counts("val") / n - 0.1) < 0.04, counts.toString)
    // determinism: identical assignment on a re-read + repartition
    val again = docs.repartition(7)
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("sampleFilter keeps ~keep/denom of every stratum") {
    val total = docs.count().toDouble
    val kept = docs.filter(Sampling.sampleFilter(col("doc_id"), 100)).count()
    assert(math.abs(kept / total - 0.1) < 0.04, s"kept $kept of $total")
  }

  test("mixtureFilter applies per-domain rates with default fallback") {
    val rates = Map("en" -> 1000, "de" -> 0, "zh" -> 500)
    val kept = docs
      .filter(Sampling.mixtureFilter(col("doc_id"), col("lang"), rates,
        defaultMills = 200))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") == all("en"))          // rate 1000 keeps everything
    assert(!kept.contains("de"))             // rate 0 drops the domain
    val zh = kept("zh").toDouble / all("zh") // ~50%
    assert(math.abs(zh - 0.5) < 0.15, s"zh kept $zh")
    // absent domains get the default rate (~20%)
    val fr = kept.getOrElse("fr", 0L).toDouble / all("fr")
    val es = kept.getOrElse("es", 0L).toDouble / all("es")
    assert(fr > 0 && fr < 0.5 && es > 0 && es < 0.5, s"fr=$fr es=$es")
    // deterministic under repartition
    val again = docs.repartition(9)
      .filter(Sampling.mixtureFilter(col("doc_id"), col("lang"), rates, 200))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("fixedSample returns exactly k rows, stable across partitionings") {
    val a = Sampling.fixedSample(docs, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSeq
    val b = Sampling.fixedSample(docs.repartition(13), "doc_id", 50)
      .select("doc_id").as[Long].collect().toSeq
    assert(a.size == 50 && a == b)
    // plan stays a per-partition top-k, never a global sort
    val plan = Sampling.fixedSample(docs, "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("fixedSamplePerGroup: exactly k per group, partition-stable, WindowGroupLimit") {
    val a = Sampling.fixedSamplePerGroup(docs, "doc_id", Seq("lang"), 7)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq.sorted
    val b = Sampling.fixedSamplePerGroup(docs.repartition(13), "doc_id", Seq("lang"), 7)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq.sorted
    assert(a == b && a.nonEmpty)
    val perGroup = a.groupBy(_._1).view.mapValues(_.size)
    assert(perGroup.values.forall(_ <= 7), perGroup.toMap)
    // groups with >= 7 docs contribute exactly 7
    val groupSizes = docs.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    groupSizes.foreach { case (g, n) =>
      assert(perGroup.getOrElse(g, 0) == math.min(n, 7L).toInt, g)
    }
    val plan = Sampling.fixedSamplePerGroup(docs, "doc_id", Seq("lang"), 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("weightedSamplePerGroup: priorities match a BigInt model; weight monotonicity; WindowGroupLimit") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, "g", (i % 7 + 1).toInt))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedSamplePerGroup(df, "id", "w", Seq("grp"), 10)
      .select("id").as[Long].collect().toSet
    // local model: identical integer arithmetic with BigInt safety
    def pri(id: Long, w: Int): BigInt =
      (BigInt(id % 1000000007L) * 2654435761L % 1000000007L) * 1000000L / w
    val expected = rows.sortBy { case (id, _, w) => (pri(id, w), id) }
      .take(10).map(_._1).toSet
    assert(got == expected)
    // monotonicity: doubling every weight halves every priority -> the
    // ORDER (and hence the sample) is NOT invariant in general, but
    // raising one row's weight can only improve its rank
    val bumped = rows.map { case (id, g, w) => (id, g, if (id == 42L) 1000000 else w) }
    val withBump = Sampling.weightedSamplePerGroup(
      bumped.toDF("id", "grp", "w"), "id", "w", Seq("grp"), 10)
      .select("id").as[Long].collect().toSet
    assert(withBump.contains(42L), "a near-infinite weight must force selection")
    // heavier rows win more slots: weight-7 rows should out-represent
    // weight-1 rows in a larger sample
    val k50 = Sampling.weightedSamplePerGroup(df, "id", "w", Seq("grp"), 50)
      .select("id").as[Long].collect()
    val heavy = k50.count(id => id % 7 + 1 >= 6)
    val light = k50.count(id => id % 7 + 1 <= 2)
    assert(heavy > light, s"heavy=$heavy light=$light")
    val plan = Sampling.weightedSamplePerGroup(df, "id", "w", Seq("grp"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("temperatureMix: isqrt quotas upsample low-resource domains") {
    import org.apache.spark.sql.functions.col
    // A: 100 docs, B: 4 docs -> isqrt 10 and 2, total 12; budget 60
    // gives quotas 50 and 10; B's rate caps at 1000000 ppm (keeps all
    // 4) while A keeps ~half — the low-resource domain is upsampled
    val docs = ((0L until 100L).map((_, "A")) ++
      (1000L until 1004L).map((_, "B"))).toDF("doc_id", "lang")
    val out = Sampling.temperatureMix(docs, "lang", "doc_id", 60L)
      .select("lang", "n_docs", "quota", "n_sampled")
      .as[(String, Long, Long, Long)].collect()
      .map { case (l, n, q, s) => (l, (n, q, s)) }.toMap
    assert(out("A")._1 == 100L && out("A")._2 == 50L)
    assert(out("B") == ((4L, 10L, 4L))) // rate capped, keeps all
    assert(out("A")._3 < 100L && out("A")._3 > 0L)
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(
        docs.repartition(7, col("doc_id")), "lang", "doc_id", 60L)
      .select("lang", "n_docs", "quota", "n_sampled")
      .as[(String, Long, Long, Long)].collect()
      .map { case (l, n, q, s) => (l, (n, q, s)) }.toMap
    assert(again == out)
    // a domain whose quota floors to zero must still REPORT, with
    // n_sampled = 0 — zeroed is not the same as absent
    val tiny = Sampling.temperatureMix(docs, "lang", "doc_id", 1L)
      .select("lang", "quota", "n_sampled")
      .as[(String, Long, Long)].collect()
      .map { case (l, q, s) => (l, (q, s)) }.toMap
    assert(tiny.keySet == Set("A", "B"))
    assert(tiny("B") == ((0L, 0L)))
  }

  test("epochShuffle: complete per epoch, order differs across epochs, stable across partitionings") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2, shards = 8)
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .as[(Int, Long, Int, Long)].collect()
    val n = docs.count()
    // every epoch carries every doc exactly once
    assert(out.count(_._1 == 0) == n && out.count(_._1 == 1) == n)
    // positions are a contiguous 1..size ranking within (epoch, shard)
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // the two epochs order a shard's members differently (the point)
    val e0 = out.filter(_._1 == 0).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    val e1 = out.filter(_._1 == 1).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(e0 != e1)
    // deterministic under re-partitioning
    val again = Sampling.epochShuffle(docs.repartition(7), "doc_id", 2, 8)
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .as[(Int, Long, Int, Long)].collect()
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("epochShuffle: consecutive epochs are decorrelated, not rotations (ADVICE r11 #2)") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2, shards = 8)
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
      .as[(Int, Long, Int, Long)].collect()
    val byEpoch = (0 to 1).map { e =>
      out.filter(_._1 == e).map(r => r._4 -> ((r._2, r._3))).toMap
    }
    // Kendall-style concordance over every id pair that shares a shard
    // in BOTH epochs: under an affine epoch mix (h_{e+1} = h_e + const
    // mod M for every id) relative order is preserved except at the
    // single mod wrap, so concordance sits at ~1.0; an actual
    // per-epoch reshuffle concentrates around 0.5. Pin the gap wide
    // on both sides so the test is insensitive to corpus size.
    val ids = byEpoch(0).keys.toArray.sorted
    var concordant = 0L
    var total = 0L
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (s0i, p0i) = byEpoch(0)(ids(i)); val (s0j, p0j) = byEpoch(0)(ids(j))
      val (s1i, p1i) = byEpoch(1)(ids(i)); val (s1j, p1j) = byEpoch(1)(ids(j))
      if (s0i == s0j && s1i == s1j) {
        total += 1
        if ((p0i < p0j) == (p1i < p1j)) concordant += 1
      }
    }
    assert(total > 100, s"too few comparable pairs ($total) to judge")
    val frac = concordant.toDouble / total
    assert(frac > 0.35 && frac < 0.65,
      s"epoch 0 -> 1 order concordance $frac over $total pairs — " +
        "consecutive epochs look like rotations of each other")
    // and shard assignment itself must re-mix: the fraction of ids
    // keeping their epoch-0 shard should be ~1/shards, not ~1
    val sameShard = ids.count(id => byEpoch(0)(id)._1 == byEpoch(1)(id)._1)
    assert(sameShard.toDouble / ids.length < 0.3,
      s"$sameShard/${ids.length} ids kept their shard across epochs")
  }
}
