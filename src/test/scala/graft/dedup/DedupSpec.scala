package graft.dedup

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("exact dedup: histogram counts duplicate groups") {
    val d = docsDf((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val got = Dedup.exactDupHistogram(d).as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 1L))) // one unique text, one pair
  }

  test("exact substring spans: planted shared windows merge into the right spans") {
    // k=3 windows. doc 1 and 2 share "p q r s" (two overlapping
    // 3-gram windows -> ONE merged span of 4 tokens in each); doc 3
    // shares nothing cross-doc; docs 4/5 share "x y z" AND "u v w"
    // separated by unique middles -> TWO spans each, 3 tokens apiece.
    val d = docsDf(
      (1L, "a1 a2 p q r s a3 a4"),
      (2L, "b1 p q r s b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7"),
      (4L, "x y z d1 d2 d3 d4 u v w"),
      (5L, "x y z e1 e2 e3 e4 u v w"))
    val got = Dedup.exactSubstringSpans(d, k = 3)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // (doc_id, n_dup_windows, n_spans, covered_tokens)
    assert(got == Seq(
      (1L, 2L, 1L, 4L), (2L, 2L, 1L, 4L),
      (4L, 2L, 2L, 6L), (5L, 2L, 2L, 6L)), got.toString)
    // WITHIN-doc repetition alone must not count: the window must
    // appear in >= 2 DISTINCT docs
    val solo = docsDf((7L, "m n o m n o m n o"), (8L, "z1 z2 z3"))
    assert(Dedup.exactSubstringSpans(solo, k = 3).count() == 0)
    // adjacent (touching, non-overlapping) duplicated regions merge:
    // docs share 6 consecutive tokens = four 3-gram windows -> 1 span
    val touch = docsDf((10L, "s1 s2 s3 s4 s5 s6 f1 f2"),
      (11L, "g1 s1 s2 s3 s4 s5 s6 g2"))
    val t = Dedup.exactSubstringSpans(touch, k = 3)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(t == Seq((10L, 4L, 1L, 6L), (11L, 4L, 1L, 6L)), t.toString)
    // determinism under re-partitioning (suite discipline)
    val big = docs.select(col("doc_id"), col("text"))
    val a = Dedup.exactSubstringSpans(big, 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Dedup.exactSubstringSpans(big.repartition(13), 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty, "gate corpus should carry cross-doc 8-grams")
  }

  test("fixpoint substring scrub: second-order duplication created by a cut is scrubbed in pass 2; converged result is pass-count invariant") {
    import graft.text.TextFunctions
    // k=2. Pass 1: "M N" duplicated (docs 1, 2) -> owner doc 1, cut
    // from doc 2, leaving "p q r s" — which CREATES the adjacency
    // "q r", a window that did not exist in doc 2 before the cut.
    // Pass 2: "q r" duplicated (docs 0, 2) -> owner doc 0, cut from
    // doc 2, leaving "p s". Pass 3: no duplicated windows remain.
    // The single-pass operator must stop at "p q r s" (its published
    // semantics); the fixpoint must reach "p s".
    val d = docsDf(
      (0L, "z q r w"),
      (1L, "M N"),
      (2L, "p q M N r s"))
    def fpOf(s: String): Long = spark.range(1).select(
      TextFunctions.fingerprint(lit(s))).as[Long].collect().head
    val single = Dedup.exactSubstringScrub(d, k = 2)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(single == Seq(
      (0L, 4L, 4L, fpOf("z q r w")),
      (1L, 2L, 2L, fpOf("M N")),
      (2L, 6L, 4L, fpOf("p q r s"))), single.toString)
    val fixed = Dedup.exactSubstringScrubFixpoint(d, k = 2, maxPasses = 3)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(fixed == Seq(
      (0L, 4L, 4L, fpOf("z q r w")),
      (1L, 2L, 2L, fpOf("M N")),
      (2L, 6L, 2L, fpOf("p s"))), fixed.toString)
    // pass-count invariance past convergence (the oracle-parity
    // argument: extra passes on a fixed point are the identity)
    val more = Dedup.exactSubstringScrubFixpoint(d, k = 2, maxPasses = 5)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(more == fixed)
    // corpus determinism under re-partitioning (suite discipline)
    val big = docs.select(col("doc_id"), col("text"))
    val a = Dedup.exactSubstringScrubFixpoint(big, 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Dedup.exactSubstringScrubFixpoint(big.repartition(13), 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("exact substring scrub: first occurrence kept, others cut; scrubbed text fingerprint-exact") {
    import graft.text.TextFunctions
    // doc 1 owns "p q r s" (lowest (doc_id, start)); docs 2 and 5
    // lose their copies; doc 5 additionally shares "u v w" with doc 2
    // — doc 2 owns that one (appears at (2, _) before (5, _))
    val d = docsDf(
      (1L, "a1 a2 p q r s a3 a4"),
      (2L, "u v w b1 p q r s b2"),
      (3L, "c1 c2 c3 c4 c5"),
      (5L, "e1 u v w e2 p q r s"))
    val got = Dedup.exactSubstringScrub(d, k = 3)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // expected scrubbed texts, hand-cut (merged spans of non-owned
    // duplicated windows leave the token stream)
    val expect = Map(
      1L -> "a1 a2 p q r s a3 a4", // owner of "p q r s": untouched
      2L -> "u v w b1 b2",         // "p q r s" cut, owns "u v w"
      3L -> "c1 c2 c3 c4 c5",      // no dups: untouched
      5L -> "e1 e2")               // both shared regions cut
    val fp = expect.map { case (id, s) =>
      id -> spark.range(1).select(
        TextFunctions.fingerprint(lit(s))).as[Long].collect().head
    }
    assert(got == Seq(
      (1L, 8L, 8L, fp(1L)), (2L, 9L, 5L, fp(2L)),
      (3L, 5L, 5L, fp(3L)), (5L, 9L, 2L, fp(5L))), got.toString)
    // corpus-level sanity + determinism under re-partitioning
    val big = docs.select(col("doc_id"), col("text"))
    val a = Dedup.exactSubstringScrub(big, 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val b = Dedup.exactSubstringScrub(big.repartition(13), 8)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    // every doc is reported, scrubbing only ever shrinks, and at
    // least one doc actually shrank (the fixture probe)
    assert(a.size == big.count())
    assert(a.forall { case (_, nb, na, _) => na <= nb })
    assert(a.exists { case (_, nb, na, _) => na < nb })
  }

  test("jaccard join finds planted near-duplicates, prefix filter is lossless") {
    // brute-force jaccard over all pairs computed locally as ground truth
    val local = docs.select(col("doc_id"), TextFunctions.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().map { case (id, sh) => (id, sh.toSet) }
    val expected = (for {
      (a, sa) <- local; (b, sb) <- local if a < b
      common = (sa & sb).size
      if common.toDouble / (sa.size + sb.size - common) >= 0.8
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "corpus should contain planted near-dups")
    val got = Dedup.jaccardSimilarityJoin(docs, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("materialize=true: same pairs, no internal cache left behind") {
    spark.catalog.clearCache()
    val expected = Dedup.minhashLshPairs(docs, 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    // SET-difference, not size arithmetic (r13): getPersistentRDDs is
    // weak-valued — checkpointed results left by earlier tests vanish
    // on GC between the baseline and the assertion, so absolute
    // counts flake; only the NEWLY-added entries are this test's
    val base = spark.sparkContext.getPersistentRDDs.keySet
    val out = Dedup.minhashLshPairs(docs, 0.5, materialize = true)
    // synchronous release: only the checkpointed RESULT remains — the
    // withSig shingle cache is gone before the call even returns
    val added1 = spark.sparkContext.getPersistentRDDs.keySet -- base
    assert(added1.size == 1,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toSeq.toString)
    assert(out.select("da", "db").as[(Long, Long)].collect().toSet == expected)
    // same contract on the jaccard + triangle + unigram paths
    val j = Dedup.jaccardSimilarityJoin(docs, 0.8, materialize = true)
    val added2 = spark.sparkContext.getPersistentRDDs.keySet -- base -- added1
    assert(added2.size == 1,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toSeq.toString)
    assert(j.count() > 0)
  }

  test("minhash LSH: verified candidates are a subset of true pairs; high-sim pairs found") {
    val lsh = Dedup.minhashLshPairs(docs, 0.5)
      .select(col("da"), col("db"),
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .as[(Long, Long, Double)].collect()
    // jaccard here is over hashed shingle VALUES; recompute ground truth in kind
    val local = docs.select(col("doc_id"), TextFunctions.shingleVals(col("text")).as("sv"))
      .as[(Long, Seq[Long])].collect().map { case (id, sv) => (id, sv.toSet) }
    val trueHigh = (for {
      (a, sa) <- local; (b, sb) <- local if a < b
      common = (sa & sb).size
      j = common.toDouble / (sa.size + sb.size - common)
      if j >= 0.9
    } yield (a, b)).toSet
    val gotPairs = lsh.map(r => (r._1, r._2)).toSet
    // all verified outputs really have J >= 0.5
    assert(lsh.forall(_._3 >= 0.5))
    // LSH with 8 bands x 4 rows catches essentially all J>=0.9 pairs
    val missed = trueHigh -- gotPairs
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("embedding cosine near-dup: blocked pairs match a local model") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Dedup.embeddingCosinePairs(emb, 0.35)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val local = emb.select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dotS(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => math.round((p * q).toDouble * 1e12) }.sum
      val c = (dotS(a, b) / 1e12) /
        (math.sqrt(dotS(a, a) / 1e12) * math.sqrt(dotS(b, b) / 1e12))
      math.round(c * 1e6) / 1e6
    }
    val expected = (for {
      (ia, la, ea) <- local; (ib, lb, eb) <- local
      if ia < ib && la == lb && cos(ea, eb) >= 0.35
    } yield (ia, ib)).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("simhash: near-identical docs collide in most bits, random docs don't") {
    val d = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and often"),
      (3L, "completely different words about spark catalyst tungsten shuffles"))
    val h = d.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) <= 4)
    assert(hamming(h(1L), h(3L)) > 4)
  }

  test("simhashHammingPairs equals brute-force within-radius pairs (banding is lossless)") {
    // 40 synthetic docs: enough fingerprint spread that some pairs sit
    // inside radius 3 and most outside — the banded join must return
    // EXACTLY the brute-force set, both directions
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 12).map(j => words((i * 7 + j * 5) % 12) +
        (if ((i + j) % 3 == 0) i % 5 else "")).mkString(" "))
    }
    val d = docsDf(docs: _*)
    val got = Dedup.simhashHammingPairs(d, 3)
      .select("da", "db", "hamming").as[(Long, Long, Long)].collect().toSet
    val sh = d.select(col("doc_id"),
        graft.functions.TextExprs.simhashFast(col("text"), Dedup.HammingBits))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- sh; (ib, hb) <- sh if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb).toLong if h <= 3
    } yield (ia, ib, h)).toSet
    assert(brute.nonEmpty, "fixture must plant at least one within-radius pair")
    assert(got == brute)
  }

  test("simhashHammingPairs: lossless across radii 1 and 6 on pseudo-random corpora") {
    // the pigeonhole guarantee must hold for every (maxHamming+1)-band
    // split that divides 28 — exercise radius 1 (2x14-bit bands) and
    // radius 6 (7x4-bit bands) against brute force on a generated corpus
    val words = Seq("zeta", "eta", "iota", "kappa", "mu", "nu", "xi", "pi",
      "rho", "tau", "phi", "chi", "psi", "omega")
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 10).map(j => words((i * 11 + j * 3) % 14)).mkString(" "))
    }
    val d = docsDf(docs: _*)
    val sh = d.select(col("doc_id"),
        graft.functions.TextExprs.simhashFast(col("text"), Dedup.HammingBits))
      .as[(Long, Long)].collect()
    for (radius <- Seq(1, 6)) {
      val got = Dedup.simhashHammingPairs(d, radius)
        .select("da", "db").as[(Long, Long)].collect().toSet
      val brute = (for {
        (ia, ha) <- sh; (ib, hb) <- sh
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= radius
      } yield (ia, ib)).toSet
      assert(got == brute, s"radius=$radius")
    }
  }

  test("containmentJoin: a planted quote is contained in its source, not vice versa") {
    val src = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val quote = "delta echo foxtrot golf hotel india juliet kilo lima mike" // tokens 4-13 of src
    val other = "uniform victor whiskey xray yankee zulu amber basil cedar dune"
    val docs = Seq((1L, "en", src), (2L, "en", quote), (3L, "en", other))
      .toDF("doc_id", "lang", "text")
    val got = Dedup.containmentJoin(docs, 0.9)
      .select("da", "db").as[(Long, Long)].collect().toSet
    // all 8 of the quote's shingles appear in src (containment 1.0);
    // src has 18 shingles so the reverse direction is 8/18 — and the
    // symmetric Jaccard is 8/18 too, far under any dedup threshold:
    // exactly the pair a Jaccard join cannot see
    assert(got == Set((2L, 1L)))
    val jac = Dedup.jaccardSimilarityJoin(docs, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty)
  }

  test("nearDupClusters: transitive chain a~b~c is ONE cluster with no a~c pair") {
    // fixture chosen (by replaying the exact minhash/band arithmetic)
    // so the verified pair graph is exactly {(10,11),(11,12)}:
    // J(A,B)=J(B,C)=0.6 with shared LSH bands, J(A,C)=0.333 — below
    // threshold AND zero shared bands — and D is token-disjoint noise.
    // Clustering must still put A,B,C together: that's the transitive
    // closure a pairwise dedup misses.
    val a = "zulu oscar charlie amber basil india papa whiskey victor dune bravo juliet cedar sierra"
    val b = "zulu oscar charlie amber basil india papa whiskey victor dune bravo tango xray quebec"
    val c = "hotel alpha lima amber basil india papa whiskey victor dune bravo tango xray quebec"
    val d = "mike november romeo uniform yankee foxtrot golf kilo echo delta"
    val docs = Seq((10L, "en", a), (11L, "en", b), (12L, "en", c), (13L, "en", d))
      .toDF("doc_id", "lang", "text")
    val pairs = Dedup.minhashLshPairs(docs, 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (11L, 12L)))
    val clusters = Dedup.nearDupClusters(docs, 0.5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(clusters == Seq((10L, 3L, 12L, 33L))) // (cluster_id, n, max, sum)
  }

  test("dedupKeep drops exactly the non-representative cluster members") {
    // chain fixture from the clusters test: a~b~c one cluster -> keep
    // min id only; the unrelated doc passes through
    val a = "zulu oscar charlie amber basil india papa whiskey victor dune bravo juliet cedar sierra"
    val b = "zulu oscar charlie amber basil india papa whiskey victor dune bravo tango xray quebec"
    val other = "mike november romeo uniform yankee foxtrot golf kilo echo delta"
    val docs = docsDf((10L, a), (11L, b), (20L, other))
    val kept = Dedup.dedupKeep(docs, 0.5)
      .select("doc_id").as[Long].collect().toSet
    val pairs = Dedup.minhashLshPairs(docs, 0.5)
      .select("da", "db").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must plant a near-dup pair")
    assert(kept == Set(10L, 20L))
  }

  test("fingerprint: identical token streams collide, different ones don't") {
    val d = docsDf((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c e"))
    val f = d.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(f(1L) == f(2L) && f(1L) != f(3L))
  }

  test("sorted-neighborhood: word-order-perturbed near-dups land adjacent and verify") {
    // docs 1/2 are the same bag of words in different order — the
    // token-SORTED key makes them window neighbors even though a raw
    // text sort would separate them; doc 3 is unrelated
    val d = docsDf(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "beta alpha gamma delta epsilon zeta"),
      (3L, "one two three four five six"))
    val pairs = Dedup.sortedNeighborhoodPairs(d, window = 3, threshold = 0.1)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("sorted-neighborhood pairs are a subset of the exact jaccard join") {
    val snm = Dedup.sortedNeighborhoodPairs(docs, window = 4, threshold = 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val full = Dedup.jaccardSimilarityJoin(docs, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(snm.subsetOf(full))
    // single-pass window-4 recall is partial BY DESIGN; at sf0.01 it
    // finds 6 of 25 pairs — just pin that it finds SOMETHING real on
    // the sf0.001 corpus if any true pairs exist there
    if (full.nonEmpty) assert(snm.nonEmpty)
  }

  test("multi-pass SNM: recall never drops vs single-pass, stays a subset of exact") {
    val single = Dedup.sortedNeighborhoodPairs(docs, window = 4, threshold = 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val multi = Dedup.sortedNeighborhoodMultiPass(docs,
      Seq(Dedup.snmKeyTokenSorted, Dedup.snmKeyTokenReversed),
      window = 4, threshold = 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val full = Dedup.jaccardSimilarityJoin(docs, 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi), "a pass can only ADD candidates")
    assert(multi.subsetOf(full))
  }

  test("hot-bucket guard: a degenerate boilerplate bucket cannot go quadratic") {
    // VERDICT r8 #2 adversarial case: 300 identical boilerplate docs
    // (viral template) collide in ALL their band buckets — unguarded,
    // that is 300*299/2 = 44850 candidate pairs from one template.
    val boiler = (1000L until 1300L).map(i =>
      (i, "breaking news local weather sponsored content click here to subscribe now"))
    val planted = Seq( // identical pair -> collides in every band, buckets of size 2
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val d = docsDf((boiler ++ planted): _*)
    // default cap (64): the 300-doc buckets are excluded, candidate
    // volume stays bounded, and the planted under-cap pair still found
    val guarded = Dedup.minhashLshPairs(d, 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(guarded == Set((1L, 2L)),
      s"guard must drop boilerplate pairs, keep the planted pair: $guarded")
    // cap lifted above the bucket: the same input really is quadratic,
    // proving the cap (not luck) is what bounds the candidate count
    val unguarded = Dedup.minhashLshPairs(d, 0.5, bucketCap = 1000000)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(unguarded.size == 300 * 299 / 2 + 1, unguarded.size.toString)
    // the monitor reports exactly the 8 hot buckets (one per band) at 300 docs
    val stats = Dedup.bandBucketStats(d).as[(Int, Long, Long)].collect()
    assert(stats.length == 8 && stats.forall(_._3 == 300L), stats.mkString(","))
  }

  test("hot-bucket guard: no-op on the gate fixture (cap far above max bucket)") {
    // measured max bucket: 4 at sf0.01, 12 at sf0.1 — the default cap
    // must not change gate results (q_dedup_minhash stays hash-green)
    val capped = Dedup.minhashLshPairs(docs, 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minhashLshPairs(docs, 0.5, bucketCap = Int.MaxValue)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
    assert(Dedup.bandBucketStats(docs).isEmpty)
  }

  test("dup-weight histogram: each duplicate group carries one doc of mass") {
    // 3 copies of A, 2 of B, 1 of C: weights 333333/500000/1000000 ppm
    val fix = Seq((1L, "a a"), (2L, "a a"), (3L, "a a"),
      (4L, "b b"), (5L, "b b"), (6L, "c c"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val dirTf = new java.io.File("/tmp/graft_dupw_fix")
    fix.write.mode("overwrite").parquet(dirTf + "/documents.parquet")
    val out = graft.ops.TextOps.qDupWeights(spark, dirTf.toString)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (3L, 333333L, 3L, 999999L),
      (2L, 500000L, 2L, 1000000L),
      (1L, 1000000L, 1L, 1000000L)))
  }
}
