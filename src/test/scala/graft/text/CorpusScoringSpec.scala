package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusScoringSpec extends SparkSpec {

  import spark.implicits._

  test("unigram scores: common-word docs outrank rare-word docs; exact arithmetic") {
    // corpus: "the cat" dominates; doc 3 is all-unique garbage
    val docs = Seq(
      (1L, "en", "the cat the cat the cat"),
      (2L, "en", "the cat sat"),
      (3L, "en", "qz wx vj kp")).toDF("doc_id", "lang", "text")
    val got = CorpusScoring.unigramScores(docs)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    // N=13 tokens: the=4, cat=4, sat=1, rares=1 each
    // w: the=cat=(4*1e6)//13=307692, sat/rare=(1e6)//13=76923
    assert(got(1L) == 307692L)                      // all common
    assert(got(2L) == (307692L * 2 + 76923L) / 3)   // mixed
    assert(got(3L) == 76923L)                       // all rare
    assert(got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("bigram scores: train-band counts, held-out backoff, exact arithmetic") {
    // id buckets (same hash as Sampling.splitLabel): 1,2,3 are in the
    // train band, 4 is held out — so doc 4's unseen bigrams exercise
    // the backoff path against counts it did not contribute to
    val docs = Seq(
      (1L, "en", "a b a b"),
      (2L, "en", "a b c"),
      (3L, "en", "solo"),
      (4L, "en", "a b z c")).toDF("doc_id", "lang", "text")
    val got = CorpusScoring.bigramScores(docs)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    // train: c1 = {a:3, b:3, c:1, solo:1}, N=8; c2 = {(a,b):3, (b,a):1, (b,c):1}
    // w2(a,b) = 3e6 div 3 = 1000000; w2(b,a) = w2(b,c) = 1e6 div 3 = 333333
    // w1(c) = ((1e6 div 8)) div 2 = 62500
    assert(got(1L) == (1000000L + 333333L + 1000000L) / 3)
    assert(got(2L) == (1000000L + 333333L) / 2)
    // doc 4: (a,b) seen; (b,z) OOV -> 0; (z,c) unseen -> backoff w1(c)
    assert(got(4L) == (1000000L + 0L + 62500L) / 3)
    assert(!got.contains(3L)) // single-token doc has no bigrams
  }

  test("trigram scores: two-level backoff chain, exact arithmetic") {
    val docs = Seq(
      (1L, "en", "a b a b"),
      (2L, "en", "a b c"),
      (3L, "en", "solo"),
      (4L, "en", "a b z c")).toDF("doc_id", "lang", "text")
    val got = CorpusScoring.trigramScores(docs)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    // train (docs 1-3): c1 = {a:3,b:3,c:1,solo:1} N=8;
    // c2 = {(a,b):3,(b,a):1,(b,c):1}; c3 = {(a,b,a):1,(b,a,b):1,(a,b,c):1}
    // w3(a,b,a) = 1e6 div c2(a,b)=3 = 333333; w3(b,a,b) = 1e6 div 1
    assert(got(1L) == (333333L + 1000000L) / 2)
    assert(got(2L) == 333333L) // (a,b,c): 1e6 div 3
    // doc 4: (a,b,z) unseen at every level with z OOV -> 0;
    // (b,z,c) falls through to w1(c) = ((1e6 div 8) div 2) div 2
    assert(got(4L) == (0L + 31250L) / 2)
    assert(!got.contains(3L)) // < 3 tokens: no trigrams
  }

  test("bigram materialize=true: same scores, no internal cache left behind") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    spark.catalog.clearCache()
    val expected = CorpusScoring.bigramScores(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    spark.catalog.clearCache()
    val base = spark.sparkContext.getPersistentRDDs.size
    val out = CorpusScoring.bigramScores(docs, materialize = true)
    // synchronous release: only the checkpointed per-doc RESULT remains
    // — the w2/w1 weight caches AND the withW2 barrier are gone before
    // the call returns
    assert(spark.sparkContext.getPersistentRDDs.size == base + 1,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toSeq.toString)
    assert(out.as[(Long, String, Long)].collect().sortBy(_._1).toSeq == expected)
    spark.catalog.clearCache()
  }

  test("hybridWeightJoin: hot/tail split is result-invariant vs a plain join") {
    val rows = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"), (5L, "w"))
      .toDF("id", "k")
    val weights = Seq(("x", 10L, 100L), ("y", 2L, 200L), ("z", 1L, 300L))
      .toDF("k", "freq", "w")
    for (hotN <- Seq(0, 1, 2, 10); jt <- Seq("inner", "left")) {
      val hybrid = CorpusScoring
        .hybridWeightJoin(rows, weights, Seq("k"), "freq", hotN, jt)
        .select("id", "k", "w").as[(Long, String, Option[Long])]
        .collect().sortBy(_._1).toSeq
      val plain = rows.join(weights.drop("freq"), Seq("k"), jt)
        .select("id", "k", "w").as[(Long, String, Option[Long])]
        .collect().sortBy(_._1).toSeq
      assert(hybrid == plain, s"hotN=$hotN joinType=$jt")
    }
  }

  test("unigram scores: deterministic under repartition") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val a = CorpusScoring.unigramScores(docs)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val b = CorpusScoring.unigramScores(docs.repartition(11))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
  }
}
