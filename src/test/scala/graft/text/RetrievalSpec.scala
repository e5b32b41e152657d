package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // a 4-doc corpus where the BM25 ordering is hand-checkable:
  // "rust" appears only in docs 2 and 3 (rare term), "the" in all
  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat"),
    (2L, "rust is a language the compiler loves"),
    (3L, "rust rust rust"),
  ).toDF("doc_id", "text")

  test("bm25TopK ranks the rare-term doc above the stopword-only match") {
    val queries = Seq((100L, "rust"), (100L, "the")).toDF("qid", "tok")
    val top = Retrieval.bm25TopK(docs, queries, k = 4)
      .orderBy("rk").select("doc_id", "rk").as[(Long, Int)].collect()
    // doc 3 (tf=3 of the rarest term, shortest doc) must rank first,
    // then doc 2 (rust once + "the" once); the stopword-only docs
    // trail because idf("the") is tiny ((2N-2·3+1)/(2·3+1) = 3/7 → 0
    // in floor ppm... no: (8-6+1)*1e6//7 = 428571 ppm, nonzero)
    assert(top.take(2).map(_._1).toSeq == Seq(3L, 2L))
    assert(top.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("docs sharing no query term are absent; scores are positive") {
    val queries = Seq((7L, "compiler")).toDF("qid", "tok")
    val r = Retrieval.bm25TopK(docs, queries, k = 10)
      .select("doc_id", "score").as[(Long, Long)].collect()
    assert(r.map(_._1).toSeq == Seq(2L))
    assert(r.forall(_._2 > 0))
  }

  test("rank window is a WindowGroupLimit (map-side partial top-k)") {
    // a query term matching most of the corpus ("the") must not feed
    // a full per-query sort: the rank<=k filter has to be pushed into
    // a WindowGroupLimit so each task keeps k rows per query
    val queries = Seq((1L, "the")).toDF("qid", "tok")
    val df = Retrieval.bm25TopK(docs, queries, k = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  // hybrid fixture: doc 1 matches query 0 lexically AND is its
  // 2nd-nearest embedding; doc 2 is nearest-embedding only
  private val hDocs = Seq(
    (0L, "alpha beta"), (1L, "alpha beta gamma"),
    (2L, "delta epsilon"), (3L, "zeta eta")).toDF("doc_id", "text")
  private val hEmb = Seq(
    (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0.8f, 0.2f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f, 0f)), (3L, Array(0f, 1f, 0f, 0f)),
  ).toDF("vec_id", "embedding")

  test("hybridTopK: a doc hit by both legs outranks single-leg hits") {
    val queries = Seq((0L, "alpha"), (0L, "beta")).toDF("qid", "tok")
    val qVecs = hEmb.filter($"vec_id" === 0L)
    val r = Retrieval.hybridTopK(hDocs, hEmb, queries, qVecs, kEach = 3, k = 3)
      .orderBy("rk").select("doc_id", "rrf", "rk").as[(Long, Long, Int)]
      .collect()
    // doc 1: lexical rank 1 + semantic rank 2 (sim ~0.970 vs doc 2's
    // exact 1.0); doc 2: semantic-only rank 1; doc 3: semantic rank 3
    assert(r.toSeq == Seq(
      (1L, 1000000000L / 61 + 1000000000L / 62, 1),
      (2L, 1000000000L / 61, 2),
      (3L, 1000000000L / 63, 3)))
    // the query doc itself is excluded from both legs
    assert(!r.map(_._1).contains(0L))
  }

  test("idf decreases with df and the decomposed product is exact") {
    // cross-check the overflow-safe decomposition against the direct
    // product at values where the direct form cannot overflow
    val r = spark.range(1).selectExpr(
      "2200000L * (428571L div 1000000L) + (2200000L * (428571L % 1000000L)) div 1000000L as dec",
      "(2200000L * 428571L) div 1000000L as direct").head()
    assert(r.getLong(0) == r.getLong(1))
  }
}
