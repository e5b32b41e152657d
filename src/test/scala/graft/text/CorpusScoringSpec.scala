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
