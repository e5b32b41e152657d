package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // buckets (wordVal % 128): "aa" -> 34, "zz" -> 66, "abc" -> 99
  private val docs = Seq(
    (0L, "aa aa aa abc", "en"), // target: 3 tokens in b34, 1 in b99
    (1L, "aa aa", "de"),        // candidate sharing target vocabulary
    (2L, "zz zz", "fr"),        // candidate with non-target vocabulary
  ).toDF("doc_id", "text", "lang")

  test("bucket weights are the smoothed ppm ratio, incl. target-only buckets") {
    val w = Importance.bucketWeights(docs, $"lang" === "en")
      .as[(Long, Long)].collect().toMap
    assert(w(34L) == (3L + 1) * 1000000L / (2L + 1)) // 1333333
    assert(w(66L) == (0L + 1) * 1000000L / (2L + 1)) // 333333
    assert(w(99L) == (1L + 1) * 1000000L / (0L + 1)) // target-only bucket
  }

  test("select ranks target-vocabulary candidates first with exact scores") {
    val r = Importance.select(docs, $"lang" === "en", k = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(r == Seq((1L, "de", 1333333L), (2L, "fr", 333333L)))
  }

  test("scoreWith serves a stream identically to the batch pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val raw = corpus.filter($"lang" =!= "en")
    val w = Importance.weightsMap(corpus, $"lang" === "en")
    // batch reference through the distributed join pipeline (k large
    // enough to keep every candidate)
    val batch = Importance.select(corpus, $"lang" === "en", k = 100000)
      .as[(Long, String, Long)].collect()
      .map { case (id, lang, s) => (id, (lang, s)) }.toMap
    val in = MemoryStream[(Long, String, String)]
    val q = Importance.scoreWith(
        in.toDF().toDF("doc_id", "text", "lang"), w)
      .writeStream.format("memory").queryName("imp_scores")
      .outputMode("append").start()
    in.addData(raw.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSeq)
    q.processAllAvailable(); q.stop()
    val got = spark.table("imp_scores").as[(Long, String, Long)].collect()
      .map { case (id, lang, s) => (id, (lang, s)) }.toMap
    assert(got == batch)
  }

  test("weight table stays bounded at the bucket count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = Importance.bucketWeights(docs, $"lang" === "en").count()
    assert(n <= Importance.Buckets)
  }
}
