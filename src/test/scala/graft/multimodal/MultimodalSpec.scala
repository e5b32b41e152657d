package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media table: binary payload round-trips byte-exactly") {
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val back = media.select(col("media_id"),
        decode(col("payload"), "UTF-8").as("text2"))
      .join(docs, col("media_id") === col("doc_id"))
      .filter(col("text2") =!= col("text"))
    assert(back.count() == 0)
  }

  test("batched decode produces fixed-width features with stable dims") {
    val media = Multimodal.asMediaTable(docs.limit(50))
    val decoded = Multimodal.decodeFeatures(media).collect()
    assert(decoded.length == 50)
    assert(decoded.forall(_.features.length == 8))
    assert(decoded.forall(d => d.width >= 64 && d.height >= 64))
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(decoded.map(_.media_id).sorted.sameElements(again.map(_.media_id).sorted))
  }

  test("format stats aggregate over decoded metadata") {
    val stats = Multimodal.formatStats(Multimodal.asMediaTable(docs))
      .as[(String, Long, Long, Long, Int)].collect()
    assert(stats.map(_._1).sorted.toSeq == Seq("fmt0", "fmt1", "fmt2"))
    assert(stats.map(_._2).sum == docs.count())
  }
}
