package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  test("flagOverlap finds planted contamination and nothing else") {
    val probe = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains probe 100's full text -> 4 shared 3-gram shingles
      (1L, "xx alpha beta gamma delta epsilon zeta yy"),
      // shares exactly two shingles ("beta gamma delta", "gamma delta epsilon") -> below minCommon=3
      (2L, "beta gamma delta epsilon unrelated words here"),
      // no overlap
      (3L, "totally different content with no shared trigrams at all"),
    ).toDF("doc_id", "text")
    val got = Decontaminate.flagOverlap(corpus, probe, minCommon = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 4L)), got.toString)
  }

  test("flagOverlap plan broadcasts the probe side, never the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isProbe = Sampling.sampleFilter(col("doc_id"), 20)
    val plan = Decontaminate
      .flagOverlap(docs.filter(!isProbe), docs.filter(isProbe))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
