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
}
