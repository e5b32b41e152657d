package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  test("persisted IVF index answers identically to the in-session IVF search") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val direct = Similarity.ivfTopK(emb, queries, k = 5)
      .orderBy("qid", "rk").collect().toSeq

    IvfIndex.write(emb, "ivf_test_idx", nlist = 16, iterations = 3)
    val served = IvfIndex.search(spark, "ivf_test_idx", queries, k = 5)
      .orderBy("qid", "rk").collect().toSeq
    assert(served == direct)

    // serving plan must not re-shuffle or broadcast the corpus side
    val plan = IvfIndex.search(spark, "ivf_test_idx", queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    spark.sql("DROP TABLE IF EXISTS ivf_test_idx")
    spark.sql("DROP TABLE IF EXISTS ivf_test_idx_centroids")
  }
}
