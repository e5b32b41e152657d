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

  test("int8 IVF: recall vs brute force; scan never reads floats; re-rank exact") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)

    IvfIndex.writeInt8(emb, "ivf8_test_idx", nlist = 16, iterations = 3)
    val served = IvfIndex.searchInt8(spark, "ivf8_test_idx", queries, k = 5)

    // recall@5 vs exact brute force: the int8 stage only pre-selects
    // candidates (top-25 of the probed cells); the float re-rank is
    // exact, so recall should track the float IVF's probe coverage
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ann = served.select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall > 0.5, s"int8 IVF recall collapsed: $recall")

    // the surviving sims are EXACT float cosines: every served (qid,
    // cid, sim) must agree with the brute-force sim for that pair
    val bruteSims = Similarity.bruteForceTopK(emb, queries, 1000)
      .select("qid", "cid", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    served.select("qid", "cid", "sim").as[(Long, Long, Double)].collect()
      .foreach { case (q, c, s) =>
        assert(bruteSims.get((q, c)).contains(s), s"sim mismatch for ($q,$c)")
      }

    // the int8 candidate scan must not read the float embedding
    // column — the memory-bandwidth win is the point of the index.
    // The float column appears only in the re-rank side's scan of the
    // _vecs table, never in the cell-bucketed code table's scan.
    val plan = IvfIndex.searchInt8(spark, "ivf8_test_idx", queries, k = 5)
      .queryExecution.executedPlan.toString
    val codeScan = plan.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("ivf8_test_idx") &&
        !l.contains("ivf8_test_idx_")).toSeq
    assert(codeScan.nonEmpty, plan)
    assert(codeScan.forall(!_.contains("embedding")),
      "int8 scan reads the float column:\n" + codeScan.mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)

    IvfIndex.dropInt8(spark, "ivf8_test_idx")
  }
}
