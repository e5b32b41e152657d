package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitextSpec extends SparkSpec {
  import spark.implicits._

  // nlist = nprobe = 4: every source probes every cell, so the
  // cell-blocking is total and margins are hand-computable
  private def mine(min: Long) = Similarity.bitextMine(
    Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (11L, Array(1f, 0f, 0f, 0f), 1),
      (12L, Array(0.6f, 0.8f, 0f, 0f), 1),
      (13L, Array(0f, 0f, 1f, 0f), 1),
    ).toDF("vec_id", "embedding", "label"),
    col("label") === 0, col("label") === 1,
    k = 4, marginPpmMin = min, nlist = 4, nprobe = 4)

  test("mutual-best pairs with exact integer margins") {
    val got = mine(1000000L).as[(Long, Long, Long)].collect().toSet
    // (1,11): sim 1e6, sums 1.6e6 + 1e6, counts 3 + 2
    //   -> 1e6 * 5 * 1e6 div 2.6e6 = 1923076
    // (2,12): sim 8e5, sums 8e5 + 1.4e6 -> 4e12 div 2.2e6 = 1818181
    // 12's best is 2 (1818181 > 1's 1000000), so both are mutual;
    // 13 has zero sims everywhere and is unmatched
    assert(got == Set((1L, 11L, 1923076L), (2L, 12L, 1818181L)))
  }

  test("threshold filters below-margin pairs") {
    assert(mine(1900000L).as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 11L, 1923076L)))
  }

  test("output is a partial matching on the real corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.bitextMine(emb, col("label") === 0,
        col("label") === 1, k = 4, marginPpmMin = 1000000L)
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.map(_._1).distinct.length == r.length, "duplicate src side")
    assert(r.map(_._2).distinct.length == r.length, "duplicate tgt side")
    assert(r.forall(_._3 >= 1000000L))
  }
}
