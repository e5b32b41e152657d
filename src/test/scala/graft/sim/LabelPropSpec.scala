package graft.sim

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  test("majority vote, tie to smaller label, multi-round reach") {
    // node 1's neighbors are seeds 2 (label 7) and 3 (label 9): a
    // 1-1 tie resolved to the smaller label at round 1; node 4 only
    // reaches a label through 1, so it resolves at round 2
    val g = Seq((1L, 2L), (1L, 3L), (4L, 1L)).toDF("qid", "cid")
    val seeds = Seq((2L, 7), (3L, 9)).toDF("vec_id", "label")
    val out = Similarity.propagateLabels(g, seeds, 3)
      .as[(Long, Int, Int)].collect().toSet
    assert(out == Set((2L, 7, 0), (3L, 9, 0), (1L, 7, 1), (4L, 7, 2)))
  }

  test("seeds are clamped; majority beats minority") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("qid", "cid")
    val seeds = Seq((2L, 5), (3L, 8), (4L, 8)).toDF("vec_id", "label")
    val out = Similarity.propagateLabels(g, seeds, 2)
      .as[(Long, Int, Int)].collect().toSet
    // node 1 sees {5, 8, 8} -> majority 8; seed 2 keeps 5 despite
    // its out-edge to label-8 seed 3
    assert(out == Set((2L, 5, 0), (3L, 8, 0), (4L, 8, 0), (1L, 8, 1)))
  }

  test("nodes with no labeled path stay unlabeled") {
    val g = Seq((1L, 2L)).toDF("qid", "cid")
    val seeds = Seq((9L, 1)).toDF("vec_id", "label")
    val out = Similarity.propagateLabels(g, seeds, 3)
      .as[(Long, Int, Int)].collect().toSet
    assert(out == Set((9L, 1, 0)))
  }
}
