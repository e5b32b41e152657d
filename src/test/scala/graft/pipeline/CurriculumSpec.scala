package graft.pipeline

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = Curriculum.stages(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    .as[(Int, Long, Long, Long)].collect()
    .map { case (s, n, lo, hi) => (s, (n, lo, hi)) }.toMap

  test("stages partition the corpus") {
    assert(out.values.map(_._1).sum == 500L)
    assert(out.keySet.subsetOf(Set(1, 2, 3, 4)) && out.nonEmpty)
  }

  test("stage score bands are disjoint and ordered easy to hard") {
    // stage k+1 scores sit strictly below stage k's band start
    val present = out.keys.toSeq.sorted
    present.sliding(2).foreach {
      case Seq(a, b) =>
        assert(out(b)._3 < out(a)._2,
          s"stage $b max ${out(b)._3} !< stage $a min ${out(a)._2}")
      case _ =>
    }
  }

  test("thresholds are deterministic across runs") {
    val again = Curriculum.stages(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .as[(Int, Long, Long, Long)].collect()
      .map { case (s, n, lo, hi) => (s, (n, lo, hi)) }.toMap
    assert(again == out)
  }
}
