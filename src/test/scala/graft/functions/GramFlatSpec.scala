package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity of the codegen'd flat outer product against an HOF
  * reference, plus edge cases (the MinHashSigSpec pattern). */
class GramFlatSpec extends SparkSpec {

  import spark.implicits._

  test("GramFlat matches the nested-transform HOF reference bit-for-bit") {
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("xq"))
    val ref = expr("flatten(transform(xq, (xi, i) -> " +
      "transform(xq, (xj, j) -> xi * xj)))")
    val both = vecs.select(
      GramFlat.gramFlat(col("xq")).as("fast"), ref.as("ref"))
    assert(both.filter(not(col("fast") <=> col("ref"))).count() == 0)
  }

  test("GramFlat edge cases: layout, empty array, null input") {
    val df = Seq(
      (1L, Some(Seq(2L, -3L, 5L))),
      (2L, Some(Seq.empty[Long])),
      (3L, Option.empty[Seq[Long]]),
    ).toDF("id", "xq")
    val got = df.select(col("id"), GramFlat.gramFlat(col("xq")).as("g"))
    // row-major full square: [x0x0, x0x1, x0x2, x1x0, ...]
    assert(got.filter(col("id") === 1L).head().getSeq[Long](1) ==
      Seq(4L, -6L, 10L, -6L, 9L, -15L, 10L, -15L, 25L))
    assert(got.filter(col("id") === 2L).head().getSeq[Long](1).isEmpty)
    assert(got.filter(col("id") === 3L).head().isNullAt(1))
  }

  test("GramFlat rejects non-array<bigint> input") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1.5)).toDF("xq")
        .select(GramFlat.gramFlat(col("xq"))).collect()
    }
    assert(err.getMessage.contains("gram_flat"))
  }
}
