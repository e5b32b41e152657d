package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misuse of the custom expressions must fail at analysis time, not
  * silently misread bytes: ArrayData.getFloat over an array<double>
  * child yields garbage distances (ADVICE r3 #1). */
class TypeChecksSpec extends SparkSpec {

  import spark.implicits._

  private def analysisFails(f: => Any): Unit = {
    val e = intercept[Exception](f)
    assert(e.getClass.getName.toLowerCase.contains("analysis")
      || e.getMessage.contains("requires"), s"unexpected error: $e")
  }

  lazy val doubles = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
  lazy val floats = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
  private val cells = Array(Array(0.0, 0.0), Array(1.0, 1.0))

  test("float-array expressions reject array<double> at analysis time") {
    analysisFails(doubles.select(
      NearestCell.nearestCell(col("v"), cells)).collect())
    analysisFails(doubles.select(
      NearestCell.nearestCells(col("v"), cells, 2)).collect())
    analysisFails(doubles.select(
      CosineSim.cosineSim(col("v"), col("v"))).collect())
    analysisFails(doubles.select(
      LshBucketExpr.lshBucketFast(col("v"), 4, 2)).collect())
  }

  test("minhash_sig rejects non-bigint arrays; text exprs reject non-string") {
    analysisFails(doubles.select(
      MinHashSig.minhashSig(col("v"), Seq((1L, 2L)), 97L)).collect())
    analysisFails(doubles.select(
      TextExprs.fingerprintFast(col("id"))).collect())
    analysisFails(doubles.select(
      TextExprs.shingles3Fast(col("id"))).collect())
    analysisFails(doubles.select(
      TextExprs.shingleVals3Fast(col("id"))).collect())
  }

  test("well-typed inputs still analyze and run") {
    assert(floats.select(
      NearestCell.nearestCell(col("v"), cells).as("c")).head().getInt(0) == 1)
    assert(floats.select(
      CosineSim.cosineSim(col("v"), col("v")).as("s")).head().getDouble(0)
      > 0.999)
  }
}
