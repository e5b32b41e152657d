package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Imperative text-hash expressions must match the HOF reference
  * formulations bit-for-bit on the real corpus (they share the DuckDB
  * oracle, so any drift would also break the correctness gate). */
class TextExprsSpec extends SparkSpec {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("FingerprintExpr == HOF fingerprint on the whole corpus") {
    val diff = docs.select(
        TextFunctions.fingerprint(col("text")).as("fast"),
        TextFunctions.fingerprintHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("Shingles3Expr == HOF shingles on the whole corpus") {
    val diff = docs.select(
        TextFunctions.shingles(col("text")).as("fast"),
        TextFunctions.shinglesHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("ShingleVals3Expr == HOF shingleVals on the whole corpus") {
    val diff = docs.select(
        TextFunctions.shingleVals(col("text")).as("fast"),
        TextFunctions.shingleValsHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("SimHashExpr == HOF simhash on the whole corpus + edges") {
    import graft.dedup.Dedup
    import spark.implicits._
    val diff = docs.select(
        Dedup.simhash(col("text")).as("fast"),
        Dedup.simhashRef(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
    val edge = Seq("", "a", "a b", "a a a a", "x y z x y z").toDF("text")
    val ediff = edge.select(Dedup.simhash(col("text")).as("fast"),
        Dedup.simhashRef(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(ediff.count() == 0)
  }

  test("edge cases: short docs, repeated words, single word") {
    import spark.implicits._
    val edge = Seq("a b", "a", "a a a a", "x y z", "x y z x y z").toDF("text")
    val diff = edge.select(
        TextFunctions.shingleVals(col("text")).as("f1"),
        TextFunctions.shingleValsHof(col("text")).as("r1"),
        TextFunctions.shingles(col("text")).as("f2"),
        TextFunctions.shinglesHof(col("text")).as("r2"),
        TextFunctions.fingerprint(col("text")).as("f3"),
        TextFunctions.fingerprintHof(col("text")).as("r3"))
      .filter(col("f1") =!= col("r1") || col("f2") =!= col("r2") ||
        col("f3") =!= col("r3"))
    assert(diff.count() == 0)
  }
}
