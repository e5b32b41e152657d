package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Bit-for-bit parity of the one-pass MinHashSigExpr against the
  * Column-HOF reference formulation (the TextExprsSpec pattern). */
class MinHashSigSpec extends SparkSpec {

  import spark.implicits._

  test("MinHashSigExpr matches the HOF reference bit-for-bit on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(TextFunctions.shingleVals(col("text")).as("sv"))
    val both = docs.select(
      Dedup.minhashSignature_(col("sv")).as("fast"),
      Dedup.minhashSignatureRef(col("sv")).as("ref"))
    assert(both.filter(not(col("fast") <=> col("ref"))).count() == 0)
  }

  test("MinHashSigExpr edge cases: empty array -> all-null slots, null input -> null") {
    val df = Seq(
      (1L, Some(Seq.empty[Long])),
      (2L, Some(Seq(7L, 42L, 1000000006L))),
      (3L, Option.empty[Seq[Long]]),
    ).toDF("id", "sv")
    val both = df.select(col("id"),
      Dedup.minhashSignature_(col("sv")).as("fast"),
      Dedup.minhashSignatureRef(col("sv")).as("ref"))
    // parity on non-null inputs; a null input propagates null from the
    // expression form (the HOF array() builds [null x k] instead)
    assert(both.filter(col("sv").isNotNull)
      .filter(not(col("fast") <=> col("ref"))).count() == 0)
    assert(both.filter(col("id") === 3L).select(col("fast")).head().isNullAt(0))
    val empty = both.filter(col("id") === 1L).select(col("fast")).head()
      .getSeq[Any](0)
    assert(empty.size == Dedup.NumHashes && empty.forall(_ == null))
  }
}
