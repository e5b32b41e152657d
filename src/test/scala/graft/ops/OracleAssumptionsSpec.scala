package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards for the corpus properties the DuckDB oracles depend on.
  * Each assumption, if silently violated by regenerated testdata,
  * would surface as an opaque hash mismatch in the driver gate; these
  * tests turn it into a named failure pointing at the exact
  * assumption instead.
  */
class OracleAssumptionsSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("documents.text is ASCII: DuckDB strlen == UTF-8 byte length") {
    // every text oracle (multimodal dims, audio stats, shingles,
    // repetition) equates strlen(text) with payload byte length
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .filter(length(col("text")) =!=
          octet_length(encode(col("text"), "UTF-8")))
        .count()
      assert(bad == 0, s"$d has non-ASCII docs — strlen-based oracles break")
    }
  }

  test("lineitem.l_quantity is integral: BIGINT cast round==truncate") {
    // q_cogroup_sorted casts quantity to BIGINT on both engines; Spark
    // truncates, DuckDB rounds — only safe while values are integral
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/lineitem.parquet")
        .filter(col("l_quantity") =!= floor(col("l_quantity")))
        .count()
      assert(bad == 0, s"$d has fractional quantities — BIGINT casts diverge")
    }
  }

  test("id columns are non-negative: idBucket sends negatives to 'train'") {
    // splitLabel/sampleFilter/mixtureFilter document the non-negative
    // precondition (Sampling.idBucket scaladoc)
    for (d <- dirs) {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") < 0).count()
      // events.parquet is ns-precision — must go through Tables.t
      val evs = graft.Tables.t(spark, d, "events")
        .filter(col("event_id") < 0 || col("user_id") < 0).count()
      assert(docs == 0 && evs == 0, s"$d has negative ids")
    }
  }

  test("documents have no empty text and tokens carry no empty runs the shingle exprs disagree on") {
    // shingles3/sqlShingles3 agree on single-space-separated tokens;
    // leading/trailing/double spaces would make Spark's split and
    // DuckDB's string_split diverge on empty tokens
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("text").isNull || col("text") === "" ||
          col("text").startsWith(" ") || col("text").endsWith(" ") ||
          col("text").contains("  "))
        .count()
      assert(bad == 0, s"$d has empty/irregularly-spaced docs")
    }
  }

  test("event epochs fit the funnel's bit-packed encoding") {
    // q_funnel_ordered packs sec<<24 into a BIGINT and divides
    // non-negative states: sec must be positive and < 2^39 (year
    // ~19k) so sec<<24 < 2^63 with headroom, and per-user event
    // counts must stay far from the 2^21 rank wrap
    for (d <- dirs) {
      val e = graft.Tables.t(spark, d, "events")
        .select(col("ts").cast("long").as("sec"), col("user_id"))
      val badSec = e.filter(col("sec") <= 0 || col("sec") >= (1L << 39)).count()
      assert(badSec == 0, s"$d has epochs outside the packable range")
      val maxPerUser = e.groupBy(col("user_id")).count()
        .agg(max(col("count"))).head.getLong(0)
      assert(maxPerUser < (1L << 20), s"$d per-user events near the rank wrap")
    }
  }
}
