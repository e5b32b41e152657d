package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TextNormSpec extends SparkSpec {

  import spark.implicits._

  private def norm(raw: String*): Seq[String] =
    raw.toDF("t").select(TextFunctions.normalizeText(col("t")))
      .as[String].collect().toSeq

  test("NFC composes combining sequences to the precomposed form") {
    val out = Seq("é", "é").toDF("t")
      .select(TextNorm.nfcNormalize(col("t"))).as[String].collect()
    assert(out(0) == "é" && out(1) == "é")
  }

  test("normalizeText strips controls, collapses space runs, trims") {
    assert(norm("\ta b  c ") == Seq("a b c"))
    assert(norm("already clean") == Seq("already clean"))
    // decomposed and precomposed inputs normalize byte-identically
    val Seq(a, b) = norm("é x", "é  x")
    assert(a == b && a == "é x")
  }

  test("normalizeText is idempotent") {
    val raw = Seq("é\t x ", " y z", "plain")
    val once = norm(raw: _*)
    assert(norm(once: _*) == once)
  }
}
