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
    val out = Seq("e\u0301", "\u00e9").toDF("t")
      .select(TextNorm.nfcNormalize(col("t"))).as[String].collect()
    assert(out(0) == "\u00e9" && out(1) == "\u00e9")
  }

  test("normalizeText strips controls, collapses space runs, trims") {
    assert(norm("\ta\u000b b  c \u007f") == Seq("a b c"))
    assert(norm("already clean") == Seq("already clean"))
    // decomposed and precomposed inputs normalize byte-identically
    val Seq(a, b) = norm("e\u0301 x", "\u00e9  x")
    assert(a == b && a == "\u00e9 x")
  }

  test("normalizeText is idempotent") {
    val raw = Seq("e\u0301\t x ", " y\u000b\u000b z", "plain")
    val once = norm(raw: _*)
    assert(norm(once: _*) == once)
  }
}
