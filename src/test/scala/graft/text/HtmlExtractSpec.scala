package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private def clean(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.cleanText(col("h")).as("c"))
      .as[String].collect().head

  test("tags strip, dropped blocks vanish whole, block closers segment paragraphs") {
    val html =
      """<!DOCTYPE html><html><head><title>T</title>
        |<style>p { color: red; }</style></head><body>
        |<nav><a href="/">home</a></nav>
        |<h1>Title</h1>
        |<p>First para.</p>
        |<div>Second <b>bold</b> para.</div>
        |<script>var x = 1; if (x < 2) { x = 3; }</script>
        |<footer>copyright</footer></body></html>""".stripMargin
    val got = clean(html)
    assert(got == "Title\nFirst para.\nSecond bold para.",
      s"got: ${got.replace("\n", "\\n")}")
    // boilerplate content must be GONE, not just de-tagged
    assert(!got.contains("color") && !got.contains("var x") &&
      !got.contains("home") && !got.contains("copyright"))
  }

  test("entities decode in the anti-double-decode order; &amp; last") {
    assert(clean("a &lt;b&gt; &quot;c&quot; &#39;d&apos; e&nbsp;f &amp;amp;") ==
      "a <b> \"c\" 'd' e f &amp;")
    // a de-entified tag must NOT become a strippable tag
    assert(clean("&lt;script&gt;alert(1)&lt;/script&gt;") ==
      "<script>alert(1)</script>")
  }

  test("markup-free prose is (whitespace-normalized) identity — extraction is idempotent") {
    val prose = "plain text with  spacing and a < b comparisons"
    val once = clean(prose)
    assert(once == "plain text with spacing and a < b comparisons")
    val twice = Seq(once).toDF("h")
      .select(HtmlExtract.cleanText(col("h")).as("c")).as[String].collect().head
    assert(twice == once, "cleanText must be idempotent on its own output")
    // idempotence on full extraction output too
    val full = clean("<p>one.</p><p>two &amp; three.</p>")
    val again = Seq(full).toDF("h")
      .select(HtmlExtract.cleanText(col("h")).as("c")).as[String].collect().head
    assert(full == "one.\ntwo & three." && again == full)
  }

  test("nesting: inner DIVs segment, self-nested dropped block cuts at first closer (documented single-pass semantics)") {
    assert(clean("<div>outer <div>inner</div> tail</div>") == "outer inner\ntail")
    // self-nested <aside>: single-pass drops up to the FIRST closer;
    // the orphaned tail closer strips as a tag — content 'tail' stays
    val got = clean("<aside>chrome <aside>deep</aside> tail</aside>keep")
    assert(got == "tail keep", s"got: ${got.replace("\n", "\\n")}")
    // unclosed dropped block: content survives de-tagged (documented)
    assert(clean("<p>body</p><script>orphan") == "body\norphan")
  }

  test("paragraph counting and boilerplate ppm are exact and bounded") {
    val df = Seq(
      ("<p>a.</p><p>b.</p><p>c.</p>", 3L),
      ("no markup", 1L),
      ("<style>all chrome</style>", 0L),
      ("", 0L)).toDF("h", "want")
      .withColumn("clean", HtmlExtract.cleanText(col("h")))
      .select(col("h"), col("want"),
        HtmlExtract.nParas(col("clean")).as("got"),
        HtmlExtract.boilerplatePpm(col("h"), col("clean")).as("ppm"))
    df.as[(String, Long, Long, Long)].collect().foreach {
      case (h, want, got, ppm) =>
        assert(got == want, s"nParas($h): $got != $want")
        assert(ppm >= 0L && ppm <= 1000000L, s"ppm($h) out of range: $ppm")
    }
    // all-chrome doc: 100% boilerplate
    val allChrome = df.filter(col("h").startsWith("<style")).select("ppm")
      .as[Long].collect().head
    assert(allChrome == 1000000L)
  }

  test("link density: chrome anchors don't count, body anchors do, link farms max out") {
    def ld(html: String): Long = {
      val df = Seq(html).toDF("h")
        .withColumn("c", HtmlExtract.cleanText(col("h")))
      df.select(HtmlExtract.linkDensityPpm(col("h"), col("c")).as("d"))
        .as[Long].collect().head
    }
    // pure prose: zero
    assert(ld("<p>ten tokens of plain prose with no links at all</p>") == 0L)
    // nav/footer anchors are chrome — already dropped, zero density
    assert(ld("<nav><a href=\"/\">home</a><a href=\"/a\">about</a></nav><p>prose body here</p>") == 0L)
    // a body anchor counts: clean = "read the docs now" (17 chars),
    // anchor text = "read the docs" (13) -> 13e6 div 17
    assert(ld("<p><a href=\"/d\">read the docs</a> now</p>") == 13000000L / 17)
    // link farm: everything inside anchors -> density ~1e6 (anchor
    // mass == clean mass up to the separator space)
    val farm = "<p><a href=\"/1\">aaa</a> <a href=\"/2\">bbb</a></p>"
    assert(ld(farm) == 6000000L / 7)
    // nested markup inside the anchor strips before measuring
    assert(ld("<p><a href=\"/x\"><b>bold</b> link</a> tail</p>") ==
      9000000L / 14)
  }

  test("br and whitespace chaos collapse; blank paragraphs drop") {
    assert(clean("a<br>b<br/>c<br />d") == "a\nb\nc\nd")
    assert(clean("<p></p>\n\n<p>  x  </p>\t<p> </p>") == "x")
    assert(clean("  \t \n ") == "")
  }

  test("\\x0B input cleans via the explicit shared whitespace class (ADVICE r13)") {
    // Java \s includes \x0B, RE2 \s does not — the step table now uses
    // the explicit [[HtmlExtract.Ws]] class so both engine folds see the
    // SAME whitespace set. Spark-side behavior pinned here; the DuckDB
    // twin is hash-compared at the gate over the same generated fold.
    assert(HtmlExtract.Ws.contains("\\x0B"))
    // \x0B inside a closing dropped-block tag still matches the closer
    assert(clean("<script\u000B>x</script\u000B>keep") == "keep")
    // leading/trailing \x0B trims; an interior one is NOT in the
    // horizontal-collapse class ([ \t\r]) so it survives mid-paragraph —
    // identical in both engines because no step uses bare \s anymore
    val got = clean("\u000Ba\u000Bb\u000B")
    assert(got == "a\u000Bb", s"got: ${got.map(_.toInt).mkString(",")}")
  }
}
