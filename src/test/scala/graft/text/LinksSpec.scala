package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinksSpec extends SparkSpec {
  import spark.implicits._

  private def hrefs(html: String): Seq[String] =
    Seq(html).toDF("h")
      .select(explode(Links.extractHrefs(col("h"))).as("x"))
      .as[String].collect().toSeq

  private def resolve(page: String, href: String): Option[String] = {
    val df = Seq((page, href)).toDF("p", "h")
    Links.withResolved(df, col("p"), col("h"), "abs")
      .select(col("abs")).as[Option[String]].collect().head
  }

  test("extractHrefs: double- and single-quoted, attribute order, last-wins") {
    assert(hrefs("""<p><a href="/a">x</a> <a class='k' href='/b'>y</a></p>""")
      .sorted == Seq("/a", "/b"))
    // href after other attributes; uppercase tag/attr names
    assert(hrefs("""<A CLASS="z" HREF="/up">x</A>""") == Seq("/up"))
    // two href attributes in one (malformed) tag: the LAST wins
    assert(hrefs("""<a href="/one" href="/two">x</a>""") == Seq("/two"))
  }

  test("extractHrefs: chrome and script anchors are not live links") {
    val html = """<nav><a href="/menu">m</a></nav>
      <footer><a href="/legal">l</a></footer>
      <script>var s = '<a href="/fromjs">x</a>';</script>
      <!-- <a href="/commented">c</a> -->
      <p><a href="/live">keep</a></p>"""
    assert(hrefs(html) == Seq("/live"))
  }

  test("extractHrefs: no anchors, anchor without href, bare a-tag") {
    assert(hrefs("<p>no links</p>").isEmpty)
    assert(hrefs("""<a name="top">anchor</a>""").isEmpty)
    // data-href must not count as href ('-' is not the Ws the
    // pattern requires before the attribute name)
    assert(hrefs("""<a data-href="/d">x</a>""").isEmpty)
  }

  test("resolve: absolute, scheme-relative, root-relative, dir-relative") {
    val page = "http://site.example/dir/page?x=1"
    assert(resolve(page, "https://other.example/p").contains(
      "https://other.example/p"))
    assert(resolve(page, "//cdn.example/lib").contains(
      "http://cdn.example/lib"))
    assert(resolve(page, "/root/doc").contains(
      "http://site.example/root/doc"))
    assert(resolve(page, "sibling.html").contains(
      "http://site.example/dir/sibling.html"))
    // page with root path: dir is /
    assert(resolve("http://site.example/", "x").contains(
      "http://site.example/x"))
    // page path without trailing dir: dir is the parent
    assert(resolve("http://site.example/a/b/c", "y").contains(
      "http://site.example/a/b/y"))
  }

  test("resolve: drops — empty, fragment, non-web schemes, schemeless page") {
    val page = "http://site.example/dir/page"
    assert(resolve(page, "").isEmpty)
    assert(resolve(page, "#sec").isEmpty)
    assert(resolve(page, "mailto:a@b.example").isEmpty)
    assert(resolve(page, "javascript:void(0)").isEmpty)
    assert(resolve(page, "tel:+15550100").isEmpty)
    assert(resolve(page, "data:text/plain,hi").isEmpty)
    // a schemeless page (canonicalization pass-through) resolves nothing
    assert(resolve("not-a-url", "/x").isEmpty)
    // but an ABSOLUTE href keeps its case pre-canonicalization
    assert(resolve(page, "HTTPS://X.Example/P").contains("HTTPS://X.Example/P"))
  }

  test("resolve: bounded dot-segment removal") {
    val page = "http://s.example/a/b/page"
    assert(resolve(page, "./x").contains("http://s.example/a/b/x"))
    assert(resolve(page, "c/../x").contains("http://s.example/a/b/x"))
    assert(resolve(page, "../x").contains("http://s.example/a/x"))
    assert(resolve(page, "../../x").contains("http://s.example/x"))
    // four levels — the pinned bound
    assert(resolve("http://s.example/a/b/c/d/e/page", "../../../../x")
      .contains("http://s.example/a/x"))
    // trailing whitespace inside the attribute value trims
    assert(resolve(page, " ./x ").contains("http://s.example/a/b/x"))
  }

  test("fixture: every band resolves to its pinned targets") {
    val lf = graft.ops.TextOps.linkFrame(spark, sf("x"))
    // band 0 doc (id 0): messy absolute -> canonical next-site
    // target; the nav spam anchor must be gone
    val d0 = lf.filter(col("doc_id") === 0).select(col("target"))
      .as[String].collect().toSet
    assert(d0 == Set("http://src1.example/path/a?a=1&b=2",
      "http://src0.example/about/team"))
    // band 1 doc (id 1): only the dot-dot link survives (fragment,
    // mailto and the script-string href all drop)
    val d1 = lf.filter(col("doc_id") === 1).select(col("target"))
      .as[String].collect().toSet
    assert(d1 == Set("https://src1.example/up/page1.html"))
    // band 2 doc (id 2): scheme-relative cdn + tracking-stripped
    // promo (the page's non-default :8080 port survives resolution)
    // + the query-only pagination link keeping the FULL base path
    val d2 = lf.filter(col("doc_id") === 2).select(col("target"))
      .as[String].collect().toSet
    assert(d2 == Set("http://cdn.src3.example/lib?v=1",
      "http://src2.example:8080/promo?id=2",
      "http://src2.example:8080/path/c?page=2"))
    // band 3 doc (id 3): dir-relative resolves under the RAW
    // trailing-slash base (/story/ is a directory page) + the co.uk
    // story (fbclid is a tracking param — stripped from the TARGET)
    val d3 = lf.filter(col("doc_id") === 3)
      .select(col("target"), col("dst_site")).as[(String, String)]
      .collect().toMap
    assert(d3 == Map(
      "http://news.src3.co.uk/story/sub/doc3" -> "src3.co.uk",
      "https://news.src4.co.uk/story?id=3" -> "src4.co.uk"))
  }

  test("resolve: query-only refs, directory bases, authority safety (r17 review)") {
    // query-only href keeps the FULL base path (RFC 3986 §5.3)
    assert(resolve("http://h.example/list/page?x=1", "?page=2")
      .contains("http://h.example/list/page?page=2"))
    // directory page (raw trailing slash) is its own base
    val dirDf = Seq(("http://h.example/docs", "http://H.example/docs/",
      "intro.html")).toDF("p", "r", "h")
    val dirGot = Links.withResolved(dirDf, col("p"), col("r"), col("h"), "abs")
      .select(col("abs")).as[Option[String]].collect().head
    assert(dirGot.contains("http://h.example/docs/intro.html"))
    // file page resolves against the parent (unchanged)
    assert(resolve("http://h.example/docs", "intro.html")
      .contains("http://h.example/intro.html"))
    // above-root dot-dot must stay literal — never eat the host
    assert(resolve("http://h.example/", "../x")
      .contains("http://h.example/../x"))
    assert(resolve("http://h.example/a/", "../../x")
      .contains("http://h.example/../x"))
  }
}
