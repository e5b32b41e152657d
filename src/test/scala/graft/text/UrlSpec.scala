package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Url.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq

  private def site(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(Url.canonicalize(col("u")).as("c"))
      .select(Url.registrableDomain(Url.hostOf(col("c"))).as("s"))
      .as[String].collect().toSeq

  test("every pinned canonicalization step, one case each") {
    assert(canon(
      "HTTP://WWW.Site.Example/a?b=2&a=1#frag", // case+www+sort+fragment
      "https://x.example:443/p",                // https default port
      "http://x.example:80/p",                  // http default port
      "http://x.example:8080/p",                // non-default port KEPT
      "https://x.example//a//b/",               // dup slashes + trailing
      "http://x.example",                       // empty path -> /
      "http://x.example/?utm_source=a&gclid=g", // all params tracking
      "http://x.example/p?z=1&fbclid=f&a=9"     // mixed, sorted
    ) == Seq(
      "http://site.example/a?a=1&b=2",
      "https://x.example/p",
      "http://x.example/p",
      "http://x.example:8080/p",
      "https://x.example/a/b",
      "http://x.example/",
      "http://x.example/",
      "http://x.example/p?a=9&z=1"))
  }

  test("canonicalization is idempotent and schemeless passes through") {
    val messy = Seq(
      "HTTP://WWW.Site.Example/a?b=2&a=1#frag",
      "https://x.example:443//p/?utm_x=1&c=2",
      "relative/path?x=1", // no scheme: untouched
      "mailto-ish-opaque")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once, "canonicalize must be idempotent")
    assert(once(2) == "relative/path?x=1" && once(3) == "mailto-ish-opaque")
  }

  test("registrable domain: plain, two-level suffix, subdomains, ipv4, single label") {
    assert(site(
      "http://a.example/",
      "http://news.deep.site.co.uk/x",
      "http://a.b.c.d.site.example/x",
      "http://10.0.0.1/x",
      "http://localhost/x",
      "http://site.com.au:9999/x"
    ) == Seq("a.example", "site.co.uk", "site.example", "10.0.0.1",
      "localhost", "site.com.au"))
  }

  test("FQDN trailing dot strips; IPv6 authorities keep their colons (review r16 #3/#5)") {
    assert(canon(
      "http://example.com./x",            // legal FQDN spelling
      "http://WWW.Example.Com.:80/x",     // dot + www + default port
      "http://[2001:DB8::1]:8080/x",      // bracketed IPv6, port kept
      "https://[2001:db8::1]:443/x",      // bracketed IPv6, default port
      "http://[2001:db8::1]/x"            // bracketed IPv6, no port
    ) == Seq(
      "http://example.com/x",
      "http://example.com/x",
      "http://[2001:db8::1]:8080/x",
      "https://[2001:db8::1]/x",
      "http://[2001:db8::1]/x"))
    // registrable domain: dotted-FQDN hosts key like their undotted
    // twins; IP literals pass through whole
    assert(site(
      "http://a.b.example.com./x",
      "http://[2001:db8::1]:8080/x"
    ) == Seq("example.com", "[2001:db8::1]"))
  }

  test("staged withCanonical ≡ the one-Column canonicalize (r16 codegen-cliff fix)") {
    val urls = Seq(
      "HTTP://WWW.Site.Example/a?b=2&a=1#frag",
      "https://x.example:443/p?utm_x=1&c=2",
      "http://x.example:8080//a//b/?z=1&gclid=g",
      "http://example.com./x",
      "http://[2001:DB8::1]:8080/x",
      "relative/path?x=1",
      "http://x.example")
    val df = urls.toDF("u")
    val staged = Url.withCanonical(df, col("u"), "canon")
      .select("u", "canon").as[(String, String)].collect().toMap
    val fused = df.select(col("u"),
        Url.canonicalize(col("u")).as("canon"))
      .as[(String, String)].collect().toMap
    assert(staged == fused, "the staged and fused forms must agree exactly")
  }

  test("urlizeDup: all four spellings of a page fold to ONE canonical key") {
    // ids 0..3 share page 0..3? no — page = id % 97, so ids p, p+97,
    // p+194, p+291 share page p across all four variant bands
    val ids = Seq(5L, 102L, 199L, 296L) // page 5, bands 1,2,3,0
    val got = ids.toDF("doc_id")
      .select(Url.canonicalize(Url.urlizeDup(col("doc_id"))).as("c"))
      .as[String].collect().toSet
    assert(got == Set("http://src5.example/page/5?a=1&b=2"),
      s"four spellings must canonicalize identically: $got")
  }

  test("urlize bands canonicalize to the shapes the gate groups by") {
    val got = (0L to 5L).toDF("doc_id")
      .select(col("doc_id"), Url.urlize(col("doc_id")).as("u"))
      .select(col("doc_id"), Url.canonicalize(col("u")).as("c"))
      .select(col("doc_id"), col("c"),
        Url.registrableDomain(Url.hostOf(col("c"))).as("s"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got(0)._2 == "http://src0.example/path/a?a=1&b=2")
    assert(got(1)._2 == "https://src1.example/login?q=1")
    assert(got(2)._2 == "http://src2.example:8080/path/c?a=0&z=9")
    assert(got(3)._2 == "http://news.src3.co.uk/story?id=7")
    assert(got(4)._2 == "https://a.b.src4.example/")
    assert(got(5)._2 == "http://src5.example/")
    // the site key folds subdomain/port/www variants into one domain
    assert(got.map(_._3).toSeq == Seq("src0.example", "src1.example",
      "src2.example", "src3.co.uk", "src4.example", "src5.example"))
  }

  private def sitesUnder(rules: org.apache.spark.sql.DataFrame,
      hosts: String*): Map[String, String] =
    Url.withRegistrableDomain(hosts.toDF("h"), col("h"), "site", rules)
      .select(col("h"), col("site")).as[(String, String)].collect().toMap

  test("suffix rules as data: wildcard and exception semantics (r17)") {
    val rules = Url.fixtureSuffixRulesFrame(spark)
    val m = sitesUnder(rules,
      "a.b.site.example",        // implicit * default: last two labels
      "x.y.site.github.io",      // multi-label NORMAL rule
      "a.town.kawasaki.jp",      // WILDCARD: town.kawasaki.jp is public
      "town.kawasaki.jp",        // host IS a wildcard public suffix
      "ward.city.kawasaki.jp",   // EXCEPTION overrides the wildcard
      "city.kawasaki.jp",        // the exception rule itself
      "github.io",               // host == normal suffix: pass-through
      "shop.x.co.uk",            // pinned defaults ride along as data
      "10.0.0.1", "localhost")   // ip / single label: pass-through
    assert(m("a.b.site.example") == "site.example")
    assert(m("x.y.site.github.io") == "site.github.io")
    assert(m("a.town.kawasaki.jp") == "a.town.kawasaki.jp")
    assert(m("town.kawasaki.jp") == "town.kawasaki.jp")
    assert(m("ward.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(m("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(m("github.io") == "github.io")
    assert(m("shop.x.co.uk") == "x.co.uk")
    assert(m("10.0.0.1") == "10.0.0.1")
    assert(m("localhost") == "localhost")
  }

  test("default rule table reproduces the pinned Column fold exactly (r17)") {
    // the swap-in contract: under defaultSuffixRules the data-driven
    // fold and registrableDomain agree on every urlize-band host
    val hosts = (0L to 59L).toDF("doc_id")
      .select(Url.urlize(col("doc_id")).as("u"))
      .select(Url.canonicalize(col("u")).as("c"))
      .select(Url.hostOf(col("c")).as("h"))
    val both = Url.withRegistrableDomain(
        hosts.withColumn("col_site", Url.registrableDomain(col("h"))),
        col("h"), "data_site", Url.defaultSuffixRules(spark))
      .select(col("h"), col("col_site"), col("data_site"))
      .as[(String, String, String)].collect()
    assert(both.nonEmpty)
    both.foreach { case (h, c, d) =>
      assert(c == d, s"host $h: column fold $c != data fold $d")
    }
  }
}
