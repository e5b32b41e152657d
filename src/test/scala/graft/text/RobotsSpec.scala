package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("pattern translation: escaping, wildcards, the trailing anchor") {
    assert(Robots.translate("/path/") == "^/path/")
    assert(Robots.translate("/path/*a*") == "^/path/.*a.*")
    assert(Robots.translate("/story$") == "^/story$")
    assert(Robots.translate("/$") == "^/$")
    // regex metachars in rule paths are escaped; mid-pattern $ is
    // literal data, only the TRAILING $ anchors
    assert(Robots.translate("/a.b+c?") == "^/a\\.b\\+c\\?")
    assert(Robots.translate("/p$q/x") == "^/p\\$q/x")
    // and the translations behave under java.util.regex
    assert("/path/c?a=0".matches(Robots.translate("/path/*a*") + ".*"))
    assert(!"/story?id=7".matches(Robots.translate("/story$")))
    assert("/story".matches(Robots.translate("/story$")))
  }

  test("robots.txt parser: star group, case-insensitive fields, comments") {
    val body =
      """# robots for the fixture
        |User-Agent: specialbot
        |Disallow: /everything
        |
        |user-agent: *
        |USER-AGENT: otherbot
        |Disallow: /private   # trailing comment
        |allow: /private/ok
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: http://x.example/sitemap.xml
        |""".stripMargin
    assert(Robots.parseRobotsTxt(body) ==
      Seq(("disallow", "/private"), ("allow", "/private/ok")))
    // a group NOT naming * contributes nothing
    assert(Robots.parseRobotsTxt("User-agent: foo\nDisallow: /x\n").isEmpty)
    // a second group re-opens after rules (the RFC group boundary)
    val two = "User-agent: *\nDisallow: /a\nUser-agent: bot\nDisallow: /b\n"
    assert(Robots.parseRobotsTxt(two) == Seq(("disallow", "/a")))
  }

  test("filter: longest match wins, allow breaks ties, default allow") {
    val rules = Seq(
      ("s.example", "disallow", 6L, Robots.translate("/path/")),
      ("s.example", "allow", 7L, Robots.translate("/path/a")),
      ("s.example", "disallow", 7L, Robots.translate("/path/b")),
      ("t.example", "disallow", 1L, Robots.translate("/")))
      .toDF("site", "verdict", "pattern_len", "regex")
    val urls = Seq(
      (1L, "s.example", "/path/a?x=1"), // allow (7) beats disallow (6)
      (2L, "s.example", "/path/b"),     // disallow (7)
      (3L, "s.example", "/path/c"),     // disallow (6) only
      (4L, "s.example", "/other"),      // no match -> allow
      (5L, "t.example", "/anything"),   // blanket disallow
      (6L, "u.example", "/no/rules"))   // no rules -> allow
      .toDF("doc_id", "site", "pathq")
      .withColumn("canon", concat(lit("http://"), col("site"), col("pathq")))
    val got = Robots.filter(urls, rules)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "allow", 2L -> "disallow", 3L -> "disallow",
      4L -> "allow", 5L -> "disallow", 6L -> "allow"))
  }

  test("gate fixture: every rule semantic sees live traffic") {
    import graft.text.Url
    val urls = Url.withCanonical(
        spark.range(0, 120).toDF("doc_id")
          .select(col("doc_id"), Url.urlize(col("doc_id")).as("u")),
        col("u"), "canon")
      .select(col("doc_id"), col("canon"), Url.hostOf(col("canon")).as("host"))
      .select(col("doc_id"), col("canon"),
        Url.registrableDomain(col("host")).as("site"),
        Robots.pathQueryOf(col("canon")).as("pathq"))
    val got = Robots.filter(urls, Robots.fixtureRulesFrame(spark))
      .select("doc_id", "site", "pathq", "verdict")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    def v(id: Long) = got(id)._4
    // doc 0: k=0 (k%4=0), band 0 /path/a?… — Allow /path/a (7) beats
    // Disallow /path/ (6): the longest-match override
    assert(v(0L) == "allow" && got(0L)._3.startsWith("/path/a"))
    // doc 8: k=8 (k%4=0), band 2 /path/c?… — only Disallow /path/
    assert(v(8L) == "disallow")
    // doc 4: k=4 (k%4=0), band 4 pathq "/" — Disallow /$ anchors the
    // root exactly (the anchor POSITIVE case)
    assert(got(4L)._3 == "/" && v(4L) == "disallow")
    // doc 25: k=5 (k%4=1), band 1 /login?q=1 — plain Disallow /login
    assert(v(25L) == "disallow")
    // doc 2: k=2 (k%4=2), band 2 — Disallow / but the wildcard
    // Allow /path/*a* carve-out matches ?a=0
    assert(v(2L) == "allow")
    // doc 50: k=10 (k%4=2), band 2 — same carve-out via the query 'a'
    assert(v(50L) == "allow")
    // doc 26: k=6 (k%4=2), band 2 — carve-out again; doc 74: k=14
    // (k%4=2) band 2 — carve-out; band 4 under k%4=2 is blanket-blocked
    assert(got.contains(74L) && v(74L) == "allow")
    val band4k2 = got.values.filter(r =>
      r._3 == "/" && (r._1 % 20) % 4 == 2).map(_._4)
    assert(band4k2.nonEmpty && band4k2.forall(_ == "disallow"),
      "Disallow / must block the root where no carve-out matches")
    // doc 9: k=9 (k%4=1), band 3 co.uk — Disallow /story$ must NOT
    // match /story?id=7 (anchor negative) -> allow
    assert(got(9L)._2.endsWith(".co.uk") && v(9L) == "allow")
    // doc 3: k=3 (k%4=3), band 3 co.uk — unanchored Disallow /story
    assert(got(3L)._2.endsWith(".co.uk") && v(3L) == "disallow")
    // doc 27: k=7 (k%4=3), band 3 — .example k%4=3 has no rules, but
    // this is co.uk band: unanchored disallow again
    assert(v(27L) == "disallow")
    // rule-less default: k%4=3 .example docs (e.g. doc 55: k=15,
    // band 1 /login — no rules on src15.example) -> allow
    assert(v(55L) == "allow")
  }

  // ---- r17 group parsing + RFC 9309 §2.2.1 selection ----------------------

  test("group parser: stacked agents, crawl-delay, global sitemaps (r17)") {
    val body = """# header comment
User-agent: alpha
User-agent: beta
Disallow: /a
Crawl-delay: 7
Sitemap: https://x.example/one.xml

User-agent: gamma
Crawl-delay: 2
Crawl-delay: 5
Allow: /g
Sitemap: https://x.example/two.xml

User-agent: *
Disallow: /star
Crawl-delay: nine
"""
    val (groups, sitemaps) = Robots.parseRobotsGroups(body)
    assert(groups.length == 3)
    assert(groups(0).agents == Set("alpha", "beta"))
    assert(groups(0).rules == Seq(("disallow", "/a")))
    assert(groups(0).crawlDelay.contains(7L))
    // last numeric crawl-delay in the group wins; junk is ignored
    assert(groups(1).crawlDelay.contains(5L))
    assert(groups(2).agents == Set("*") &&
      groups(2).rules == Seq(("disallow", "/star")))
    assert(groups(2).crawlDelay.isEmpty, "non-numeric delay must not parse")
    // sitemaps are GLOBAL — collected regardless of group position
    assert(sitemaps == Seq("https://x.example/one.xml",
      "https://x.example/two.xml"))
  }

  test("selection matrix: longest prefix, case, merge, fallback, none (r17)") {
    val body = """User-agent: graft
Disallow: /short

User-agent: GRAFTBOT
Crawl-delay: 3
Disallow: /long

User-agent: graftbot
Allow: /long/ok

User-agent: graftbot-image
Disallow: /img

User-agent: *
Disallow: /
"""
    val (groups, _) = Robots.parseRobotsGroups(body)
    // longest matching token wins over the shorter prefix; matching
    // is case-insensitive; BOTH graftbot groups merge (identical
    // token); graftbot-image is NOT a prefix of graftbot/1.2
    val (rules, delay) = Robots.selectGroup(groups, "graftbot/1.2")
    assert(rules == Seq(("disallow", "/long"), ("allow", "/long/ok")))
    assert(delay.contains(3L))
    // a crawler matching only the shorter token
    val (short, shortDelay) = Robots.selectGroup(groups, "grafter/9")
    assert(short == Seq(("disallow", "/short")) && shortDelay.isEmpty)
    // no specific match -> the * group
    val (star, _) = Robots.selectGroup(groups, "otherbot/1.0")
    assert(star == Seq(("disallow", "/")))
    // the generic surface is the * leg
    assert(Robots.parseRobotsTxt(body) == Seq(("disallow", "/")))
    // no specific match AND no * group -> no rules (default allow)
    val (none, _) = Robots.selectGroup(
      Robots.parseRobotsGroups("User-agent: x\nDisallow: /")._1, "graftbot")
    assert(none.isEmpty)
  }

  test("gate bodies select to the r16 rule bands for the fixture agent (r17)") {
    // the group fixture's SELECTED rules must equal fixtureRules —
    // the r16 matching semantics stay pinned under the new layer
    val selected = Robots.fixtureRobotsBodies.flatMap { case (site, body) =>
      Robots.parseRobotsTxtFor(body, Robots.FixtureAgent)._1
        .map { case (v, p) => (site, v, p) }
    }.toSet
    assert(selected == Robots.fixtureRules.toSet,
      "selection must recover exactly the r16 rule bands")
    // and the block-all * shadows are REAL: selecting as an unknown
    // bot on a band-0 body yields Disallow /
    val band0 = Robots.fixtureRobotsBodies
      .find(_._1 == "src0.example").get._2
    assert(Robots.parseRobotsTxtFor(band0, "strangebot")._1 ==
      Seq(("disallow", "/")))
  }
}
