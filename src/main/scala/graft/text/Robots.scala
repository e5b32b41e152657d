package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt exclusion filtering (r16) — the crawl-politeness stage
  * a curation pipeline applies over URL-keyed data: per registrable
  * domain, RFC 9309 Allow/Disallow rules with `*` wildcards and the
  * `$` end anchor, LONGEST-match-wins (most octets in the rule's path
  * value), ties resolved least-restrictive (Allow). URLs with no
  * matching rule — or no rules at all — are allowed.
  *
  * Pieces:
  *   - [[parseRobotsTxt]]: a minimal RFC 9309 group parser for real
  *     robots.txt bodies (the `*` user-agent group; comments, blank
  *     lines, case-insensitive field names) — the ingestion side.
  *   - [[translate]]: rule path-pattern → anchored regex in the
  *     Java/RE2 common subset (escape everything, `*` → `.*`,
  *     trailing `$` → the regex anchor). Translation happens at rule
  *     INGESTION, so matching is one regexp per (url, domain-rule).
  *   - [[filter]]: the distributed stage — canonical URLs joined to a
  *     domain-keyed rules frame, per-URL argmax over
  *     (pattern length × 2 + isAllow), default allow.
  *
  * 100 TB posture: the rules frame is DOMAIN-cardinality (like the
  * reputation rollup: no hard broadcast hint — AQE broadcasts while
  * it fits, degrades to a keyed shuffle join on `site` beyond that);
  * matching fan-out is bounded by rules-per-domain (small constant in
  * practice); the verdict fold is one grouped argmax on doc_id.
  *
  * Fixture: [[fixtureRules]] pins rule sets per gate domain exercising
  * every semantic — longest-match override (Allow longer than
  * Disallow), `*` mid-pattern, Disallow-everything with a wildcard
  * Allow carve-out, `$`-anchored patterns that must NOT match
  * query-bearing paths, and rule-less domains. The oracle embeds the
  * SAME translated regexes (both sides render from this one list —
  * they cannot drift). */
object Robots {

  /** Translate an RFC 9309 path pattern to an anchored regex in the
    * Java/RE2 common subset: `*` matches any octets, a TRAILING `$`
    * anchors the end (mid-pattern `$` is literal), everything else is
    * escaped. */
  def translate(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.^$+?()[]{}|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  /** One parsed rule group: its (lowercased) user-agent tokens, its
    * Allow/Disallow rules in file order, and its Crawl-delay (the
    * de-facto extension — last numeric value in the group wins). */
  final case class Group(agents: Set[String],
      rules: Seq[(String, String)], crawlDelay: Option[Long])

  /** Parse a robots.txt body into its rule GROUPS plus the GLOBAL
    * `Sitemap:` lines (r17, VERDICT r16 missing #4 — sitemaps are
    * not group-scoped per RFC 9309 §2.3 and collect from anywhere).
    * Field names are case-insensitive; `#` comments and unknown
    * fields are ignored; multiple user-agent lines STACK onto the
    * following group; a user-agent line after rules starts a new
    * group; an empty-pattern Allow/Disallow (allow-all) yields no
    * rule, per the RFC. */
  def parseRobotsGroups(body: String): (Seq[Group], Seq[String]) = {
    val groups = Seq.newBuilder[Group]
    val sitemaps = Seq.newBuilder[String]
    var agents = Set.empty[String]
    var rules = Vector.empty[(String, String)]
    var delay: Option[Long] = None
    var inGroup = false // saw at least one rule line since the agents
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Set.empty; rules = Vector.empty; delay = None
      inGroup = false
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val field = line.substring(0, i).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(i + 1).trim
          field match {
            case "user-agent" =>
              if (inGroup) flush()
              agents += value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inGroup = true
              if (value.nonEmpty) rules :+= ((field, value))
            case "crawl-delay" =>
              inGroup = true
              value.toLongOption.foreach(d => delay = Some(d))
            case "sitemap" =>
              if (value.nonEmpty) sitemaps += value
            case _ => () // unknown fields: ignored
          }
        }
      }
    }
    flush()
    (groups.result(), sitemaps.result())
  }

  /** RFC 9309 §2.2.1 group selection for a crawler product token:
    * among groups whose agent token is a case-insensitive PREFIX of
    * the token, the LONGEST token wins, and ALL groups carrying that
    * winning token merge (identical-UA groups combine per the RFC);
    * with no specific match the `*` groups merge; with neither, no
    * rules (default allow). Crawl-delay: the first merged group's
    * value wins. */
  def selectGroup(groups: Seq[Group], agent: String)
      : (Seq[(String, String)], Option[Long]) = {
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    val best = groups.iterator
      .flatMap(g => g.agents.filter(a => a != "*" && tok.startsWith(a)))
      .foldLeft("")((acc, a) => if (a.length > acc.length) a else acc)
    val chosen =
      if (best.nonEmpty) groups.filter(_.agents.contains(best))
      else groups.filter(_.agents.contains("*"))
    (chosen.flatMap(_.rules), chosen.flatMap(_.crawlDelay).headOption)
  }

  /** Rules + crawl-delay a crawler identifying as `agent` obeys. */
  def parseRobotsTxtFor(body: String, agent: String)
      : (Seq[(String, String)], Option[Long]) =
    selectGroup(parseRobotsGroups(body)._1, agent)

  /** The rules a GENERIC crawler obeys (the `*` group) — the r16
    * surface, now the fallback leg of [[selectGroup]]. */
  def parseRobotsTxt(body: String): Seq[(String, String)] =
    selectGroup(parseRobotsGroups(body)._1, "*")._1

  /** The path-and-query portion of a canonical URL — what RFC 9309
    * rules match against. Null for schemeless pass-throughs. */
  def pathQueryOf(canonicalUrl: Column): Column = {
    val v = regexp_extract(canonicalUrl, "^[a-z][a-z0-9+.-]*://[^/]+(/.*)$", 1)
    when(v =!= "", v)
  }

  /** SQL twin of [[pathQueryOf]]. */
  def sqlPathQueryOf(canonExpr: String): String =
    s"""nullif(regexp_extract($canonExpr,
        '^[a-z][a-z0-9+.-]*://[^/]+(/.*)$$', 1), '')"""

  /** Apply a domain-keyed rules frame (site, verdict, pattern_len,
    * regex) to a URL frame carrying (site, pathq) — adds a `verdict`
    * column ('allow'/'disallow') per RFC 9309 longest-match. The
    * rules frame is domain-bounded: no broadcast hint (the
    * DomainReputation rule), AQE decides.
    *
    * The URL frame is MATERIALIZED at entry (eager localCheckpoint —
    * measured r16): joining on a key derived from the staged
    * canonicalization chain sends the optimizer's join-constraint
    * inference re-substituting the chain's aliases transitively, and
    * the re-expanded trees OOM planning at ~minutes for 120 rows; the
    * barrier cuts the lineage exactly where a real pipeline persists
    * its canonical frame anyway (it is also referenced twice below). */
  def filter(urls: DataFrame, rules: DataFrame): DataFrame = {
    val u = urls.localCheckpoint(true)
    val matched = u.select(col("doc_id"), col("site"), col("pathq"))
      .join(rules, Seq("site"), "inner")
      .where(regexp_like(col("pathq"), col("regex")))
      // most octets wins; at equal length Allow beats Disallow
      .withColumn("rk", col("pattern_len") * 2 +
        when(col("verdict") === "allow", 1).otherwise(0))
      .groupBy(col("doc_id"))
      .agg(max_by(col("verdict"), col("rk")).as("win"))
    u.join(matched, Seq("doc_id"), "left")
      .withColumn("verdict", coalesce(col("win"), lit("allow")))
      .drop("win")
  }

  // ---- the gate fixture --------------------------------------------------

  /** Pinned rule sets for the gate's domains: (site, verdict,
    * pattern). Bands by the domain's k (the urlize fixture key;
    * band moduli are chosen against urlize's id arithmetic so EVERY
    * rule semantic sees live traffic at the gate):
    *   - `.example`, k%4=0: Disallow /path/ with a LONGER Allow
    *     /path/a (longest-match override) + Disallow /$ (the anchor
    *     POSITIVE case: blocks exactly the root path);
    *   - k%4=1: plain Disallow /login;
    *   - k%4=2: Disallow / (everything) with a wildcard Allow
    *     carve-out ("/path/" + "*a*" — Scala comments nest, so the
    *     literal slash-star spelling can't appear here);
    *   - k%4=3: no rules (default allow);
    *   - `.co.uk` (band-3 docs have odd k, so these key on k%4):
    *     k%4=1: Disallow /story$ — the anchor must NOT match the
    *     query-bearing /story?id=… (allow);
    *     k%4=3: Disallow /story (unanchored prefix — matches). */
  val fixtureRules: Seq[(String, String, String)] =
    (0 until 20).flatMap { k =>
      val ex = s"src$k.example"
      val uk = s"src$k.co.uk"
      val exRules = (k % 4) match {
        case 0 => Seq((ex, "disallow", "/path/"), (ex, "allow", "/path/a"),
          (ex, "disallow", "/$"))
        case 1 => Seq((ex, "disallow", "/login"))
        case 2 => Seq((ex, "disallow", "/"), (ex, "allow", "/path/*a*"))
        case _ => Seq.empty
      }
      val ukRules = (k % 4) match {
        case 1 => Seq((uk, "disallow", "/story$"))
        case 3 => Seq((uk, "disallow", "/story"))
        case _ => Seq.empty
      }
      exRules ++ ukRules
    }

  /** The fixture rules as a Spark frame (site, verdict, pattern_len,
    * regex) — patterns translated at construction, the ingestion
    * shape. */
  def fixtureRulesFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    fixtureRules
      .map { case (site, verdict, pat) =>
        (site, verdict, pat.length.toLong, translate(pat)) }
      .toDF("site", "verdict", "pattern_len", "regex")
  }

  // ---- the r17 group-selection fixture ------------------------------------

  /** The gate crawler's product token. */
  val FixtureAgent = "graftbot/1.2"

  /** Per-site robots.txt BODIES (r17): the group-parser + selection
    * path exercised end to end. Every selection semantic sees live
    * traffic — a specific `graftbot` group shadowing a BLOCK-ALL `*`
    * group (a selection bug = mass disallow), a shorter-prefix
    * `graft` token beside a non-matching `graftbot-image`, a
    * case-insensitive `GRAFTBOT` token with a junk crawl-delay, a
    * wrong-bot-only file (no match, no `*` → default allow), stacked
    * user-agent lines, real crawl-delays, and global sitemap lines.
    * Selected for [[FixtureAgent]], the effective rules equal the
    * r16 [[fixtureRules]] bands — the matching semantics stay pinned
    * while SELECTION becomes the load-bearing layer. */
  def fixtureRobotsBodies: Seq[(String, String)] = (0 until 20).flatMap { k =>
    val ex = s"src$k.example"
    val uk = s"src$k.co.uk"
    val exBody = (k % 4) match {
      case 0 =>
        s"""# fixture site $k
User-agent: graftbot
Crawl-delay: ${k % 7 + 1}
Disallow: /path/
Allow: /path/a
Disallow: /$$

User-agent: *
Disallow: /

Sitemap: https://$ex/sitemap.xml
"""
      case 1 =>
        s"""User-agent: graft
Disallow: /login

User-agent: graftbot-image
Disallow: /img
"""
      case 2 =>
        s"""User-agent: GRAFTBOT
Disallow: /
Allow: /path/*a*
Crawl-delay: soon

User-agent: otherbot
Disallow: /elsewhere
"""
      case _ =>
        s"""User-agent: otherbot
Disallow: /
"""
    }
    val ukBody = (k % 4) match {
      case 1 => Some(
        s"""User-agent: *
Disallow: /story$$
Sitemap: https://$uk/news-sitemap.xml
Sitemap: https://$uk/archive-sitemap.xml
""")
      case 3 => Some(
        s"""User-agent: graftbot
User-agent: newsbot
Disallow: /story
""")
      case _ => None
    }
    Seq((ex, exBody)) ++ ukBody.map((uk, _))
  }

  /** Bodies → (rules frame, meta frame) for [[FixtureAgent]]:
    * parse + select happen at INGESTION (driver-side over the
    * domain-bounded body list, the [[fixtureRulesFrame]] shape);
    * rules = (site, verdict, pattern_len, regex), meta =
    * (site, crawl_delay, n_sitemaps). */
  def fixtureGroupFrames(spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = fixtureRobotsBodies.map { case (site, body) =>
      val (groups, sitemaps) = parseRobotsGroups(body)
      val (rules, delay) = selectGroup(groups, FixtureAgent)
      (site, rules, delay, sitemaps.length.toLong)
    }
    val rules = parsed
      .flatMap { case (site, rs, _, _) =>
        rs.map { case (v, p) => (site, v, p.length.toLong, translate(p)) } }
      .toDF("site", "verdict", "pattern_len", "regex")
    val meta = parsed
      .map { case (site, _, d, n) => (site, d, n) }
      .toDF("site", "crawl_delay", "n_sitemaps")
    (rules, meta)
  }

  /** SQL VALUES of the SELECTED rules — rendered through the same
    * parse + select + translate as [[fixtureGroupFrames]] (the
    * twins cannot drift). */
  def sqlGroupRules: String = {
    val rows = fixtureRobotsBodies.flatMap { case (site, body) =>
      selectGroup(parseRobotsGroups(body)._1, FixtureAgent)._1
        .map { case (v, p) =>
          val re = translate(p).replace("'", "''")
          s"('$site', '$v', ${p.length}, '$re')"
        }
    }
    s"""(VALUES ${rows.mkString(",\n       ")})
       AS rules(site, verdict, pattern_len, regex)"""
  }

  /** SQL VALUES of the per-site (crawl_delay, n_sitemaps) metadata —
    * same rendering source. */
  def sqlGroupMeta: String = {
    val rows = fixtureRobotsBodies.map { case (site, body) =>
      val (groups, sitemaps) = parseRobotsGroups(body)
      val delay = selectGroup(groups, FixtureAgent)._2
        .map(_.toString).getOrElse("NULL")
      s"('$site', $delay, ${sitemaps.length})"
    }
    s"""(VALUES ${rows.mkString(",\n       ")})
       AS meta(site, crawl_delay, n_sitemaps)"""
  }

  /** The SAME rules as a SQL VALUES relation — rendered from
    * [[fixtureRules]] through the same [[translate]], so the twins
    * cannot drift. */
  def sqlFixtureRules: String = {
    val rows = fixtureRules.map { case (site, verdict, pat) =>
      // DuckDB '…' literals keep backslashes verbatim (no escape
      // processing) — only quotes need doubling
      val re = translate(pat).replace("'", "''")
      s"('$site', '$verdict', ${pat.length}, '$re')"
    }
    s"""(VALUES ${rows.mkString(",\n       ")})
       AS rules(site, verdict, pattern_len, regex)"""
  }
}
