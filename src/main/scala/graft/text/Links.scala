package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML link extraction → the web-link graph (r17, VERDICT r16
  * missing #1): the composition that connects the wire chain
  * (WARC → HTTP → HTML) to the graph iteration family — every crawl
  * curation stack builds the link graph next, because it feeds
  * domain-authority ranking (PageRank over registrable domains),
  * frontier scoring, and spam-farm detection.
  *
  * Reference has no analogue (`[U]` — pre-rename Stratosphere ships
  * no crawl front-end); this extends the r13–r16 HtmlExtract/Url
  * machinery. Three pieces, all per-row string/array functions shared
  * verbatim with the DuckDB twins (the HtmlExtract/Url engine-parity
  * discipline — one pinned algorithm, two renderings):
  *
  *   - [[extractHrefs]]: anchor `href` values read AFTER
  *     [[HtmlExtract.PreSteps]] (comments + dropped blocks removed):
  *     a link inside chrome (nav/footer menus) or a script string is
  *     boilerplate, not an endorsement — the same body the
  *     link-density signal reads. Supported subset (documented, not
  *     silent): double- or single-QUOTED href attributes; when a tag
  *     carries several href attributes the LAST one wins (malformed
  *     markup, vanishingly rare).
  *   - [[withResolved]]: RFC 3986 reference resolution, the pinned
  *     subset a curation pipeline needs: absolute http(s) refs pass
  *     through; other schemes (mailto:, javascript:, tel:, data:)
  *     drop; `//host/...` takes the page's scheme; `?query` keeps
  *     the FULL base path; `/path` is root-relative; anything else
  *     resolves against the page's base directory — the canonical
  *     path with the RAW spelling's trailing slash restored, so a
  *     directory page (`…/docs/`) is its own base while a file page
  *     (`…/docs`) resolves against its parent; empty and
  *     `#fragment`-only refs drop (self-links). Dot-segment removal
  *     runs BOUNDED on the constructed PATH (never the authority):
  *     up to 2 consecutive `./` runs and 4 `../` levels (regex
  *     passes applied a fixed number of times — both engines share
  *     the exact passes); deeper nests stay literal, and an
  *     above-root `../` stays literal too (documented; it must
  *     never eat into the host).
  *   - the resolved absolute string then flows through the EXISTING
  *     [[Url.withCanonical]] + [[Url.registrableDomain]] — one
  *     canonical key space for pages and link targets alike.
  *
  * 100 TB posture: extraction + resolution are stateless per-row
  * projections (regexp extracts / when-chains — all codegen'd; the
  * only HOF anywhere is Url.withCanonical's one tiny query-param
  * stage). The link-graph queries explode to one row per (page,
  * href) — linear in the corpus' link mass, the same growth as the
  * corpus itself — and every downstream join keys on the fixed-width
  * registrable-domain string. The edges frame is localCheckpoint'd
  * before iteration joins (the r16 alias-re-expansion lesson:
  * join-constraint inference re-substitutes staged canonicalization
  * chains transitively and OOMs planning).
  */
object Links {

  private val Ws = HtmlExtract.Ws

  /** href patterns over the PreSteps-stripped body: an `<a` tag,
    * optional attributes, then a QUOTED href value. One pattern per
    * quote style (RE2 has no backreferences); capture group 2 is the
    * value. Greedy `[^>]*` cannot cross a `>` so the match stays
    * inside one tag — and lands on the LAST href when a malformed
    * tag carries several. */
  private[text] val HrefDq = s"""(?is)<a$Ws([^>]*$Ws)?href$Ws*=$Ws*"([^"]*)""""
  private[text] val HrefSq = s"(?is)<a$Ws([^>]*$Ws)?href$Ws*=$Ws*'([^']*)'"

  /** All anchor href values of the LIVE body (chrome/script anchors
    * excluded via [[HtmlExtract.PreSteps]]), double-quoted then
    * single-quoted (order is irrelevant downstream — the graph
    * aggregates). */
  def extractHrefs(html: Column): Column = {
    val body = HtmlExtract.PreSteps.foldLeft(html) {
      case (c, HtmlExtract.Rx(p, r))  => regexp_replace(c, p, r)
      case (c, HtmlExtract.Lit(f, t)) => call_function("replace", c, lit(f), lit(t))
    }
    concat(
      regexp_extract_all(body, lit(HrefDq), lit(2)),
      regexp_extract_all(body, lit(HrefSq), lit(2)))
  }

  /** SQL twin of [[extractHrefs]] (DuckDB needs the explicit 'g'
    * flag nowhere here — regexp_extract_all is always-global). */
  def sqlExtractHrefs(htmlExpr: String): String = {
    val body = HtmlExtract.PreSteps.foldLeft(htmlExpr) {
      case (e, HtmlExtract.Rx(p, r)) =>
        s"regexp_replace($e, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
      case (e, HtmlExtract.Lit(f, t)) =>
        s"replace($e, ${sqlLit(f)}, ${sqlLit(t)})"
    }
    s"""list_concat(
         regexp_extract_all($body, ${sqlLit(HrefDq)}, 2),
         regexp_extract_all($body, ${sqlLit(HrefSq)}, 2))"""
  }

  // SQL-literal escaping shared with HtmlExtract (one helper — the
  // two copies could drift, r17 review #6)
  private def sqlLit(s: String): String = HtmlExtract.sqlLit(s)

  /** Bounded dot-segment removal (pinned passes — see scaladoc):
    * `/./` twice (consecutive runs overlap on the shared slash),
    * then `/seg/../` four times. The parent segment must contain a
    * NON-dot character (`\.*[^/.?][^/?]*`) — a bare `..` matching as
    * the parent would collapse two dot-dots into zero (caught by the
    * LinksSpec four-level case); all-dot segments of 3+ dots are out
    * of scope as parents. Linear nesting: each intermediate is
    * referenced exactly once, so the Column tree stays small. */
  private val DotDot = "/\\.*[^/.?][^/?]*/\\.\\./"

  private def removeDots(u: Column): Column = {
    val noDot = regexp_replace(regexp_replace(u, "/\\./", "/"), "/\\./", "/")
    (1 to 4).foldLeft(noDot)((c, _) => regexp_replace(c, DotDot, "/"))
  }

  private def sqlRemoveDots(expr: String): String = {
    val noDot = s"regexp_replace(regexp_replace($expr," +
      " '/\\./', '/', 'g'), '/\\./', '/', 'g')"
    (1 to 4).foldLeft(noDot)((e, _) =>
      s"regexp_replace($e, '$DotDot', '/', 'g')")
  }

  /** Resolve `href` against the CANONICAL page URL `page` (staged
    * projections, the Url.withCanonical discipline): adds `out` =
    * the absolute PRE-canonical URL string, or null for dropped refs
    * (empty, fragment-only, non-http(s) schemes, schemeless pages).
    * `rawUrl` is the page's PRE-canonical spelling: canonicalization
    * strips a trailing slash, but RFC 3986 resolution needs it — a
    * DIRECTORY page (`…/docs/`) is its own base, while a file page
    * (`…/docs`) resolves against the parent — so the base path is
    * the canonical path with the raw spelling's trailing slash
    * restored (r17 review #3). Query-only refs (`?page=2`) keep the
    * FULL base path per the RFC (review #4). Dot-segment removal
    * runs on the constructed PATH only — applying it to the whole
    * URL let an above-root `../` eat the authority through the `//`
    * of `scheme://` (review #2); above-root dot-dots now stay
    * literal, as documented. Feed `out` through
    * [[Url.withCanonical]] next — resolution and canonicalization
    * stay two stages so each is oracle-pinnable. */
  def withResolved(df: DataFrame, page: Column, rawUrl: Column,
      href: Column, out: String): DataFrame = {
    val d1 = df.withColumn("_lr_page", page)
      .withColumn("_lr_raw", rawUrl)
      .withColumn("_lr_h", trim(href))
    val pg = col("_lr_page")
    val h = col("_lr_h")
    val d2 = d1
      .withColumn("_lr_scheme", substring_index(pg, "://", 1))
      .withColumn("_lr_root",
        regexp_extract(pg, "^([a-z][a-z0-9+.-]*://[^/]+)", 1))
      .withColumn("_lr_path",
        regexp_extract(pg, "^[a-z][a-z0-9+.-]*://[^/]+(/[^?]*)", 1))
      .withColumn("_lr_rawpath",
        regexp_extract(col("_lr_raw"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1))
    val d3 = d2.withColumn("_lr_fullpath",
      when(col("_lr_path") === "", lit("/"))
        .when(col("_lr_rawpath").endsWith("/") &&
          !col("_lr_path").endsWith("/"),
          concat(col("_lr_path"), lit("/")))
        .otherwise(col("_lr_path")))
    // greedy up-to-last-slash: a trailing-slash base is its own dir
    val d4 = d3.withColumn("_lr_dir",
      regexp_extract(col("_lr_fullpath"), "^(.*/)", 1))
    val hasScheme = h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:")
    val abs = when(locate("://", pg) === 0, lit(null))
      .when(h === "" || h.startsWith("#"), lit(null))
      .when(hasScheme,
        when(h.rlike("(?i)^https?://"), h).otherwise(lit(null)))
      .when(h.startsWith("//"), concat(col("_lr_scheme"), lit(":"), h))
      .when(h.startsWith("?"),
        concat(col("_lr_root"), col("_lr_fullpath"), h))
      .otherwise(concat(col("_lr_root"), removeDots(
        when(h.startsWith("/"), h)
          .otherwise(concat(col("_lr_dir"), h)))))
    d4.withColumn(out, abs)
      .drop("_lr_page", "_lr_raw", "_lr_h", "_lr_scheme", "_lr_root",
        "_lr_path", "_lr_rawpath", "_lr_fullpath", "_lr_dir")
  }

  /** Resolution against a page whose canonical and raw forms
    * coincide (fixtures/tests; canonical URLs never carry the
    * trailing-slash distinction). */
  def withResolved(df: DataFrame, page: Column, href: Column,
      out: String): DataFrame =
    withResolved(df, page, page, href, out)

  /** SQL twin of [[withResolved]] as a lateral-alias step chain
    * (`lr_`-prefixed). Embed in a SELECT list and read `lr_abs`
    * downstream; chain [[Url.sqlCanonSteps]] over it in the NEXT
    * query block (the two step chains both use generic alias names —
    * nesting them in one list would collide). */
  def sqlResolveSteps(pageExpr: String, rawExpr: String,
      hrefExpr: String): String =
    s"""$pageExpr AS lr_page,
       trim($hrefExpr) AS lr_h,
       split_part(lr_page, '://', 1) AS lr_scheme,
       regexp_extract(lr_page, '^([a-z][a-z0-9+.-]*://[^/]+)', 1) AS lr_root,
       regexp_extract(lr_page,
         '^[a-z][a-z0-9+.-]*://[^/]+(/[^?]*)', 1) AS lr_path,
       regexp_extract($rawExpr,
         '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS lr_rawpath,
       (CASE WHEN lr_path = '' THEN '/'
             WHEN ends_with(lr_rawpath, '/')
               AND NOT ends_with(lr_path, '/')
               THEN lr_path || '/'
             ELSE lr_path END) AS lr_fullpath,
       regexp_extract(lr_fullpath, '^(.*/)', 1) AS lr_dir,
       (CASE
         WHEN position('://' IN lr_page) = 0 THEN NULL
         WHEN lr_h = '' OR starts_with(lr_h, '#') THEN NULL
         WHEN regexp_matches(lr_h, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN
           (CASE WHEN regexp_matches(lr_h, '(?i)^https?://') THEN lr_h
                 ELSE NULL END)
         WHEN starts_with(lr_h, '//') THEN lr_scheme || ':' || lr_h
         WHEN starts_with(lr_h, '?') THEN lr_root || lr_fullpath || lr_h
         ELSE lr_root || ${sqlRemoveDots(
           """(CASE WHEN starts_with(lr_h, '/') THEN lr_h
                ELSE lr_dir || lr_h END)""")} END) AS lr_abs"""

  // ---- the gate fixture --------------------------------------------------

  /** Synthesize a page body with anchors per doc — four bands so
    * every extraction/resolution semantic is load-bearing at the
    * gate (k = site key, kn = the NEXT site — the cross-site edge
    * that makes the graph connected; p = a page key):
    *   band 0: a nav CHROME anchor (must not extract), an absolute
    *     messy cross-site link (upper-case + www + :80 + unsorted
    *     params + fragment — target canonicalization load-bearing),
    *     and a single-QUOTED root-relative link with a trailing
    *     slash;
    *   band 1: an `a/../` relative link (dot-dot removal), a
    *     fragment-only self link and a mailto: (both drop), plus a
    *     script-string href (PreSteps must remove it);
    *   band 2: a scheme-relative CDN link, a root-relative link
    *     carrying a tracking param (utm_ strip on targets), and a
    *     QUERY-ONLY pagination link (`?page=…` keeps the full base
    *     path per the RFC);
    *   band 3: a directory-relative link and an absolute https link
    *     into the `.co.uk` site family (two-level-suffix keying). */
  private[graft] def linkify(docId: Column): Column = {
    val kn = ((docId + 1) % 20).cast("string")
    val p = (docId % 97).cast("string")
    val b = docId % 4
    when(b === 0, concat(
        lit("<nav><a href=\"http://spam.example/x\">spam</a></nav><p>see " +
          "<a href=\"HTTP://WWW.Src"), kn,
        lit(".Example:80/path/a?b=2&a=1#x\">next</a> and " +
          "<a href='/about/team/'>the team</a></p>")))
      .when(b === 1, concat(
        lit("<p><a href=\"a/../up/page"), p,
        lit(".html\">up</a> <a href=\"#sec\">self</a> " +
          "<a href=\"mailto:x@example.com\">mail</a></p>" +
          "<script>var u = '<a href=\"http://evil.example/\">';</script>")))
      .when(b === 2, concat(
        lit("<p><a href=\"//cdn.src"), kn,
        lit(".example/lib?v=1\">cdn</a> " +
          "<a href=\"/promo?utm_source=feed&id="), p,
        lit("\">promo</a> <a href=\"?page="), p,
        lit("\">next page</a></p>")))
      .otherwise(concat(
        lit("<p><a href=\"sub/doc"), p,
        lit("\">rel</a> <a href=\"https://news.src"), kn,
        lit(".co.uk/story/?fbclid=f&id="), p,
        lit("\">story</a></p>")))
  }

  /** SQL twin of [[linkify]] — byte-for-byte the same synthesis. */
  private[graft] def sqlLinkify(idExpr: String): String = {
    val kn = s"CAST(($idExpr + 1) % 20 AS VARCHAR)"
    val p = s"CAST($idExpr % 97 AS VARCHAR)"
    s"""(CASE CAST($idExpr % 4 AS INT)
      WHEN 0 THEN '<nav><a href="http://spam.example/x">spam</a></nav><p>see '
        || '<a href="HTTP://WWW.Src' || $kn
        || '.Example:80/path/a?b=2&a=1#x">next</a> and '
        || '<a href=''/about/team/''>the team</a></p>'
      WHEN 1 THEN '<p><a href="a/../up/page' || $p
        || '.html">up</a> <a href="#sec">self</a> '
        || '<a href="mailto:x@example.com">mail</a></p>'
        || '<script>var u = ''<a href="http://evil.example/">'';</script>'
      WHEN 2 THEN '<p><a href="//cdn.src' || $kn
        || '.example/lib?v=1">cdn</a> '
        || '<a href="/promo?utm_source=feed&id=' || $p || '">promo</a> '
        || '<a href="?page=' || $p || '">next page</a></p>'
      ELSE '<p><a href="sub/doc' || $p
        || '">rel</a> <a href="https://news.src' || $kn
        || '.co.uk/story/?fbclid=f&id=' || $p || '">story</a></p>' END)"""
  }
}
