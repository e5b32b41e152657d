package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-front-end text extraction (VERDICT r12 #3): HTML/markup →
  * clean prose + boilerplate signals — stage ZERO of an LLM curation
  * pipeline (every downstream operator here assumes `documents.text`
  * is already clean; this is the operator that makes it so).
  *
  * Reference has no analogue (`[U]` — pre-rename Stratosphere ships
  * no text extraction); this is a north-star extension in the family
  * of published crawl pipelines (C4/CCNet-style tag stripping +
  * boilerplate ratios), re-expressed as stateless per-row Spark
  * column expressions so it runs identically in batch and streaming
  * and costs one narrow projection — no shuffle, no UDF, fully
  * codegen'd (regexp_replace/replace are Catalyst expressions).
  *
  * ENGINE-PARITY DISCIPLINE (the TextNorm pattern): the whole
  * pipeline is ONE shared step table ([[Steps]]) from which BOTH the
  * Spark Column fold ([[cleanText]]) and the DuckDB SQL fold
  * ([[sqlCleanText]]) are generated — the twins cannot drift. Every
  * regex stays inside the Java-regex/RE2 common subset (no
  * backreferences — dropped-block patterns are expanded per tag — no
  * lookaround; inline (?is) flags; ASCII \b semantics agree).
  *
  * SUPPORTED SUBSET (kept exactly mirrorable; documented, not
  * silent):
  *  - comments `<!-- -->`, DOCTYPE, and all well-formed tags strip;
  *  - container blocks whose CONTENT is boilerplate (head, script,
  *    style, noscript, template, nav, header, footer, aside, iframe,
  *    form, svg) drop whole;
  *    a SELF-NESTED dropped block cuts at the first closing tag and
  *    an unclosed one keeps its (tag-stripped) content — single-pass
  *    semantics, same as published single-pass strippers;
  *  - block-level boundaries (</p>, </div>, </li>, </h1..6>, </tr>,
  *    </blockquote>, </pre>, </ul>, </ol>, </table>, </section>,
  *    </article>, <br>) become paragraph breaks;
  *  - NAMED entities amp/lt/gt/quot/apos/nbsp + the numeric &#39;
  *    decode; other numeric entities pass through verbatim (decoding
  *    arbitrary &#NNN; needs chr-of-capture, which regex replacement
  *    cannot express in either engine);
  *  - whitespace collapses per paragraph, blank paragraphs drop.
  */
object HtmlExtract {

  /** One pipeline step: a regex rewrite or a literal replace. */
  sealed trait Step
  /** Regex rewrite (Java/RE2 common subset; applied globally). */
  final case class Rx(pattern: String, repl: String) extends Step
  /** Literal (non-regex) replace — entity decoding. */
  final case class Lit(from: String, to: String) extends Step

  /** Tags whose whole content is boilerplate. Expanded to one
    * pattern per tag because RE2 has no backreferences. `head` is
    * listed (title/meta are chrome, not prose) and cannot false-match
    * `<header>`: `\b` fails between `d` and `e`, and `</head\s*>`
    * fails on `</header>`'s trailing `er`. */
  val DroppedBlocks: Seq[String] = Seq(
    "head", "script", "style", "noscript", "template", "nav", "header",
    "footer", "aside", "iframe", "form", "svg")

  /** Explicit whitespace class shared by both engines in place of
    * `\s` (ADVICE r13): Java regex `\s` includes `\x0B` (vertical
    * tab) while RE2/DuckDB `\s` does not, so raw input containing
    * `\x0B` would clean differently between the twins. Both engines
    * support the `\xhh` escape, so the explicit class — Java's exact
    * `\s` set — keeps the folds byte-identical on ALL input.
    * (Declared before [[PreSteps]]: object vals initialize in order.) */
  val Ws = "[ \\t\\n\\x0B\\f\\r]"

  /** Tags whose closer ends a paragraph. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr",
    "blockquote", "pre", "ul", "ol", "table", "section", "article")

  /** THE pipeline — single source of truth for both engines.
    * Order matters and is load-bearing: comments first (a commented-
    * out script must not drop live text), whole blocks before tag
    * stripping, entities after tag stripping (so `&lt;p&gt;` in text
    * never becomes a strippable tag — the anti-double-decode order),
    * `&amp;` LAST (the standard rule), whitespace last of all.
    * Split in two on purpose: [[PreSteps]] (comments + dropped
    * blocks) is also the stage the LINK-DENSITY signal reads — an
    * anchor inside chrome (nav/footer) must not count toward a
    * document's link mass, it is already boilerplate. */
  val PreSteps: Seq[Step] =
    Seq(Rx("(?s)<!--.*?-->", " ")) ++
    DroppedBlocks.map(t => Rx(s"(?is)<$t\\b[^>]*>.*?</$t$Ws*>", " "))

  /** The generic well-formed-tag pattern — shared by the step table
    * and the link-density anchor strip (one constant, review r13:
    * the file's whole discipline is that the twins cannot drift). */
  val TagStrip = "(?s)<[!/]?[a-zA-Z][^>]*>"

  val Steps: Seq[Step] =
    PreSteps ++
    Seq(
      Rx(s"(?i)<br$Ws*/?$Ws*>", "\n"),
      Rx(s"(?is)</(?:${BlockTags.mkString("|")})$Ws*>", "\n"),
      // every remaining well-formed tag (open, close, DOCTYPE) → a
      // space; a bare '<' in prose (e.g. "a < b") survives because
      // the pattern requires a letter or !// after it
      Rx(TagStrip, " "),
      Lit("&nbsp;", " "),
      Lit("&lt;", "<"),
      Lit("&gt;", ">"),
      Lit("&quot;", "\""),
      Lit("&#39;", "'"),
      Lit("&apos;", "'"),
      Lit("&amp;", "&"),
      // whitespace: horizontal runs → one space; spaces around
      // newlines off; newline runs → one; trim the ends
      Rx("[ \\t\\r]+", " "),
      Rx(" *\\n *", "\n"),
      Rx("\\n+", "\n"),
      Rx(s"^$Ws+", ""),
      Rx(s"$Ws+$$", ""))

  /** Clean prose with '\n' as the paragraph separator. */
  def cleanText(html: Column): Column =
    Steps.foldLeft(html) {
      case (c, Rx(p, r))  => regexp_replace(c, p, r)
      case (c, Lit(f, t)) => call_function("replace", c, lit(f), lit(t))
    }

  /** SQL-literal escape + newline-safe embedding for the oracle
    * twin: ' doubles; a REAL newline in a replacement becomes a
    * chr(10) concat (standard SQL strings don't process escapes).
    * Shared with [[Links]] (r17 review #6 — one helper, no drift). */
  private[text] def sqlLit(s: String): String = {
    val body = s.replace("'", "''").replace("\n", "' || chr(10) || '")
    s"'$body'"
  }

  /** DuckDB twin of [[cleanText]] — generated from the SAME step
    * table. DuckDB regexp_replace needs the explicit 'g' flag (Spark
    * is always-global); inline (?is) flags ride in the pattern. */
  def sqlCleanText(expr: String): String =
    Steps.foldLeft(expr) {
      case (e, Rx(p, r))  => s"regexp_replace($e, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
      case (e, Lit(f, t)) => s"replace($e, ${sqlLit(f)}, ${sqlLit(t)})"
    }

  /** Markup + boilerplate mass removed, in integer ppm of the raw
    * length — 0 for an empty raw string. Integer floor-div both
    * engines (the ppm discipline). */
  def boilerplatePpm(raw: Column, clean: Column): Column =
    when(length(raw) === 0, lit(0L))
      .otherwise(call_function("div",
        (length(raw) - length(clean)).cast("long") * lit(1000000L),
        length(raw).cast("long")))

  def sqlBoilerplatePpm(rawExpr: String, cleanExpr: String): String =
    s"""(CASE WHEN length($rawExpr) = 0 THEN 0
         ELSE CAST((length($rawExpr) - length($cleanExpr)) AS BIGINT)
           * 1000000 // length($rawExpr) END)"""

  /** Link density (the classic boilerpipe signal): anchor-TEXT mass
    * as ppm of the cleaned prose mass. Anchors are read AFTER the
    * [[PreSteps]] stage — chrome anchors (nav/footer menus) are
    * already gone and must not count — and each anchor's inner
    * markup strips with two light passes (tags → space, whitespace
    * collapse + trim); entities count as written (documented measure
    * — the density is a ratio signal, not a byte-exact transform,
    * but both engines compute the IDENTICAL integer ppm). A page of
    * prose scores near 0; a link farm approaches 1e6. */
  def linkDensityPpm(html: Column, clean: Column): Column = {
    val body = PreSteps.foldLeft(html) {
      case (c, Rx(p, r))  => regexp_replace(c, p, r)
      case (c, Lit(f, t)) => call_function("replace", c, lit(f), lit(t))
    }
    val anchors = regexp_extract_all(body,
      lit(s"(?is)<a\\b[^>]*>(.*?)</a$Ws*>"), lit(1))
    val mass = aggregate(anchors, lit(0L), (acc, a) =>
      acc + length(trim(regexp_replace(regexp_replace(a,
        TagStrip, " "), s"$Ws+", " "))).cast("long"))
    call_function("div", mass * lit(1000000L),
      greatest(length(clean).cast("long"), lit(1L)))
  }

  def sqlLinkDensityPpm(htmlExpr: String, cleanExpr: String): String = {
    val body = PreSteps.foldLeft(htmlExpr) {
      case (e, Rx(p, r))  => s"regexp_replace($e, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
      case (e, Lit(f, t)) => s"replace($e, ${sqlLit(f)}, ${sqlLit(t)})"
    }
    val strip = "trim(regexp_replace(regexp_replace(a, " +
      s"'$TagStrip', ' ', 'g'), '$Ws+', ' ', 'g'))"
    s"""CAST(coalesce(list_aggregate(list_transform(
          regexp_extract_all($body, '(?is)<a\\b[^>]*>(.*?)</a$Ws*>', 1),
          a -> CAST(length($strip) AS BIGINT)), 'sum'), 0) * 1000000
        // greatest(CAST(length($cleanExpr) AS BIGINT), 1) AS BIGINT)"""
  }

  /** Paragraph count of a cleaned string: newline count + 1, 0 when
    * empty (blank paragraphs were already dropped by the fold). */
  def nParas(clean: Column): Column =
    when(length(clean) === 0, lit(0L))
      .otherwise((length(clean) -
        length(call_function("replace", clean, lit("\n"), lit(""))) +
        lit(1L)).cast("long"))

  def sqlNParas(cleanExpr: String): String =
    s"""(CASE WHEN length($cleanExpr) = 0 THEN 0
         ELSE CAST(length($cleanExpr)
           - length(replace($cleanExpr, chr(10), '')) + 1 AS BIGINT) END)"""
}
