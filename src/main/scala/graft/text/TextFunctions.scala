package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (driver-mandated scope extension; SURVEY.md §7 phase 4).
  *
  * Everything is Column-expressed (codegen'd, no UDFs) and uses only
  * arithmetic/array primitives that DuckDB evaluates identically, so
  * each operator is oracle-checkable. The portable word/rolling hash
  * keeps all intermediates < 2^53 so both engines stay exact.
  */
object TextFunctions {

  val HashMod = 1000000007L

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** q_quality_filter rule thresholds — the single source shared by
    * the filter itself (ops.TextOps.qQualityFilter) and the
    * distillation label ([[graft.pipeline.QualityModel]]), so the
    * "distills the shipped rule" contract can't silently drift:
    * keep iff nt >= MinTokens AND wl <= nt * MaxAvgWordLen AND
    * ns * StopwordDen >= nt. */
  val QualityMinTokens = 20
  val QualityMaxAvgWordLen = 8
  val QualityStopwordDen = 20

  /** The rule's keep-predicate as one shared expression (the
    * conjunction of the three signals) — used by the pipeline
    * composition so the stage can't drift from the filter. */
  def qualityOk(text: Column): Column = {
    val nt = nTokens(text)
    val wl = length(text) - nt + lit(1)
    val ns = size(filter(tokens(text), w => w.isin(Stopwords: _*)))
    nt >= QualityMinTokens && wl <= nt * QualityMaxAvgWordLen &&
      ns * QualityStopwordDen >= nt
  }

  /** SQL twin of [[qualityOk]]. */
  def sqlQualityOk(textExpr: String): String = {
    val nt = s"len(string_split($textExpr, ' '))"
    s"""($nt >= $QualityMinTokens
        AND length($textExpr) - $nt + 1 <= $nt * $QualityMaxAvgWordLen
        AND ${sqlLangScore(textExpr, Stopwords)} * $QualityStopwordDen >= $nt)"""
  }

  /** Canonical text normalization — the cleanup pass a corpus runs
    * BEFORE any hashing/dedup/tokenizing operator, so visually-equal
    * strings are byte-equal: Unicode NFC composition
    * ([[graft.functions.TextNorm]]), control characters (C0 + DEL)
    * to spaces, space runs collapsed, ends trimmed. Stateless
    * per-row (streams unchanged); regex classes chosen to mean the
    * same thing in Java regex and RE2. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.TextNorm.nfcNormalize(text),
        "[\\x00-\\x1F\\x7F]", " "),
      " +", " "))

  /** SQL twin of [[normalizeText]] (NFC is a Unicode standard — the
    * engines' tables agree by construction). */
  def sqlNormalizeText(textExpr: String): String =
    s"""trim(regexp_replace(regexp_replace(nfc_normalize($textExpr),
         '[\\x00-\\x1F\\x7F]', ' ', 'g'), ' +', ' ', 'g'))"""

  /** Portable per-word value: first char, last char, length — cheap,
    * deterministic, and expressible in any SQL dialect. */
  def wordVal(w: Column): Column =
    (ascii(w) * lit(1024L) + ascii(substring(w, -1, 1)) * lit(32L) + length(w)).cast("long")

  /** SQL twin of [[wordVal]] (the formula several oracle strings
    * previously hand-inlined — change it HERE only). */
  def sqlWordVal(wExpr: String): String =
    s"CAST(ascii($wExpr)*1024 + ascii(right($wExpr,1))*32 + length($wExpr) AS BIGINT)"

  /** Rolling polynomial hash over the token stream (document
    * fingerprint): h = fold(h*31 + wordVal(w) mod p). Runs as an
    * imperative expression (graft.functions.FingerprintExpr); the HOF
    * formulation below is kept as the semantic reference. */
  def fingerprint(text: Column): Column =
    graft.functions.TextExprs.fingerprintFast(text)

  /** HOF reference formulation of [[fingerprint] ] (parity-tested). */
  def fingerprintHof(text: Column): Column =
    aggregate(transform(tokens(text), w => wordVal(w)),
      lit(0L), (acc, v) => (acc * 31 + v) % HashMod)

  /** SQL twin of [[fingerprint]] for the DuckDB oracle. */
  def sqlFingerprint(textExpr: String): String =
    s"""list_reduce(
         list_prepend(CAST(0 AS BIGINT), list_transform(string_split($textExpr, ' '),
           w -> ${sqlWordVal("w")})),
         (acc, v) -> (acc*31 + v) % $HashMod)"""

  /** Distinct word-level n-gram shingles (as strings). n=3 runs as an
    * imperative expression; other n fall back to the HOF form. */
  def shingles(text: Column, n: Int = 3): Column =
    if (n == 3) graft.functions.TextExprs.shingles3Fast(text)
    else shinglesHof(text, n)

  /** HOF reference formulation of [[shingles]] (parity-tested). */
  def shinglesHof(text: Column, n: Int = 3): Column = {
    val ws = tokens(text)
    // guard: Spark's sequence(0, negative) counts DOWN; short docs
    // must yield an empty shingle set (as DuckDB's generate_series does)
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** SQL twin of [[shingles]] (n=3). */
  def sqlShingles3(textExpr: String): String =
    s"""list_distinct(list_transform(
          generate_series(1, len(string_split($textExpr,' ')) - 2),
          i -> string_split($textExpr,' ')[i] || ' ' ||
               string_split($textExpr,' ')[i+1] || ' ' ||
               string_split($textExpr,' ')[i+2]))"""

  /** Distinct shingle hash values (rolling hash of each shingle's
    * words) — the numeric form LSH operates on. n=3 runs as an
    * imperative expression; other n fall back to the HOF form. */
  def shingleVals(text: Column, n: Int = 3): Column =
    if (n == 3) graft.functions.TextExprs.shingleVals3Fast(text)
    else shingleValsHof(text, n)

  /** HOF reference formulation of [[shingleVals]] (parity-tested). */
  def shingleValsHof(text: Column, n: Int = 3): Column = {
    val ws = tokens(text)
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => aggregate(transform(slice(ws, i + 1, lit(n)), w => wordVal(w)),
          lit(0L), (acc, v) => (acc * 31 + v) % HashMod))))
      .otherwise(array().cast("array<long>"))
  }

  /** SQL twin of [[shingleVals]] (n=3). */
  def sqlShingleVals3(textExpr: String): String =
    s"""list_distinct(list_transform(
          generate_series(1, len(string_split($textExpr,' ')) - 2),
          i -> list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split($textExpr,' ')[i:i+2],
                w -> ${sqlWordVal("w")})),
            (acc, v) -> (acc*31 + v) % $HashMod)))"""

  /** Quality signals: token count, mean word length (exact rational),
    * stopword ratio. Scores are exact per-row rationals; aggregate
    * with Tables.exactAvg when grouping. */
  val Stopwords = Seq("a", "the", "is", "of", "and", "to", "in")

  def nTokens(text: Column): Column = size(tokens(text))

  def meanWordLen(text: Column): Column =
    (length(text) - nTokens(text) + 1).cast("double") / nTokens(text)

  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), w => w.isin(Stopwords: _*)))
      .cast("double") / nTokens(text)

  /** Within-doc repetition (a Gopher/C4-style quality signal): the
    * fraction of word 3-grams that repeat an earlier 3-gram of the
    * same doc, in exact integer mills — 1000 - distinct*1000 div
    * total. Docs with < 3 tokens have no 3-grams and score 0. All
    * integer arithmetic (floor division), so the DuckDB twin is
    * bit-exact; floor on the double quotient is safe because
    * distinct*1000 < 2^53 for any real document. */
  def repetitionMills(text: Column): Column = {
    val total = nTokens(text) - 2
    val num = size(shingles(text)).cast("long") * lit(1000L)
    when(total > 0,
      lit(1000L) - floor(num.cast("double") / total).cast("long"))
      .otherwise(lit(0L))
  }

  /** SQL twin of [[repetitionMills]]. */
  def sqlRepetitionMills(textExpr: String): String =
    s"""CASE WHEN len(string_split($textExpr,' ')) >= 3
        THEN 1000 - (len(${sqlShingles3(textExpr)}) * 1000)
               // (len(string_split($textExpr,' ')) - 2)
        ELSE 0 END"""

  /** Punctuation ratio: non-alphanumeric-non-space chars / chars. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
      .cast("double") / length(text)

  /** BPE-style pre-tokenization count: alpha runs, digit runs, and
    * individual symbol chars each count as one token (the word-level
    * approximation of a byte-pair pre-tokenizer split). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])"), lit(1)))

  def sqlPunctRatio(textExpr: String): String =
    s"""CAST(length($textExpr) - length(regexp_replace($textExpr, '[^a-zA-Z0-9 ]', '', 'g'))
        AS DOUBLE) / length($textExpr)"""

  def sqlBpeTokenCount(textExpr: String): String =
    s"len(regexp_extract_all($textExpr, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])'))"

  /** Language ID by marker-word voting: count tokens in each
    * language's marker set; argmax with fixed tie-break order.
    * Marker sets derived from the per-language word distributions of
    * the documents corpus (frequency-ranked top words per lang). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("small", "data", "scan", "key", "table"),
    "en" -> Seq("column", "sort", "window", "agg", "value"),
    "es" -> Seq("line", "part", "hash", "spark", "column"),
    "fr" -> Seq("order", "query", "group", "customer", "sort"),
    "zh" -> Seq("merge", "vector", "the", "fast", "group"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(markers: _*)))

  /** Predicted language: argmax of marker scores, ties broken by the
    * fixed lang order (de, en, es, fr, zh). */
  def predictedLang(text: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("??")) { case ((l, s), els) =>
      when(s === best, lit(l)).otherwise(els)
    }
  }

  /** SQL twins for lang-id scoring. */
  def sqlLangScore(textExpr: String, markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(string_split($textExpr, ' '), w -> w IN ($set)))"
  }

  def sqlPredictedLang(textExpr: String): String = {
    val scores = LangMarkers.map { case (l, m) => l -> sqlLangScore(textExpr, m) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    scores.reverse.foldLeft("'??'") { case (els, (l, s)) =>
      s"CASE WHEN $s = $best THEN '$l' ELSE $els END"
    }
  }
}
