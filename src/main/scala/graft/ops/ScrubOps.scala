package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.pipeline.{Sampling, Scrub}
import graft.sim.Pca
import graft.text.TextFunctions.{fingerprint, sqlFingerprint}

/** Declared queries for the corpus-scrubbing + spectral operators
  * (graft.pipeline.Scrub, graft.sim.Pca), oracle-checked per the
  * driver contract. Kept out of TextOps only for file size — same
  * conventions throughout (scaled-integer exactness, aliased columns
  * matching the oracle, bounded outputs).
  */
object ScrubOps {

  /** Span-level duplicate scrubbing, per document: which token
    * positions sit inside a 3-token span shared with another doc, and
    * the fingerprint of the text that remains after removing them. */
  def qSpanScrub(spark: SparkSession, dir: String): DataFrame =
    Scrub.spanScrub(t(spark, dir, "documents"), k = 3, minDocs = 2,
      materialize = true)

  /** Intra-document repeated-span removal (first occurrence kept). */
  def qSelfScrub(spark: SparkSession, dir: String): DataFrame =
    Scrub.selfScrub(t(spark, dir, "documents"), k = 3)

  /** PII redaction over deterministically planted addresses/numbers:
    * the corpus text itself is PII-free word salad, so the query
    * derives a pii-bearing column IN BOTH ENGINES (append a doc_id-
    * keyed email + 7-digit number) and then redacts it — the operator
    * under test is redactPii/piiCounts, which take any text column;
    * the plant is just the shared test surface that makes the oracle
    * exercise real matches. fp_sum pins replacement placement, not
    * just match counts. */
  def qPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail.example or "),
      (col("doc_id") + lit(1000000L)).cast("string"))
    val (emails, nums) = Scrub.piiCounts(planted)
    t(spark, dir, "documents")
      .select(col("lang"), emails.cast("long").as("e"), nums.cast("long").as("m"),
        fingerprint(Scrub.redactPii(planted)).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("e")).as("n_emails"),
        sum(col("m")).as("n_nums"), sum(col("fp")).as("fp_sum"))
  }

  /** PII families beyond email (VERDICT r12 #7): phone-shaped,
    * IPv4-shaped, and Luhn-checked card-like spans over a
    * deterministically planted fixture (corpus text carries ZERO
    * digits — probed — so the plant fully controls the candidates,
    * ≤1 card per doc, which the single-candidate oracle replays
    * exactly; the multi-candidate fold is ScrubSpec-pinned). Bands:
    * phone (m=0), IPv4 (m=1), Luhn-VALID card from a fixed literal
    * set (m=2), Luhn-INVALID card-shaped run that must NOT redact
    * (m=3), and negatives — date / version / short id — that no
    * family may touch (m=4). fp_sum pins replacement placement. */
  def qPiiFamilies(spark: SparkSession, dir: String): DataFrame = {
    val m = col("doc_id") % 5
    val planted = concat(col("text"), when(m === 0,
        concat(lit(" call +1 "),
          lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"),
          lit(" 555 "),
          lpad((col("doc_id") % 9000 + 1000).cast("string"), 4, "0")))
      .when(m === 1,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."),
          (call_function("div", col("doc_id"), lit(7L)) % 256).cast("string")))
      .when(m === 2,
        concat(lit(" card "),
          when(col("doc_id") % 3 === 0, lit("4111111111111111"))
            .when(col("doc_id") % 3 === 1, lit("4539 1488 0343 6467"))
            .otherwise(lit("5500 0055 5555 5559"))))
      .when(m === 3, lit(" acct 4111111111111112"))
      .otherwise(lit(" on 2026-08-15 v1.2.3 build 12345")))
    val (phones, ips, shaped, valid) = Scrub.piiFamilyCounts(planted)
    t(spark, dir, "documents")
      .select(col("lang"), phones.cast("long").as("p"),
        ips.cast("long").as("i"), shaped.cast("long").as("cs"),
        valid.cast("long").as("cv"),
        fingerprint(Scrub.redactPiiFamilies(planted)).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("p")).as("n_phones"),
        sum(col("i")).as("n_ipv4"), sum(col("cs")).as("n_cards_shaped"),
        sum(col("cv")).as("n_cards_valid"), sum(col("fp")).as("fp_sum"))
  }

  /** Token-budget subsetting: cap every source at 1000 tokens,
    * admitting docs in deterministic hash order. */
  def qTokenBudget(spark: SparkSession, dir: String): DataFrame =
    Scrub.tokenBudget(t(spark, dir, "documents"), budgetTokens = 1000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("admitted").cast("long")).as("n_kept"),
        sum(when(col("admitted"), col("nt")).otherwise(lit(0L))).as("tokens_kept"),
        sum(col("nt")).as("tokens_total"))

  /** Top principal direction of the embedding second moment by
    * fixed-point power iteration; per-label projection statistics. */
  def qPcaPower(spark: SparkSession, dir: String): DataFrame =
    Pca.projectTopComponent(spark, t(spark, dir, "embeddings"))

  /** Second principal direction via exact fixed-point deflation. */
  def qPcaSecond(spark: SparkSession, dir: String): DataFrame =
    Pca.projectSecondComponent(spark, t(spark, dir, "embeddings"))

  /** Data selection by composite quality score (the simplified
    * rank-and-take form of classifier-based selection): an INTEGER
    * mills score — capped length boost, within-doc repetition
    * penalty, low-stopword penalty, every term engine-exact — ranks
    * docs per lang; keep the top 10. Plans as WindowGroupLimit (the
    * per-group top-k shape); score terms are per-row expressions over
    * one scan. */
  def qQualityRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextFunctions.{nTokens, repetitionMills, tokens, Stopwords}
    val nt = nTokens(col("text"))
    val ns = size(filter(tokens(col("text")), w => w.isin(Stopwords: _*)))
    val score = least(nt, lit(200)).cast("long") * lit(2L) -
      repetitionMills(col("text")) -
      when(ns * lit(20) < nt, lit(300L)).otherwise(lit(0L))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id"))
    t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), score.as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
  }

  /** Domain-reputation rollup ([[graft.pipeline.DomainReputation]]):
    * per-source quality/dup/PII rates and the blocked/review/clean
    * verdict — the CCNet/RefinedWeb domain-curation stage. */
  def qDomainRollup(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.DomainReputation.rollup(t(spark, dir, "documents"))

  /** The reputation feedback filter: docs joined with their domain's
    * verdict (AQE broadcasts the domain-bounded rollup at gate SF —
    * PlanAuditSpec pins it), kept iff domain not blocked AND the doc
    * passes the per-doc quality conjunction; reputation × kept
    * histogram with doc and token mass. */
  def qDomainFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val rep = graft.pipeline.DomainReputation.rollup(docs)
    graft.pipeline.DomainReputation.filterWith(docs, rep)
      .groupBy(col("reputation"), col("kept"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_domain_rollup" -> (qDomainRollup _),
    "q_domain_filter" -> (qDomainFilter _),
    "q_span_scrub" -> (qSpanScrub _),
    "q_self_scrub" -> (qSelfScrub _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_pii_families" -> (qPiiFamilies _),
    "q_token_budget" -> (qTokenBudget _),
    "q_pca_power" -> (qPcaPower _),
    "q_pca_second" -> (qPcaSecond _),
    "q_quality_rank" -> (qQualityRank _))

  val oracleSql: Map[String, String] = Map(
    "q_domain_rollup" -> graft.pipeline.DomainReputation.sqlRollup,
    "q_domain_filter" -> graft.pipeline.DomainReputation.sqlFilterHistogram,
    "q_span_scrub" -> Scrub.sqlSpanScrub(k = 3, minDocs = 2),
    "q_self_scrub" -> Scrub.sqlSelfScrub(k = 3),
    "q_pii_redact" -> {
      val pt = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@mail.example or ' || CAST(doc_id + 1000000 AS VARCHAR)"
      s"""WITH p AS (SELECT lang, $pt AS pt FROM documents)
         SELECT lang, COUNT(1) AS n_docs,
           CAST(SUM(${Scrub.sqlEmailCount("pt")}) AS BIGINT) AS n_emails,
           CAST(SUM(${Scrub.sqlNumberCount("pt")}) AS BIGINT) AS n_nums,
           CAST(SUM(${sqlFingerprint(Scrub.sqlRedactPii("pt"))}) AS BIGINT) AS fp_sum
         FROM p GROUP BY lang"""
    },
    "q_pii_families" -> {
      val pt =
        """text || (CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN ' call +1 '
              || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
              || ' 555 '
              || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')
            WHEN 1 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.' || CAST((doc_id // 7) % 256 AS VARCHAR)
            WHEN 2 THEN ' card ' || (CASE CAST(doc_id % 3 AS INT)
              WHEN 0 THEN '4111111111111111'
              WHEN 1 THEN '4539 1488 0343 6467'
              ELSE '5500 0055 5555 5559' END)
            WHEN 3 THEN ' acct 4111111111111112'
            ELSE ' on 2026-08-15 v1.2.3 build 12345' END)"""
      s"""WITH p AS (SELECT lang, $pt AS pt FROM documents)
         SELECT lang, COUNT(1) AS n_docs,
           CAST(SUM(${Scrub.sqlPhoneCount("pt")}) AS BIGINT) AS n_phones,
           CAST(SUM(${Scrub.sqlIpv4Count("pt")}) AS BIGINT) AS n_ipv4,
           CAST(SUM(${Scrub.sqlCardShapedCount("pt")}) AS BIGINT) AS n_cards_shaped,
           CAST(SUM(${Scrub.sqlCardValidCount("pt")}) AS BIGINT) AS n_cards_valid,
           CAST(SUM(${sqlFingerprint(Scrub.sqlRedactPiiFamiliesOne("pt"))}) AS BIGINT) AS fp_sum
         FROM p GROUP BY lang"""
    },
    "q_token_budget" ->
      s"""WITH d AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
             ${Sampling.sqlIdBucket("doc_id", 1000000)} AS b
           FROM documents),
         c AS (SELECT *, coalesce(SUM(nt) OVER (PARTITION BY source
             ORDER BY b, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           FROM d)
         SELECT source, COUNT(1) AS n_docs,
           CAST(SUM(CASE WHEN cum < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN cum < 1000 THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
           CAST(SUM(nt) AS BIGINT) AS tokens_total
         FROM c GROUP BY source""",
    "q_pca_power" -> Pca.sqlProjectTopComponent(),
    "q_pca_second" -> Pca.sqlProjectSecondComponent(),
    "q_quality_rank" -> {
      import graft.text.TextFunctions.{sqlLangScore, sqlRepetitionMills, Stopwords}
      s"""WITH q AS (SELECT lang, doc_id,
             CAST(least(len(string_split(text, ' ')), 200) * 2
               - (${sqlRepetitionMills("text")})
               - (CASE WHEN ${sqlLangScore("text", Stopwords)} * 20
                       < len(string_split(text, ' ')) THEN 300 ELSE 0 END)
               AS BIGINT) AS score
           FROM documents)
         SELECT lang, doc_id, score,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         FROM q QUALIFY rk <= 10"""
    })
}
