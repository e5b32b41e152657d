package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Host/domain-level curation rollup (VERDICT r13 missing #4) — the
  * CCNet/RefinedWeb "domain reputation" stage: per-document signals
  * the pipeline already computes (quality verdicts, exact-duplicate
  * fingerprints, PII family hits) aggregated BY SOURCE DOMAIN and fed
  * back as a document-level keep signal. A domain whose documents are
  * mostly boilerplate, templates, or PII is dropped wholesale —
  * catching documents that look individually fine but come from a
  * farm the per-doc filters can't see.
  *
  * Signals per domain (all integer-exact, engine-shared):
  *   - n_quality_bad: docs failing [[TextFunctions.qualityOk]] (the
  *     q_quality_filter conjunction).
  *   - n_dup_extra: documents over distinct text fingerprints — the
  *     domain's INTERNAL template redundancy (cross-domain dup is the
  *     global dedup pass's job; reputation wants the domain's own).
  *   - n_pii_docs: docs with any PII family hit (email, phone, IPv4,
  *     Luhn-valid card — the [[Scrub]] detectors).
  *
  * Verdict tiers on the combined risk count (signals may overlap on
  * a doc — risk is a signal rate, not a doc partition), thresholds
  * cross-multiplied so the comparison is integer-exact:
  *   blocked: risk/n_docs > 2/5    review: risk/n_docs > 1/3
  *
  * 100 TB posture: the rollup is ONE grouped aggregate over per-row
  * projections (count_distinct of the 8-byte fingerprint is the only
  * shuffle, keyed (source, fp) with partial aggregation — metadata
  * width, never text). The feedback join keys on source; the rollup
  * frame is DOMAIN-cardinality, so no hard broadcast hint (the r8
  * rule: a crawl has tens of millions of domains — AQE broadcasts it
  * while it fits, and degrades to a keyed shuffle join when it
  * doesn't; a hard hint would OOM executors at exactly the scale the
  * stage exists for). PlanAuditSpec pins the gate-SF broadcast.
  */
object DomainReputation {

  /** blocked when risk * BlockDen > n_docs * BlockNum (rate > 2/5). */
  val BlockNum = 2
  val BlockDen = 5

  /** review when risk * ReviewDen > n_docs * ReviewNum (rate > 1/3). */
  val ReviewNum = 1
  val ReviewDen = 3

  /** Any-PII-hit indicator (0/1 long) over a text column. */
  private def piiHit(text: Column): Column = {
    val (emails, _) = Scrub.piiCounts(text)
    val (phones, ips, _, valid) = Scrub.piiFamilyCounts(text)
    when(emails + phones + ips + valid > 0, 1L).otherwise(0L)
  }

  /** The per-row signal projection shared by the batch and stream
    * rollups: (source, bad, pii, fp). */
  private def signals(docs: DataFrame): DataFrame = {
    val bad = when(!TextFunctions.qualityOk(col("text")), 1L).otherwise(0L)
    docs.select(col("source"), bad.as("bad"), piiHit(col("text")).as("pii"),
      TextFunctions.fingerprint(col("text")).as("fp"))
  }

  /** The shared verdict fold over an aggregated signal frame. */
  private def verdicts(agg: DataFrame): DataFrame =
    agg
      .withColumn("risk",
        col("n_quality_bad") + col("n_dup_extra") + col("n_pii_docs"))
      .withColumn("reputation",
        when(col("risk") * BlockDen > col("n_docs") * BlockNum, "blocked")
          .when(col("risk") * ReviewDen > col("n_docs") * ReviewNum, "review")
          .otherwise("clean"))

  /** The per-domain rollup:
    * (source, n_docs, n_quality_bad, n_dup_extra, n_pii_docs, risk,
    * reputation). */
  def rollup(docs: DataFrame): DataFrame =
    verdicts(signals(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bad")).as("n_quality_bad"),
        (count(lit(1)) - count_distinct(col("fp"))).as("n_dup_extra"),
        sum(col("pii")).as("n_pii_docs")))

  /** Streaming twin of [[rollup]]: the same signals and verdict fold
    * over an UNBOUNDED doc stream, run in Complete output mode so
    * every micro-batch re-emits the current per-domain verdicts (the
    * frame a nightly refresh would persist for [[filterWith]]'s
    * frozen side). The one mechanical difference: streaming
    * aggregation does not support exact count_distinct, so the dup
    * signal folds as `n_docs − size(collect_set(fp))` — the same
    * number, with the distinct-fp set carried in the aggregation
    * state. State is per-domain distinct-doc bounded; a deployment
    * whose single domains outgrow executor state uses
    * [[rollupStreamSketched]] — the KMV swap, implemented r15 with
    * hard bottom-k state. DomainReputationSpec pins final emission ≡
    * the batch rollup over the same rows. */
  def rollupStream(docStream: DataFrame): DataFrame =
    verdicts(signals(docStream)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bad")).as("n_quality_bad"),
        (count(lit(1)) - size(collect_set(col("fp"))).cast("long"))
          .as("n_dup_extra"),
        sum(col("pii")).as("n_pii_docs")))

  /** Per-domain rollup state of [[rollupStreamSketched]]: exact
    * counters + a bottom-k KMV sketch of the fingerprint hashes —
    * AT MOST k longs per domain, the bound [[rollupStream]]'s
    * collect_set lacks. */
  private[pipeline] final case class KmvRollupState(nDocs: Long, nBad: Long,
      nPii: Long, bottom: Vector[Long])

  /** [[Sketches.longHash]]'s arithmetic on a driver long, sign-safe
    * (fingerprints are full-range xxhash64). */
  private[pipeline] def kmvHash(fp: Long): Long =
    Math.floorMod(Math.floorMod(fp, TextFunctions.HashMod) * 2654435761L,
      TextFunctions.HashMod)

  /** Insert into a sorted bottom-k vector (no-op when present or
    * above the kth). */
  private[pipeline] def kmvInsert(bottom: Vector[Long], h: Long, k: Int)
      : Vector[Long] = {
    val i = bottom.search(h)(Ordering.Long)
    i match {
      case scala.collection.Searching.Found(_) => bottom
      case scala.collection.Searching.InsertionPoint(p) =>
        if (bottom.length >= k && p >= k) bottom
        else {
          val grown = bottom.patch(p, Seq(h), 0)
          if (grown.length > k) grown.take(k) else grown
        }
    }
  }

  /** The distinct estimate of a bottom-k state: EXACT while
    * under-full (fewer than k distinct hashes seen), the standard
    * (k−1)·M / h_k KMV read-out once full. */
  private[pipeline] def kmvDistinct(bottom: Vector[Long], k: Int): Long =
    if (bottom.length < k) bottom.length.toLong
    else ((k - 1).toLong * TextFunctions.HashMod) / math.max(bottom.last, 1L)

  final case class DomainVerdict(source: String, n_docs: Long,
      n_quality_bad: Long, n_dup_extra: Long, n_pii_docs: Long,
      risk: Long, reputation: String)

  /** [[rollupStream]] with BOUNDED per-domain state — the KMV swap
    * the r14 scaladoc documented as the deployment's move when single
    * domains outgrow executor state, now implemented (r15, VERDICT
    * r14 watch item): custom state via mapGroupsWithState (the
    * Structured Streaming surface for it), one KmvRollupState per
    * domain — three counters plus AT MOST k fingerprint hashes, vs
    * collect_set's per-domain-distinct-doc growth. The dup signal is
    * exact while a domain has fewer than k distinct docs (spec-pinned
    * ≡ [[rollup]]) and degrades to the (k−1)·M/h_k KMV estimate past
    * it, at the standard ~1/√k relative error — a documented
    * tolerance on n_dup_extra only; the quality/PII counters stay
    * exact. Emits the running verdict per domain each batch (Update
    * mode). */
  def rollupStreamSketched(docStream: DataFrame, k: Int)
      : org.apache.spark.sql.Dataset[DomainVerdict] = {
    import docStream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    require(k >= 2, s"bottom-$k sketch needs k >= 2")
    signals(docStream).as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KmvRollupState, DomainVerdict](
        GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[(String, Long, Long, Long)],
            state: GroupState[KmvRollupState]) =>
          var s = state.getOption
            .getOrElse(KmvRollupState(0L, 0L, 0L, Vector.empty))
          it.foreach { case (_, bad, pii, fp) =>
            s = KmvRollupState(s.nDocs + 1, s.nBad + bad, s.nPii + pii,
              kmvInsert(s.bottom, kmvHash(fp), k))
          }
          state.update(s)
          val distinct = math.min(kmvDistinct(s.bottom, k), s.nDocs)
          val dupExtra = s.nDocs - distinct
          val risk = s.nBad + dupExtra + s.nPii
          val rep =
            if (risk * BlockDen > s.nDocs * BlockNum) "blocked"
            else if (risk * ReviewDen > s.nDocs * ReviewNum) "review"
            else "clean"
          DomainVerdict(src, s.nDocs, s.nBad, dupExtra, s.nPii, risk, rep)
      }
  }

  /** The feedback filter: every document joined with its domain's
    * reputation; kept (1/0) iff the domain is not blocked AND the
    * document itself passes the per-doc quality conjunction. LEFT
    * join (review r14 #2): in the frozen-rollup serving twin a doc
    * whose domain was first crawled AFTER the rollup refresh has no
    * reputation row yet — it must surface as `unknown` (not blocked;
    * per-doc rules still apply) rather than silently vanish from the
    * output until the next refresh. Returns the doc-level frame
    * (doc_id, source, reputation, kept, nt) — compose downstream or
    * aggregate for the gate. */
  def filterWith(docs: DataFrame, rep: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        TextFunctions.nTokens(col("text")).cast("long").as("nt"),
        when(TextFunctions.qualityOk(col("text")), 1L).otherwise(0L)
          .as("doc_ok"))
      .join(rep.select(col("source"), col("reputation")), Seq("source"),
        "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("reputation"), lit("unknown")).as("reputation"),
        when(coalesce(col("reputation"), lit("unknown")) =!= "blocked" &&
          col("doc_ok") === 1L, 1L).otherwise(0L).as("kept"),
        col("nt"))

  // ---- oracle twins ----------------------------------------------------

  /** Shared rollup CTE over the documents table (ends in `rep`). */
  def sqlRollupCte: String = sqlRollupCteOver("documents")

  /** Shared rollup CTE over any relation with (source, text) columns
    * (r16: the URL-canonicalized rollup re-keys on the registrable
    * domain, so the source relation is a parameter). */
  def sqlRollupCteOver(rel: String): String = {
    val pii =
      s"""CASE WHEN ${Scrub.sqlEmailCount("text")}
            + ${Scrub.sqlPhoneCount("text")}
            + ${Scrub.sqlIpv4Count("text")}
            + ${Scrub.sqlCardValidCount("text")} > 0 THEN 1 ELSE 0 END"""
    s"""d AS (SELECT source,
           CASE WHEN NOT ${TextFunctions.sqlQualityOk("text")}
                THEN 1 ELSE 0 END AS bad,
           $pii AS pii,
           ${TextFunctions.sqlFingerprint("text")} AS fp
         FROM $rel),
       r AS (SELECT source, COUNT(1) AS n_docs,
           CAST(SUM(bad) AS BIGINT) AS n_quality_bad,
           COUNT(1) - COUNT(DISTINCT fp) AS n_dup_extra,
           CAST(SUM(pii) AS BIGINT) AS n_pii_docs
         FROM d GROUP BY source),
       rep AS (SELECT *,
           n_quality_bad + n_dup_extra + n_pii_docs AS risk,
           CASE WHEN (n_quality_bad + n_dup_extra + n_pii_docs) * $BlockDen
                     > n_docs * $BlockNum THEN 'blocked'
                WHEN (n_quality_bad + n_dup_extra + n_pii_docs) * $ReviewDen
                     > n_docs * $ReviewNum THEN 'review'
                ELSE 'clean' END AS reputation
         FROM r)"""
  }

  /** SQL twin of [[rollup]]. */
  def sqlRollup: String =
    s"""WITH $sqlRollupCte
       SELECT source, n_docs, n_quality_bad, n_dup_extra, n_pii_docs,
         risk, reputation
       FROM rep"""

  /** SQL twin of the [[filterWith]] gate aggregate (reputation ×
    * kept histogram with doc and token mass). */
  def sqlFilterHistogram: String =
    s"""WITH $sqlRollupCte
       SELECT COALESCE(rep.reputation, 'unknown') AS reputation,
         CAST(CASE WHEN COALESCE(rep.reputation, 'unknown') <> 'blocked'
                   AND ${TextFunctions.sqlQualityOk("doc.text")}
              THEN 1 ELSE 0 END AS BIGINT) AS kept,
         COUNT(1) AS n_docs,
         CAST(SUM(len(string_split(doc.text, ' '))) AS BIGINT) AS n_tokens
       FROM documents doc LEFT JOIN rep USING (source)
       GROUP BY 1, 2"""
}
