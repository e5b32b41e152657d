package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.text.TextFunctions
import graft.text.TextFunctions._
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.multimodal.Multimodal

/** LLM-training-data pipeline queries (SURVEY.md §7 phase 4) over the
  * documents/embeddings tables: dedup family, similarity search, text
  * analysis, multimodal plumbing.
  *
  * Oracle discipline: the oracle only ever runs at sf0.01, so oracle
  * SQL may use brute-force candidate generation (all pairs sharing a
  * shingle) even where the Spark side uses the scalable exact
  * algorithm (prefix filter / LSH) — outputs agree because both
  * verify candidates exactly against full shingle sets. MinHash is
  * the exception: LSH false negatives are part of its semantics, so
  * its oracle replicates signatures and banding arithmetic exactly.
  */
object TextOps {

  // ---- dedup ---------------------------------------------------------

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDupHistogram(t(spark, dir, "documents"))

  /** Window length for [[qDedupSubstring]] — long enough that shared
    * windows mean real boilerplate, short enough that the gate corpus
    * exercises the operator (45+ docs carry cross-doc 8-grams at both
    * gate SFs, probed). */
  val SubstringK = 8

  /** EXACT SUBSTRING dedup spans ([[graft.dedup.Dedup
    * .exactSubstringSpans]]): per doc, the merged coverage of k-token
    * windows that appear verbatim in ≥2 distinct documents — the
    * sub-document boilerplate detector (Lee et al. 2022 granularity)
    * next to the doc-level dedup family. */
  def qDedupSubstring(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstringSpans(t(spark, dir, "documents"), SubstringK)

  /** The REMOVAL half ([[graft.dedup.Dedup.exactSubstringScrub]]):
    * duplicated windows cut (globally-first occurrence kept), every
    * doc's scrubbed content pinned by token counts + a rolling-hash
    * fingerprint of the order-preserved remaining text. */
  def qSubstringScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstringScrub(t(spark, dir, "documents"), SubstringK)

  /** Fixpoint passes for [[qSubstringFixpoint]] — 3 is enough for the
    * gate corpus to reach the fixed point (second-order duplication
    * created by pass-1 cuts is scrubbed by pass 2; pass 3 verifies),
    * and the oracle unrolls exactly this many. */
  val SubstringFixpointPasses = 3

  /** FIXPOINT substring scrub ([[graft.dedup.Dedup
    * .exactSubstringScrubFixpoint]], VERDICT r12 #5): the scrub
    * re-run until no pass removes a token (bounded by
    * [[SubstringFixpointPasses]]) — catches the second-order
    * duplication that pass-1 cuts can CREATE (new adjacencies whose
    * windows were not duplicated before). Oracle = the pass unrolled
    * the same number of times; early convergence is invisible to it
    * because an extra pass on a fixed point is the identity. */
  def qSubstringFixpoint(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstringScrubFixpoint(t(spark, dir, "documents"),
      SubstringK, maxPasses = SubstringFixpointPasses)

  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardSimilarityJoin(t(spark, dir, "documents"), 0.8)

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(spark, dir, "documents"), 0.5)

  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosinePairs(t(spark, dir, "embeddings"), 0.35)

  /** Semantic (embedding-space) near-dup clusters
    * ([[Dedup.embeddingClusters]]): the paraphrase-dedup terminal. */
  def qEmbedClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingClusters(t(spark, dir, "embeddings"), 0.35)

  /** Signature-slot audit: estimated (matching minhash slots) vs true
    * (exact shingle) similarity per verified pair — pins the
    * signature arithmetic itself, not just the band keys. */
  def qMinhashEstimate(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashEstimatePairs(t(spark, dir, "documents"), 0.5)

  /** LSH band-occupancy monitor ([[Dedup.bandOccupancy]]): the bucket
    * health view behind the hot-bucket guards. */
  def qBandStats(spark: SparkSession, dir: String): DataFrame =
    Dedup.bandOccupancy(t(spark, dir, "documents"))

  /** Directional shingle containment at 0.9 — quote/subset/boilerplate
    * detection (high containment, possibly low Jaccard). */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentJoin(t(spark, dir, "documents"), 0.9)

  /** Transitive near-dup clusters over the MinHash pair graph —
    * the keep-one-per-cluster dedup terminal. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDupClusters(t(spark, dir, "documents"), 0.5)

  /** The dedup terminal end-to-end: per-lang size + id checksum of the
    * corpus AFTER transitive near-dup removal (keep one representative
    * per cluster). */
  def qDedupKeep(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupKeep(t(spark, dir, "documents"), 0.5)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))

  /** Dedup-aware LOSS WEIGHTING (the keep-but-downweight alternative
    * to dropping): every doc stays, weighted 1e6 div n_copies ppm so
    * each duplicate GROUP contributes one doc's worth of loss mass —
    * the soft-dedup recipe used when exact dropping is too
    * aggressive. One windowed count per text-identity group (same
    * identity as q_dedup_exact), then a tiny histogram agg. The
    * window PARTITIONS on (xxhash64(text), length(text)) — the
    * scale-safe fixed-width key (VERDICT r16 wrong #2: the full-text
    * key shuffles and sorts whole documents; the q_wire_e2e fix,
    * same discipline) — a collision needs a 64-bit hash tie AND an
    * exact length tie, and the text-keyed oracle twin pins identity
    * at the gate. Output: (n_copies, weight_ppm, n_docs, eff_sum) —
    * eff_sum the group band's total effective mass. */
  def qDupWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(xxhash64(col("text")), length(col("text")))
    t(spark, dir, "documents")
      .select(col("doc_id"), count(lit(1)).over(w).as("n_copies"))
      .select(col("n_copies"), expr("1000000L div n_copies").as("weight_ppm"))
      .groupBy(col("n_copies"), col("weight_ppm"))
      .agg(count(lit(1)).as("n_docs"), sum(col("weight_ppm")).as("eff_sum"))
  }

  /** Incremental-index dedup e2e: persist a [[graft.dedup.DedupIndex]]
    * over a deterministic half of the corpus (even doc_ids), then flag
    * the other half against the stored index — the "is today's crawl
    * already in the corpus" production shape, oracle-checked across
    * the index/delta boundary. The timed work includes the index WRITE
    * (that IS the operator's cost model: sign+persist once, probe
    * per delta); the oracle replays the same signature/banding SQL as
    * q_dedup_minhash with candidates restricted to odd-vs-even. */
  def qDedupIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_dedup_index"
    graft.dedup.DedupIndex.write(docs.filter(col("doc_id") % 2 === 0), table, buckets = 8)
    graft.dedup.DedupIndex.flagAgainst(spark, table,
      docs.filter(col("doc_id") % 2 =!= 0), 0.5)
  }

  /** GROWING-index dedup e2e (VERDICT r7 #4, batch loop of the
    * streaming shape): base index over doc_id%4==0, then three
    * "crawl batches" (doc_id%4==1,2,3) each flagged against base +
    * previously ADMITTED survivors and admitted in turn via
    * [[graft.dedup.DedupIndex.flagAndAdmit]]. Output = every flag
    * decision with its batch: a batch-k doc can be a dup of a batch-j
    * admitted doc (j<k) or of a smaller-id doc in its own batch —
    * both paths oracle-replayed by unrolling the 3-batch admission
    * recursion in SQL (the unrolled-oracle contract, as CC/KMeans). */
  def qDedupGrow(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_dedup_grow"
    graft.dedup.DedupIndex.write(
      docs.filter(col("doc_id") % 4 === 0), table, buckets = 8)
    graft.api.Materialize.withTempRoot("graft_q_dedup_grow") { root =>
      val (grow, sink) = (s"$root/ext", s"$root/sink")
      (1 to 3).foreach { k =>
        graft.dedup.DedupIndex.flagAndAdmit(spark, table, grow,
          docs.filter(col("doc_id") % 4 === k), k - 1L, sink, 0.5)
      }
      spark.read
        .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
        .parquet(sink)
        .select(col("doc_id"), col("dup_of"), col("common"), col("na"),
          col("nb"), col("batch_id"))
    }
  }

  /** Right-to-be-forgotten over the growing dedup index
    * ([[graft.dedup.DedupIndex.forget]]): base (%4==0) + batch 1
    * (%4==1) admitted, then every INDEXED doc with doc_id%5==0 is
    * FORGOTTEN (tombstone batch — no index rewrite), then batch 2
    * (%4==2) flags — its pairs must not cite a forgotten witness.
    * The tombstone set is derived from docs actually IN the index —
    * base ∪ batch-1 admitted survivors, the latter read back from the
    * batch's own sv extent partition (ADVICE r10 #2: the earlier
    * raw-docs filter also tombstoned batch-1 docs that were flagged
    * and never admitted, breaching forget()'s caller contract; benign
    * for this id partition but now honored, and enforced by
    * flagAndAdmit's tombstone∩batch guard).
    * Oracle: the 2-batch grow recursion with batch 2's verified pairs
    * anti-filtered on the tombstone set, mirroring the pairs-side
    * anti-join (O(pairs), never O(index)). */
  def qDedupForget(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_dedup_forget"
    graft.dedup.DedupIndex.write(
      docs.filter(col("doc_id") % 4 === 0), table, buckets = 8)
    graft.api.Materialize.withTempRoot("graft_q_dedup_forget") { root =>
      val (grow, sink) = (s"$root/ext", s"$root/sink")
      graft.dedup.DedupIndex.flagAndAdmit(spark, table, grow,
        docs.filter(col("doc_id") % 4 === 1), 0L, sink, 0.5)
      val admitted = spark.read
        .schema("doc_id LONG, sv ARRAY<LONG>")
        .parquet(s"${graft.dedup.DedupIndex.extentSvPath(grow)}/batch_id=0")
        .select(col("doc_id"))
      graft.dedup.DedupIndex.forget(spark, grow,
        docs.filter(col("doc_id") % 4 === 0).select(col("doc_id"))
          .unionByName(admitted)
          .filter(col("doc_id") % 5 === 0), 100L)
      graft.dedup.DedupIndex.flagAndAdmit(spark, table, grow,
        docs.filter(col("doc_id") % 4 === 2), 1L, sink, 0.5)
      spark.read
        .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
        .parquet(sink)
        .select(col("doc_id"), col("dup_of"), col("common"), col("na"),
          col("nb"), col("batch_id"))
    }
  }

  /** LSM compaction of the growing dedup index, e2e (VERDICT r9 #4):
    * base = doc_id%4==0, admit batches %4==1 and %4==2 as extents,
    * [[graft.dedup.DedupIndex.compact]] folds them into the bucketed
    * base (recomputing the hot-bucket sidecar over the WHOLE compacted
    * index), then batch %4==3 flags against the compacted base alone.
    * Not the q_dedup_grow oracle verbatim: compaction legitimately
    * changes the hot-guard's scope (pre-compact it covers base
    * buckets only, post-compact the admitted extents' buckets
    * re-enter the guard — DedupIndex.scala compaction contract), so
    * the oracle unrolls batches 1-2 with the %4==0-scoped guard and
    * batch 3 with the recomputed whole-index guard. */
  def qDedupCompact(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_dedup_compact"
    graft.dedup.DedupIndex.write(
      docs.filter(col("doc_id") % 4 === 0), table, buckets = 8)
    graft.api.Materialize.withTempRoot("graft_q_dedup_compact") { root =>
      val (grow, sink) = (s"$root/ext", s"$root/sink")
      (1 to 2).foreach { k =>
        graft.dedup.DedupIndex.flagAndAdmit(spark, table, grow,
          docs.filter(col("doc_id") % 4 === k), k - 1L, sink, 0.5)
      }
      graft.dedup.DedupIndex.compact(spark, table, grow, buckets = 8)
      graft.dedup.DedupIndex.flagAndAdmit(spark, table, grow,
        docs.filter(col("doc_id") % 4 === 3), 2L, sink, 0.5)
      spark.read
        .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
        .parquet(sink)
        .select(col("doc_id"), col("dup_of"), col("common"), col("na"),
          col("nb"), col("batch_id"))
    }
  }

  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))

  /** Banded-fingerprint Hamming pairs (Manku-style multi-index
    * SimHash dedup): set-exact within radius 3, so the oracle can
    * brute-force all pairs at gate scale. materialize=true so the
    * persisted fingerprint frame is released once the result is
    * collected — cached frames must not accumulate across the
    * 113-query verify/bench run (ADVICE r7 #2). */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashHammingPairs(t(spark, dir, "documents"), 3, materialize = true)

  /** Sorted-neighborhood (SNM) near-dup pairs: lang-blocked sort by
    * token-sorted text, window 4, exact-Jaccard-verified at 0.8. */
  def qDedupSnm(spark: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(t(spark, dir, "documents"),
      window = 4, threshold = 0.8, materialize = true)

  /** Multi-pass SNM: token-sorted + reversed keys, candidates
    * unioned, one shared verify — the recall remedy for single-key
    * SNM, declared so the gate pins the union machinery. Honest
    * empirical note: on THIS corpus the second key finds the same 6
    * pairs (measured r8, as did a drop-first-token key and a length
    * key — the other 19 true pairs are not sort-adjacent under any
    * tried key), so the value demonstrated here is the semantics,
    * not added recall; on real corpora key diversity is the recall
    * lever. */
  def qDedupSnmMulti(spark: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodMultiPass(t(spark, dir, "documents"),
      Seq(Dedup.snmKeyTokenSorted, Dedup.snmKeyTokenReversed),
      window = 4, threshold = 0.8, materialize = true)

  // ---- text analysis -------------------------------------------------

  /** Canonical text normalization ([[TextFunctions.normalizeText]]):
    * NFC composition + control-char strip + whitespace collapse over
    * a deliberately dirtied corpus (the testdata text is clean ASCII,
    * so the query injects the cases that matter deterministically by
    * id band: a COMBINING-ACUTE sequence that NFC must compose, the
    * precomposed equivalent with a doubled space, and C0/DEL control
    * characters). Output carries the normalized string itself plus
    * before/after codepoint counts — the oracle hash-compares the
    * actual normalized bytes, so the two engines' NFC tables and
    * regex semantics are pinned against each other. */
  def qNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val m = col("doc_id") % 4
    // explicit escapes, not literal chars: source tooling must never
    // be able to silently NFC-normalize the fixture itself
    val dirty = when(m === 0, concat(lit("e\u0301 "), col("text")))
      .when(m === 1, concat(lit("\u00e9  "), col("text")))
      .when(m === 2, concat(lit("\t"), col("text"), lit("\u000b\u007f")))
      .otherwise(col("text"))
    docs.select(col("doc_id"),
        length(dirty).cast("long").as("raw_chars"),
        TextFunctions.normalizeText(dirty).as("norm"))
      .withColumn("norm_chars", length(col("norm")).cast("long"))
  }

  /** Deterministic HTML fixture for the crawl-front-end extraction
    * queries (the qNormalize discipline: testdata text is clean
    * prose, so the query synthesizes the markup that matters, by id
    * band, IDENTICALLY in both engines): full page with head/style/
    * nav/footer chrome (m=0), script-with-code + noscript (m=1 — the
    * script body contains a bare '<', the classic stripper trap),
    * list markup with indentation newlines + comment + aside (m=2),
    * entities + <br> (m=3), and markup-free prose (m=4, the
    * idempotence band: extraction must be the identity up to
    * whitespace). */
  private[graft] def htmlize(docId: Column, text: Column): Column = {
    val idStr = docId.cast("string")
    def rep(c: Column, f: String, t: String) =
      call_function("replace", c, lit(f), lit(t))
    when(docId % 5 === 0, concat(
        lit("<!DOCTYPE html><html><head><title>Doc "), idStr,
        lit("</title><style type=\"text/css\">p { color: #333; margin: 0; }</style></head>" +
          "<body><nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav><h1>Doc "),
        idStr, lit("</h1><p>"), rep(text, ". ", ".</p><p>"),
        lit("</p><footer>&copy; 2026 corp</footer></body></html>")))
      .when(docId % 5 === 1, concat(
        lit("<div class=\"main\">"), rep(text, " and ", " &amp; "),
        lit(" <a href=\"/more\">read more here</a></div>" +
          "<script type=\"text/javascript\">var n = 1; while (n < 9) { n = n + 1; }</script>" +
          "<noscript>enable js</noscript>")))
      .when(docId % 5 === 2, concat(
        lit("<ul>\n  <li>"), rep(text, " the ", "</li>\n  <li>"),
        lit("</li>\n</ul>\n<!-- render: ok --><aside>related links</aside>")))
      .when(docId % 5 === 3, concat(
        lit("<p>"), rep(text, ", ", ",&nbsp;"),
        lit("<br/>fine print&#39;s &quot;terms&quot; &lt;here&gt;</p>")))
      .otherwise(text)
  }

  /** SQL twin of [[htmlize]] — byte-for-byte the same synthesis. */
  private def sqlHtmlize(idExpr: String, textExpr: String): String = {
    val id = s"CAST($idExpr AS VARCHAR)"
    s"""(CASE CAST($idExpr % 5 AS INT)
      WHEN 0 THEN '<!DOCTYPE html><html><head><title>Doc ' || $id
        || '</title><style type="text/css">p { color: #333; margin: 0; }</style></head><body><nav><a href="/">home</a> <a href="/about">about</a></nav><h1>Doc '
        || $id || '</h1><p>' || replace($textExpr, '. ', '.</p><p>')
        || '</p><footer>&copy; 2026 corp</footer></body></html>'
      WHEN 1 THEN '<div class="main">' || replace($textExpr, ' and ', ' &amp; ')
        || ' <a href="/more">read more here</a></div><script type="text/javascript">var n = 1; while (n < 9) { n = n + 1; }</script><noscript>enable js</noscript>'
      WHEN 2 THEN '<ul>' || chr(10) || '  <li>'
        || replace($textExpr, ' the ', '</li>' || chr(10) || '  <li>')
        || '</li>' || chr(10) || '</ul>' || chr(10)
        || '<!-- render: ok --><aside>related links</aside>'
      WHEN 3 THEN '<p>' || replace($textExpr, ', ', ',&nbsp;')
        || '<br/>fine print&#39;s &quot;terms&quot; &lt;here&gt;</p>'
      ELSE $textExpr END)"""
  }

  /** Crawl-front-end text extraction over the synthesized-markup
    * corpus ([[graft.text.HtmlExtract]]): emits the cleaned prose
    * ITSELF (the oracle hash-compares the string, pinning both
    * engines' regex semantics against each other — the qNormalize
    * discipline) plus the boilerplate-ppm and paragraph-count
    * signals. Stateless narrow projection: no shuffle, no UDF,
    * whole-stage codegen end to end; at 100 TB this is a pure
    * map-side pass that fuses into the scan. */
  def qHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.HtmlExtract
    val docs = t(spark, dir, "documents")
    val raw = htmlize(col("doc_id"), col("text"))
    docs.select(col("doc_id"), raw.as("raw"))
      .withColumn("clean_text", HtmlExtract.cleanText(col("raw")))
      .select(col("doc_id"), col("clean_text"),
        HtmlExtract.boilerplatePpm(col("raw"), col("clean_text"))
          .as("boilerplate_ppm"),
        HtmlExtract.nParas(col("clean_text")).as("n_paras"))
  }

  /** The extracted text fed straight into the existing quality
    * filter (stage zero feeding stage one — composition, not
    * restatement): paragraphs flatten to one line (the quality
    * rule's tokenizer splits on single spaces), the shared
    * [[TextFunctions.qualityOk]] predicate gates, and the output
    * carries the signals a curation run would keep. */
  def qHtmlQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.HtmlExtract
    // §2.5 spread before the htmlize+extract regex chain (r18)
    val docs = graft.api.Spread.forCompute(t(spark, dir, "documents"))
    val raw = htmlize(col("doc_id"), col("text"))
    val flat = call_function("replace",
      HtmlExtract.cleanText(raw), lit("\n"), lit(" "))
    docs.select(col("doc_id"), raw.as("raw"), flat.as("flat"))
      .filter(TextFunctions.qualityOk(col("flat")))
      .select(col("doc_id"),
        nTokens(col("flat")).cast("long").as("n_tokens"),
        HtmlExtract.boilerplatePpm(col("raw"), col("flat"))
          .as("boilerplate_ppm"),
        HtmlExtract.linkDensityPpm(col("raw"), col("flat"))
          .as("link_density_ppm"))
  }

  /** WARC record framing + the full wire-to-clean-text chain (r14,
    * stage MINUS-ONE of curation): each doc is wrapped as a real
    * WARC/1.0 response record around its htmlized payload (four
    * header-layout variants by id band — [[graft.text.Warc]]), then
    * the parser under test extracts the URI header and slices the
    * body by DECLARED Content-Length (the only valid WARC framing),
    * and the recovered body flows through the r13 HTML extraction to
    * clean text. Per-variant: record count, framed-length mass,
    * body_ok conformance count, and fingerprint sums over both the
    * URIs and the END-OF-CHAIN cleaned text — a wrong header regex,
    * a one-off in the body slice, or an extraction drift all break
    * the hash. */
  def qWarcExtract(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Warc
    val rec = Warc.warcify(col("doc_id"), htmlize(col("doc_id"), col("text")))
    t(spark, dir, "documents")
      .select((col("doc_id") % 4).as("variant"), rec.as("rec"))
      .select(col("variant"),
        Warc.contentLength(col("rec")).as("clen"),
        when(Warc.bodyOk(col("rec")), 1L).otherwise(0L).as("ok"),
        fingerprint(Warc.targetUri(col("rec"))).as("fp_uri"),
        fingerprint(graft.text.HtmlExtract.cleanText(Warc.bodyOf(col("rec"))))
          .as("fp_clean"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("clen")).as("total_octets"),
        sum(col("ok")).as("n_body_ok"),
        sum(col("fp_uri")).as("fp_uri_sum"),
        sum(col("fp_clean")).as("fp_clean_sum"))
  }

  /** HTTP response-envelope strip between WARC body and HTML (r15,
    * VERDICT r14 missing #1): real `response` bodies are full HTTP
    * messages, so each doc's payload is wrapped in an HTTP envelope
    * (three variants by id band — 200-with-charset, 404-without-
    * Content-Length, and NO envelope) before the WARC framing, and
    * the chain under test is bodyOf → httpStatus/ContentType/Charset
    * columns → httpPayload → HTML extraction. The envelope-less band
    * pins the pass-through contract: null status/content-type, the
    * body reaching the extractor unchanged. fp_clean is
    * variant-independent by construction (every band wraps the SAME
    * page), so a band leaking envelope text into the extractor
    * breaks its own hash against the others' oracle rows. All
    * per-row codegen'd projections fused into the scan. */
  def qHttpExtract(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Warc
    val rec = Warc.warcify(col("doc_id"),
      Warc.httpWrap(col("doc_id"), htmlize(col("doc_id"), col("text"))))
    t(spark, dir, "documents")
      .select((col("doc_id") % 3).as("variant"), rec.as("rec"))
      .select(col("variant"), Warc.bodyOf(col("rec")).as("body"))
      .select(col("variant"),
        Warc.httpStatus(col("body")).as("status"),
        Warc.httpContentType(col("body")).as("ct"),
        Warc.httpCharset(col("body")).as("cs"),
        fingerprint(graft.text.HtmlExtract.cleanText(
          Warc.httpPayload(col("body")))).as("fp_clean"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_records"),
        count(col("status")).as("n_with_status"),
        coalesce(sum(col("status")), lit(0L)).as("status_sum"),
        count(when(col("ct") === "text/html", 1)).as("n_html"),
        count(col("cs")).as("n_charset"),
        sum(col("fp_clean")).as("fp_clean_sum"))
  }

  /** Wire-side end-to-end (r15): the crawl FRONT half as one query,
    * complementing q_pipeline_e2e's curation back half — WARC record
    * → HTTP envelope strip with a REAL status gate (404s drop;
    * envelope-less `resource`-style records pass, the curation
    * default for legacy crawls) → HTML extraction → the shared
    * quality conjunction over the flattened clean text → exact dedup
    * on the EXTRACTED text (duplicate raw pages stay duplicates
    * after extraction) → surviving token mass. Emitted as the stage
    * funnel (pos, stage, n) like q_pipeline_e2e, so any stage's
    * wrong drop shows as its own row. */
  def qWireE2e(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{HtmlExtract, Warc}
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    // every 25th page is RE-CRAWLED under a fresh record id (what a
    // real crawl does) — the page content keys on page_id, so the
    // re-crawl's clean text is byte-identical to the original's and
    // the dedup stage is load-bearing at EVERY SF (the corpus's own
    // dup texts never share an htmlize band at the gate SFs)
    // spread before the synthesis+parse chain (guide §2.5): the
    // localCheckpoint barriers below inherit the scan's partitioning,
    // and a few-file input would run the whole htmlize/warcify/parse/
    // extract chain on that handful of tasks (r18)
    val corpus = graft.api.Spread.forCompute(docs
      .select(col("doc_id"), col("doc_id").as("page_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          col("doc_id").as("page_id"), col("text"))))
    // the synthesis and parse run as SEPARATE materialized stages
    // (eager localCheckpoint barriers): fused into one projection,
    // the htmlize+httpWrap+warcify+parse expression stack generates
    // an ~18k-line codegen class that Janino refuses, and the whole
    // stage — including the regex-heavy extraction — silently drops
    // to interpreted mode at ~20× the cost (measured r15: 35 s → 2 s
    // at sf0.1). A FIXTURE-ONLY concern: deployments read records
    // from the source (q_warcgz_extract's path), where parse+extract
    // alone codegens fine.
    val pages = corpus.select(col("doc_id"),
        htmlize(col("page_id"), col("text")).as("page"))
      .localCheckpoint(true)
    val recs = pages.select(col("doc_id"),
        Warc.warcify(col("doc_id"),
          Warc.httpWrap(col("doc_id"), col("page"))).as("rec"))
      .localCheckpoint(true)
    val kept = recs
      .select(col("doc_id"), Warc.bodyOf(col("rec")).as("body"))
      .select(col("doc_id"), Warc.httpStatus(col("body")).as("status"),
        Warc.httpPayload(col("body")).as("payload"))
      .filter(col("status") === 200 || col("status").isNull)
      .localCheckpoint(true)
    val clean = kept.select(col("doc_id"),
        HtmlExtract.cleanText(col("payload")).as("clean"))
      .withColumn("flat",
        call_function("replace", col("clean"), lit("\n"), lit(" ")))
    // dedup BEFORE the quality gate (the fetch-side order: identical
    // pages are identical before anyone scores them — and at the gate
    // SFs the corpus's dup texts are short ones quality would drop,
    // so the reverse order would leave this stage provably inert).
    // The window keys on the FINGERPRINT, not the text (VERDICT r15
    // wrong #2): partitioning/sorting full document strings is the
    // scale anti-idiom; a fixed-width 64-bit key shuffles instead
    // (collision odds negligible, and the oracle's text-keyed twin
    // would catch one at the gate as a count mismatch). length(clean)
    // rides as a second key term (ADVICE r16): a 64-bit collision now
    // also needs an exact length tie — near-zero cost, the key stays
    // fixed-width
    val keepW = Window.partitionBy(xxhash64(col("clean")), length(col("clean")))
      .orderBy(col("doc_id"))
    val deduped = clean.withColumn("rn", row_number().over(keepW))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint(true)
    val ok = deduped.filter(TextFunctions.qualityOk(col("flat")))
      .localCheckpoint(true)
    val tokens = ok
      .agg(coalesce(sum(TextFunctions.nTokens(col("flat")).cast("long")),
        lit(0L)))
      .head().getLong(0)
    import spark.implicits._
    Seq(
      (1, "wire_records", recs.count()),
      (2, "http_keep", kept.count()),
      (3, "dedup_keep", deduped.count()),
      (4, "quality_ok", ok.count()),
      (5, "tokens", tokens))
      .toDF("pos", "stage", "n")
  }

  /** The `.warc.gz` source end-to-end (r15, promoting the streaming
    * source to a declared query): write the fixture corpus as REAL
    * crawl segment files — HTTP-wrapped, WARC-framed response records
    * INTERLEAVED with their request twins (the CommonCrawl raw-segment
    * layout), one gzip member per record, hash-partitioned across 4
    * segment files — then read them back through
    * [[graft.text.Warc.readWarcGz]] (binaryFiles + the streaming
    * member walker), SELECT responses by WARC-Type, and run the full
    * envelope→payload→clean-text chain, grouped by HTTP status. The
    * oracle computes the same aggregate straight from the documents
    * table: only a byte-faithful gzip-member round trip (framing,
    * CRC/ISIZE, charset decode) reproduces the fingerprint sums.
    * Aggregates are order-independent, so segment-internal record
    * order (a partition-iteration detail) cannot affect the result.
    * Temp-root lifecycle and plan-audit stash via withTempRoot, like
    * every lifecycle fixture. */
  def qWarcgzExtract(spark: SparkSession, dir: String): DataFrame =
    graft.api.Materialize.withTempRoot("warcgz") { root =>
      import graft.text.Warc
      val rec = Warc.warcify(col("doc_id"),
        Warc.httpWrap(col("doc_id"), htmlize(col("doc_id"), col("text"))))
      // real segments interleave request records with responses (r15):
      // each doc writes its request twin too, and the read side must
      // SELECT responses by WARC-Type — if the type parse or filter
      // were wrong, every group's n_records doubles and the oracle
      // (which counts responses only) hash-mismatches
      val req = Warc.requestify(col("doc_id"), Warc.fixtureUri(col("doc_id")))
      Warc.writeSegmentFiles(
        t(spark, dir, "documents")
          .select(col("doc_id"), explode(array(req, rec)).as("rec"))
          .repartition(4, col("doc_id")),
        root)(_.getString(1).getBytes("UTF-8"))
      // spread the decoded records before the parse/extract chain
      // (guide §2.5): member decode parallelism is capped at the
      // segment-file count (4 here), and the regex-heavy extraction
      // is narrow, so without this it runs on those 4 tasks (r18)
      graft.api.Spread.forCompute(Warc.readWarcGz(spark, root))
        .filter(Warc.warcType(col("rec")) === "response")
        .select(Warc.bodyOf(col("rec")).as("body"),
          when(Warc.bodyOk(col("rec")), 1L).otherwise(0L).as("ok"),
          fingerprint(Warc.targetUri(col("rec"))).as("fp_uri"))
        .select(Warc.httpStatus(col("body")).as("status"),
          col("ok"), col("fp_uri"),
          fingerprint(graft.text.HtmlExtract.cleanText(
            Warc.httpPayload(col("body")))).as("fp_clean"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("ok")).as("n_body_ok"),
          sum(col("fp_uri")).as("fp_uri_sum"),
          sum(col("fp_clean")).as("fp_clean_sum"))
    }

  /** Encoded-wire HTTP payload decode (r16, VERDICT r15 missing #1 —
    * the first thing real WARCs hit): the majority of real crawl
    * response payloads arrive `Content-Encoding: gzip` (older
    * captures also carry `Transfer-Encoding: chunked` framing), so
    * the fixture writes REAL segment files whose payloads are
    * per-band wire-encoded BYTES — identity / gzip / deflate(zlib) /
    * chunked / chunked-over-gzip / zstd
    * ([[graft.text.Warc.encodeHttpBand]];
    * string-domain synthesis cannot express gzip, so the encode
    * happens where the bytes live: the segment writer) — then reads
    * them back through the streaming source, whose decode layer
    * de-chunks and inflates before charset decode
    * ([[graft.text.Warc.decodeRecord]]). Grouped by the RECOVERED
    * wire-form headers (Content-Encoding × chunked); the oracle
    * computes the same groups straight from the documents table
    * (the wire encodings are transparent by construction): only a
    * byte-faithful de-chunk + inflate + Content-Length rewrite
    * reproduces the fingerprints AND passes body_ok. */
  def qHttpEncoded(spark: SparkSession, dir: String): DataFrame =
    graft.api.Materialize.withTempRoot("httpenc") { root =>
      import graft.text.Warc
      Warc.writeSegmentFiles(
        t(spark, dir, "documents")
          .select(col("doc_id"), htmlize(col("doc_id"), col("text")).as("page"))
          .repartition(4, col("doc_id")),
        root) { r =>
        val id = r.getLong(0)
        Warc.warcifyBytes(id,
          Warc.encodeHttpBand(id, r.getString(1).getBytes("UTF-8")))
      }
      // same §2.5 spread as q_warcgz_extract's read side (r18)
      graft.api.Spread.forCompute(Warc.readWarcGz(spark, root))
        .select(Warc.bodyOf(col("rec")).as("body"),
          when(Warc.bodyOk(col("rec")), 1L).otherwise(0L).as("ok"))
        .select(
          coalesce(Warc.httpContentEncoding(col("body")), lit("identity"))
            .as("encoding"),
          Warc.httpChunked(col("body")).as("chunked"),
          when(Warc.httpStatus(col("body")) === 200, 1L).otherwise(0L)
            .as("is200"),
          col("ok"),
          fingerprint(graft.text.HtmlExtract.cleanText(
            Warc.httpPayload(col("body")))).as("fp_clean"))
        .groupBy(col("encoding"), col("chunked"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("ok")).as("n_body_ok"),
          sum(col("is200")).as("n_200"),
          sum(col("fp_clean")).as("fp_clean_sum"))
    }

  /** Meta-charset sniffing (r17, VERDICT r16 missing #2): the pinned
    * resolution chain `header > BOM > HTML5 meta prescan > UTF-8`
    * over REAL segment files whose payload bytes are per-band
    * charset-encoded ([[graft.text.Warc.charsetBand]] — header-utf8,
    * meta-latin1 with an ILLEGAL-UTF-8 byte, BOM over a lying meta,
    * header-LIES-meta-truth (the priority pin: the header wins and
    * the marker decodes as deterministic mojibake), undeclared
    * default, and UTF-16LE). Every band appends the same non-ASCII
    * marker, so the per-band clean-text fingerprints only reproduce
    * under the right chain leg — and every band's decode is
    * length-changing, so body_ok also pins the r17 Content-Length
    * rewrite on identity payloads. The oracle computes the expected
    * text straight from documents (charsets transparent), with band
    * 3's mojibake as the one-substitution replace the all-ASCII
    * corpus guarantees. */
  def qMetaCharset(spark: SparkSession, dir: String): DataFrame =
    graft.api.Materialize.withTempRoot("metacs") { root =>
      import graft.text.Warc
      Warc.writeSegmentFiles(
        t(spark, dir, "documents")
          .select(col("doc_id"), htmlize(col("doc_id"), col("text")).as("page"))
          .repartition(4, col("doc_id")),
        root) { r =>
        val id = r.getLong(0)
        Warc.warcifyBytes(id, Warc.charsetBand(id, r.getString(1)))
      }
      // same §2.5 spread as q_warcgz_extract's read side (r18)
      graft.api.Spread.forCompute(Warc.readWarcGz(spark, root))
        .select(Warc.targetUri(col("rec")).as("uri"),
          when(Warc.bodyOk(col("rec")), 1L).otherwise(0L).as("ok"),
          fingerprint(graft.text.HtmlExtract.cleanText(
            Warc.httpPayload(Warc.bodyOf(col("rec"))))).as("fp_clean"))
        .select(
          (regexp_extract(col("uri"), "/doc/([0-9]+)$", 1).cast("long") % 6)
            .as("band"),
          col("ok"), col("fp_clean"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("ok")).as("n_body_ok"),
          sum(col("fp_clean")).as("fp_clean_sum"))
    }

  /** URL canonicalization + registrable-domain extraction (r16,
    * VERDICT r15 missing #2): six messy-URL bands per doc
    * ([[graft.text.Url.urlize]] — case/www/fragment, https default
    * port + utm_* params, kept non-default port + duplicate slashes +
    * gclid, a two-level public suffix, deep subdomains, bare host) →
    * the pinned canonical form and the site key. The canonical URL
    * and site STRINGS are hash-compared per doc — any drifted step in
    * either engine breaks its row. One codegen'd projection, no
    * shuffle. */
  def qUrlCanon(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Url
    // staged form (Url.withCanonical): the one-Column composition is
    // a single interpreted Project (its HOF leg is CodegenFallback) —
    // measured ~17× slower per row; the staged chain keeps all but
    // one tiny projection inside codegen
    Url.withCanonical(
        t(spark, dir, "documents")
          .select(col("doc_id"), Url.urlize(col("doc_id")).as("u")),
        col("u"), "canon")
      .select(col("doc_id"), col("canon"),
        Url.hostOf(col("canon")).as("host"))
      .select(col("doc_id"), col("canon"),
        Url.registrableDomain(col("host")).as("site"))
  }

  /** URL-KEYED dedup (r16, the other half of VERDICT r16 item #3):
    * docs sharing a page spell its URL four messy ways
    * ([[graft.text.Url.urlizeDup]]); canonicalization folds them to
    * ONE key and the dedup keeps the first fetch per key — the
    * re-fetch collapse every crawl runs before content dedup ever
    * sees the bytes. One grouped agg on the (short-string) canonical
    * key. */
  def qUrlDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Url
    Url.withCanonical(
        t(spark, dir, "documents")
          .select(col("doc_id"), Url.urlizeDup(col("doc_id")).as("u")),
        col("u"), "canon")
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc"))
  }

  /** robots.txt exclusion filtering (r16): RFC 9309 Allow/Disallow
    * with `*` wildcards and the `$` end anchor applied per
    * registrable domain over the canonical URLs — longest-match wins,
    * Allow breaks ties, no-match and no-rules default allow
    * ([[graft.text.Robots]]). The fixture's pinned rule bands make
    * every semantic load-bearing: a longer-Allow override, a
    * wildcard carve-out under Disallow-/, an anchor that must NOT
    * match a query-bearing path, an anchor that blocks exactly the
    * root, and rule-less domains. Per (site, verdict): counts + the
    * canonical-URL fingerprint sum. Rules are domain-bounded — no
    * broadcast hint, AQE decides (the reputation-rollup rule). */
  def qRobotsFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Robots, Url}
    val urls = Url.withCanonical(
        t(spark, dir, "documents")
          .select(col("doc_id"), Url.urlize(col("doc_id")).as("u")),
        col("u"), "canon")
      .select(col("doc_id"), col("canon"), Url.hostOf(col("canon")).as("host"))
      .select(col("doc_id"), col("canon"),
        Url.registrableDomain(col("host")).as("site"),
        Robots.pathQueryOf(col("canon")).as("pathq"))
    Robots.filter(urls, Robots.fixtureRulesFrame(spark))
      .groupBy(col("site"), col("verdict"))
      .agg(count(lit(1)).as("n_urls"),
        sum(fingerprint(col("canon"))).as("fp_canon_sum"))
  }

  /** robots.txt GROUP depth (r17, VERDICT r16 missing #4): real
    * per-site robots.txt BODIES flow through the full RFC 9309 path
    * — group parsing (stacked user-agent lines, comments,
    * crawl-delay, global sitemap lines) and §2.2.1 group SELECTION
    * for the gate crawler's product token (longest case-insensitive
    * prefix wins, identical-token groups merge, `*` fallback,
    * no-match default allow) — then the selected rules drive the
    * same longest-match filter as q_robots_filter, with the
    * crawl-delay and sitemap count surfaced as per-site columns (the
    * politeness/discovery metadata a crawl scheduler keys on). The
    * fixture's `*` groups are BLOCK-ALL shadows: a selection bug
    * mass-disallows and breaks every count. */
  def qRobotsGroups(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Robots, Url}
    val urls = Url.withCanonical(
        t(spark, dir, "documents")
          .select(col("doc_id"), Url.urlize(col("doc_id")).as("u")),
        col("u"), "canon")
      .select(col("doc_id"), col("canon"), Url.hostOf(col("canon")).as("host"))
      .select(col("doc_id"), col("canon"),
        Url.registrableDomain(col("host")).as("site"),
        Robots.pathQueryOf(col("canon")).as("pathq"))
    val (rules, meta) = Robots.fixtureGroupFrames(spark)
    Robots.filter(urls, rules)
      .groupBy(col("site"), col("verdict"))
      .agg(count(lit(1)).as("n_urls"),
        sum(fingerprint(col("canon"))).as("fp_canon_sum"))
      .join(meta, Seq("site"), "left")
      .select(col("site"), col("verdict"), col("n_urls"),
        col("fp_canon_sum"), col("crawl_delay"), col("n_sitemaps"))
  }

  /** Domain reputation RE-KEYED on the registrable domain (r16, the
    * composed half of VERDICT r16 item #3): the rollup every real
    * curation stage runs — `www.x.example:8080/...` and
    * `a.b.x.example/...` fold into ONE site before quality/dup/PII
    * rates aggregate, so a template farm spread across subdomains
    * and ports can't dodge the verdict by key fragmentation. Same
    * one-grouped-agg plan as q_domain_rollup, key swapped to
    * urlize → canonicalize → host → registrable domain. */
  def qDomainCanon(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Url
    // each URL stage lands on its own select: Column trees duplicate
    // every sub-expression reference, so the fused
    // registrable(hostOf(canonicalize(urlize(id)))) stack multiplies
    // to millions of Catalyst nodes and OOMs the driver during
    // analysis (measured r16) — and the staged Url.withCanonical
    // additionally keeps all but the HOF leg inside codegen
    val keyed = Url.withCanonical(
        t(spark, dir, "documents")
          .select(Url.urlize(col("doc_id")).as("u"), col("text")),
        col("u"), "canon")
      .select(Url.hostOf(col("canon")).as("host"), col("text"))
      .select(Url.registrableDomain(col("host")).as("source"), col("text"))
    graft.pipeline.DomainReputation.rollup(keyed)
  }

  /** Registrable domain from a SUFFIX-RULE TABLE (r17, VERDICT r16
    * missing #3): full PSL rule semantics — normal, wildcard `*.`,
    * exception `!` — resolved as data ([[graft.text.Url
    * .withRegistrableDomain]]), so a deployment swaps the real
    * Public Suffix List in without code change. Six host bands make
    * every rule kind and the pass-through load-bearing; (host, site)
    * STRINGS hash-compared per doc. The fold runs over distinct
    * hosts joined to the dimension-sized rules frame (AQE
    * broadcasts, no hint) and maps back with one keyed join. */
  def qPslDomain(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Url
    val hosts = t(spark, dir, "documents")
      .select(col("doc_id"), Url.hostize(col("doc_id")).as("host"))
    Url.withRegistrableDomain(hosts, col("host"), "site",
        Url.fixtureSuffixRulesFrame(spark))
      .select(col("doc_id"), col("host"), col("site"))
  }

  /** The extracted-and-resolved link frame shared by the link-graph
    * queries (r17, VERDICT r16 missing #1): per (page, live anchor),
    * the canonical target URL plus both ends' registrable domains.
    * One explode (linear in the corpus' link mass) over stateless
    * per-row projections; the canonical chains are the staged
    * [[graft.text.Url.withCanonical]] (the codegen-cliff lesson) run
    * once for the page and once per target. */
  private[graft] def linkFrame(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Links, Url}
    // §2.5 spread before the staged regex chains (r18): this whole
    // frame — linkify, href explode, resolution, two canonical chains
    // — is narrow and ends in the eager checkpoint, so a few-file
    // input would run all of it on the scan's task count
    val pages = Url.withCanonical(
        graft.api.Spread.forCompute(t(spark, dir, "documents"))
          .select(col("doc_id"), Url.urlize(col("doc_id")).as("u"),
            Links.linkify(col("doc_id")).as("raw")),
        col("u"), "page")
      .select(col("doc_id"), col("page"), col("u"),
        explode(Links.extractHrefs(col("raw"))).as("href"))
    val resolved = Links.withResolved(pages, col("page"), col("u"),
        col("href"), "abs")
      .filter(col("abs").isNotNull)
    // each derivation stage lands on its OWN select (the r16 lesson:
    // a fused registrable∘hostOf∘canonical stack re-expands to
    // millions of Catalyst nodes and OOMs analysis — measured again
    // r17 on this very frame), and the RESULT is materialized
    // (eager localCheckpoint): a downstream filter like
    // `dst_site =!= src_site` would otherwise be PUSHED DOWN through
    // the staged projects, re-substituting both canonical chains
    // into one predicate tree — the same OOM through the
    // filter-pushdown door (measured r17: stage-by-stage counts all
    // pass, the filtered consumer OOMs). A real pipeline persists
    // its link frame at exactly this point anyway — it is the
    // multiply-consumed corpus artifact.
    Url.withCanonical(resolved, col("abs"), "target")
      .select(col("doc_id"), col("page"), col("target"))
      .select(col("doc_id"), Url.hostOf(col("page")).as("src_host"),
        col("target"), Url.hostOf(col("target")).as("dst_host"))
      .select(col("doc_id"),
        Url.registrableDomain(col("src_host")).as("src_site"),
        col("target"),
        Url.registrableDomain(col("dst_host")).as("dst_site"))
      .localCheckpoint(true)
  }

  /** HTML link extraction + resolution (r17): anchors are read from
    * the LIVE body (chrome/script anchors excluded), hrefs resolve
    * per the pinned RFC 3986 subset against the canonical page URL,
    * and targets canonicalize into the r16 URL key space. Per target
    * site: link count, distinct linking pages, a fingerprint sum and
    * the min canonical target (the string pin). Every fixture band's
    * semantic is load-bearing — a chrome leak, a wrong dot-segment
    * fold, an unstripped tracking param, or a mis-keyed two-level
    * suffix each lands in a different output row. */
  def qLinkExtract(spark: SparkSession, dir: String): DataFrame =
    linkFrame(spark, dir)
      .groupBy(col("dst_site"))
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("doc_id")).as("n_pages"),
        sum(fingerprint(col("target"))).as("fp_target_sum"),
        min(col("target")).as("min_target"))

  /** Domain-authority PageRank over the extracted web-link graph
    * (r17): the registrable-domain edge list (self-site navigation
    * excluded — intra-site links are not an authority signal), run
    * through the EXISTING bulk-iteration PageRank (the q_pagerank
    * machinery, 3 supersteps, 1e-12-quantized — the oracle unrolls
    * the same arithmetic). Multi-edges are kept: each live anchor is
    * one endorsement, the same contract as q_pagerank's per-lineitem
    * edges. The self-loop filter and the iteration joins run over
    * [[linkFrame]]'s MATERIALIZED output (see its scaladoc — the
    * alias-re-expansion OOM guards). */
  def qLinkRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = linkFrame(spark, dir)
      .filter(col("dst_site") =!= col("src_site"))
      .select(col("src_site").as("src"), col("dst_site").as("dst"))
    graft.graph.Algorithms.pageRank(edges, iterations = 3)
      .orderBy(col("rank").desc, col("id")).limit(20)
  }

  /** Link-degree stats joined into domain reputation (r17): per
    * registrable domain, cross-site out/in degree from the extracted
    * graph alongside the reputation rollup's verdict — the combined
    * frame a curation run keys crawl-frontier and filter decisions
    * by (a high-in-degree domain with a bad reputation is the spam
    * -farm signature). Left joins keep rollup domains with no
    * cross-site links (degree 0). */
  def qLinkDegree(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Url
    val edges = linkFrame(spark, dir)
      .filter(col("dst_site") =!= col("src_site"))
      .select(col("src_site"), col("dst_site"))
    val outDeg = edges.groupBy(col("src_site"))
      .agg(count(lit(1)).as("out_links"))
    val inDeg = edges.groupBy(col("dst_site"))
      .agg(count(lit(1)).as("in_links"))
    // §2.5 spread before the canonical/reputation chain (r18, same
    // reasoning as linkFrame)
    val keyed = Url.withCanonical(
        graft.api.Spread.forCompute(t(spark, dir, "documents"))
          .select(Url.urlize(col("doc_id")).as("u"), col("text")),
        col("u"), "canon")
      .select(Url.hostOf(col("canon")).as("host"), col("text"))
      .select(Url.registrableDomain(col("host")).as("source"), col("text"))
    val rep = graft.pipeline.DomainReputation.rollup(keyed)
      .localCheckpoint(true)
    rep
      .join(outDeg, rep("source") === outDeg("src_site"), "left")
      .join(inDeg, rep("source") === inDeg("dst_site"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("out_links"), lit(0L)).as("out_links"),
        coalesce(col("in_links"), lit(0L)).as("in_links"),
        col("reputation"))
  }

  /** The link-frame CTE chain shared by the link-graph oracles
    * (lazy: referenced by oracleSql's initializer): fixture →
    * page canonicalization → href unnest → resolution steps →
    * target canonicalization, ending at
    * `lf(doc_id, src_site, target, dst_site)`. Each step chain runs
    * in its OWN CTE — [[graft.text.Url.sqlCanonSteps]] is used twice
    * (page + target) and its lateral aliases would collide in one
    * SELECT list — and every CTE is MATERIALIZED: without the fence
    * DuckDB's projection flattening re-substitutes one chain's
    * lateral-alias expansions into the NEXT chain's references and
    * the stacked chains blow past 100 GB during optimization
    * (measured r17 — the oracle-side twin of the Catalyst
    * alias-re-expansion lesson; with fences each query binds in a
    * flat ~16–35 s, the same band as the existing URL-family
    * oracles). */
  private lazy val sqlLinkCtes: String = {
    import graft.text.{Links, Url}
    s"""lf0 AS MATERIALIZED (SELECT doc_id, ${Links.sqlLinkify("doc_id")} AS raw,
           ${Url.sqlCanonSteps(Url.sqlUrlize("doc_id"))}
         FROM documents),
       lf1 AS MATERIALIZED (SELECT doc_id, uc_canon AS page,
           uc_u AS rawu, uc_site AS src_site,
           unnest(${Links.sqlExtractHrefs("raw")}) AS href
         FROM lf0),
       lf2 AS MATERIALIZED (SELECT doc_id, src_site,
           ${Links.sqlResolveSteps("page", "rawu", "href")}
         FROM lf1),
       lf3 AS MATERIALIZED (SELECT doc_id, src_site, ${Url.sqlCanonSteps("lr_abs")}
         FROM lf2 WHERE lr_abs IS NOT NULL),
       lf AS MATERIALIZED (SELECT doc_id, src_site, uc_canon AS target,
           uc_site AS dst_site
         FROM lf3)"""
  }

  /** The JPEG gate oracle, shared by the baseline and progressive
    * legs (they differ in WIRE FORM only — the decoded raster is the
    * same flat-block closed form): block b's 64 pixels all equal
    * text byte b mod len; gray replicates to rgb. Per block at
    * (bx,by) with w = 8·wb, the sum of the rgb (i+1) weights is
    * 9·q+6 per pixel q=y·w+x, and Σq over the block is
    * 512·w·by + 224·w + 512·bx + 224 — so a wrong block placement
    * (restart resync, DC prediction, MCU/scan order) or a wrong
    * decoded value (dequant, IDCT, level shift, successive-
    * approximation fold) breaks the weighted sum. */
  private def sqlJpegRasterOracle(format: String): String =
    s"""WITH m AS (
         SELECT doc_id, text, strlen(text) AS len,
           1 + strlen(text) % 7 AS wb,
           1 + (strlen(text) * 31) % 6 AS hb
         FROM documents),
       x AS (
         SELECT doc_id,
           ascii(substr(text, CAST(b % len + 1 AS INT), 1)) AS v,
           b // wb AS by, b % wb AS bx, wb * 8 AS w
         FROM m, unnest(range(0, wb * hb)) AS t(b)
         WHERE len > 0),
       d AS (
         SELECT doc_id, SUM(192 * v) AS px_sum,
           SUM(v * (9 * (512 * w * by + 224 * w + 512 * bx + 224) + 384))
             AS px_wsum
         FROM x GROUP BY doc_id)
       SELECT '$format' AS format, COUNT(1) AS n_media,
         CAST(SUM(COALESCE(d.px_sum, 0)) AS BIGINT) AS sum_px,
         CAST(SUM(COALESCE(d.px_wsum, 0)) AS BIGINT) AS wsum_px
       FROM m LEFT JOIN d ON m.doc_id = d.doc_id"""

  /** Progressive-JPEG decode (r15): the SAME flat-block raster as
    * q_jpeg_decode in the three-scan SOF2 wire form — DC first with
    * point transform, DC refinement bits, and an all-EOBRUN AC band
    * scan. The oracle is the identical closed form: only a decoder
    * that carries coefficients across scans and folds the successive
    * approximation reproduces it. The REAL refinement scans (AC
    * correction walk over ImageIO-written files) are spec-pinned in
    * JpegSpec, the gate pins the multi-scan machinery. */
  def qJpegProgressive(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelChecksums(
        Multimodal.asJpegProgressiveTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("px_sum")).as("sum_px"),
        sum(col("px_wsum")).as("wsum_px"))

  /** Banned 3-token phrases for [[qBlocklist]] — two that occur in
    * the fixture corpus, one that can occur at other SFs, one that
    * never matches (the empty-result leg). */
  val Blocklist: Seq[String] = Seq(
    "big order scan", "row column sort", "data a part",
    "graft never emits this")

  /** Blocklist phrase filter — "which documents contain a banned
    * phrase, and which one": the distinct word 3-grams each doc
    * already computes for dedup ([[TextFunctions.shingles]]) are
    * intersected with the broadcast phrase list; one narrow per-row
    * pass, output one row per (doc, matched phrase). The compliance
    * sibling of PII redaction: redact rewrites spans, this FLAGS
    * documents for removal or review. */
  def qBlocklist(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_intersect(TextFunctions.shingles(col("text")),
          array(Blocklist.map(lit): _*))).as("phrase"))

  def qLangId(spark: SparkSession, dir: String): DataFrame =
    // §2.5 spread before the per-row language scorer (r18)
    graft.api.Spread.forCompute(t(spark, dir, "documents"))
      .select(col("lang"), predictedLang(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  def qTextQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokens(col("text")).cast("long")).as("total_tokens"),
        exactAvg(meanWordLen(col("text")), 6).as("avg_word_len"),
        exactAvg(stopwordRatio(col("text")), 6).as("avg_stopword_ratio"))

  def qTokenStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(sum(nTokens(col("text")).cast("long")).as("n_ws_tokens"),
        sum(bpeTokenCount(col("text")).cast("long")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(((col("n_chars") + 3) / 4).cast("long")).as("est_bpe_tokens"))

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))

  /** Per-document quality FILTER (the keep/drop operator a training
    * pipeline actually runs; q_text_quality is the stats view): first
    * failing rule labels the doc. Every rule compares INTEGERS
    * (cross-multiplied thresholds) so the verdict is trivially
    * engine-exact. Output: verdict histogram per lang. The "ok"
    * verdict is by construction the conjunction
    * [[TextFunctions.qualityOk]] (shared thresholds), which is what
    * the pipeline composition (q_pipeline_e2e) filters with. */
  def qQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val nt = nTokens(col("text"))
    val wl = length(col("text")) - nt + lit(1) // total word chars
    val nStop = size(filter(tokens(col("text")), w => w.isin(Stopwords: _*)))
    val verdict = when(nt < TextFunctions.QualityMinTokens, lit("too_short"))
      .when(wl > nt * TextFunctions.QualityMaxAvgWordLen, lit("long_words"))
      .when(nStop * TextFunctions.QualityStopwordDen < nt, lit("low_stopword"))
      .otherwise(lit("ok"))
    t(spark, dir, "documents")
      .select(col("lang"), verdict.as("verdict"))
      .groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"))
  }

  // ---- similarity search ---------------------------------------------

  /** The query set for every ANN variant: vec_id is unique, so the
    * id-window filter admits at most 10 rows at ANY SF; the limit is
    * a no-op on the result that makes the bound PLAN-VISIBLE, so the
    * suite-wide broadcast-hint audit can prove the broadcast side is
    * bounded by construction rather than trusting the filter. */
  private def knnQueries(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 10).limit(10)

  def qKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(emb, knnQueries(emb), 5)
  }

  /** Contrastive hard negatives ([[Similarity.hardNegatives]]): per
    * query, the top-k most-similar vectors with a DIFFERENT label. */
  def qHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.hardNegatives(emb, knnQueries(emb), 5)
  }

  /** Semi-hard negatives ([[Similarity.semiHardNegatives]]): per
    * query, top-k different-label vectors inside the exact-integer
    * band [pos_sim - 0.1, pos_sim), pos_sim = hardest positive. */
  def qSemiHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.semiHardNegatives(emb, knnQueries(emb), 5)
  }

  def qKnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.lshTopK(emb, knnQueries(emb), 5)
  }

  def qKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfTopK(emb, knnQueries(emb), 5)
  }

  /** kNN-graph over the WHOLE corpus ([[Similarity.knnGraph]]): every
    * vector gets its IVF-blocked top-5 neighbors — the probe side is
    * the corpus itself, so this is the one ANN query whose plan must
    * be broadcast-free end to end (pinned in PlanAuditSpec). */
  def qKnnGraph(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnGraph(t(spark, dir, "embeddings"), 5)

  /** Mutual-kNN clusters ([[Similarity.knnClusters]]): symmetric-cut
    * edges over the q_knn_graph top-5, components labeled min-id —
    * the hub-resistant alternative to q_embed_clusters' threshold
    * cut. */
  def qKnnClusters(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnClusters(t(spark, dir, "embeddings"), 5)

  /** Margin threshold (ppm) for [[qBitextMine]]: keep mutual-best
    * pairs whose sim clears their joint neighborhood average. */
  val BitextMarginPpm = 1000000L

  /** Margin-based bitext mining ([[Similarity.bitextMine]]): aligned
    * pairs across the label-0 and label-1 pools ("two languages"),
    * IVF cell-blocked candidates both directions, k=4 neighborhood
    * sums, mutual-best + margin >= 1.0. */
  def qBitextMine(spark: SparkSession, dir: String): DataFrame =
    Similarity.bitextMine(t(spark, dir, "embeddings"),
      col("label") === 0, col("label") === 1,
      k = 4, marginPpmMin = BitextMarginPpm)

  /** Seed band (mills) for [[qLabelProp]]: 20% of vectors keep their
    * label, the rest learn one from their neighborhoods. */
  val LabelPropSeedMills = 200

  /** Label propagation ([[Similarity.labelPropagation]]): the 20%
    * id-hash seed band's labels scaled to the corpus over the
    * q_knn_graph top-5 out-neighborhoods, 3 synchronous
    * majority-vote rounds (ties to the smaller label). */
  def qLabelProp(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelPropagation(t(spark, dir, "embeddings"),
      graft.pipeline.Sampling.sampleFilter(col("vec_id"), LabelPropSeedMills),
      k = 5, rounds = 3)

  /** GROWING IVF index e2e (the ANN twin of q_dedup_grow): train +
    * persist the quantizer and base corpus (even vec_ids), admit two
    * "crawl batches" of new vectors (vec_id%4==1, then %4==3) against
    * the FROZEN quantizer as extent partitions, then serve top-k over
    * base + extents. The oracle trains KMeans on the even half only,
    * assigns ALL vectors with those centroids, and ranks — admission
    * must be invisible to results, which is the growth contract. */
  def qKnnGrow(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_grow"
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_knn_grow") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.searchGrown(spark, table, grow, knnQueries(emb), 5)
    }
  }

  /** Tombstone deletes on the growing IVF index: the q_knn_grow setup,
    * then vec_id % 7 == 0 deleted as a tombstone batch — NO rewrite of
    * base or extents — and top-k served with the tombstone anti-join
    * dropping deleted vectors BEFORE the rank window (a deleted vector
    * must not eat a top-k slot). Oracle: the grow replay over the
    * corpus minus the deleted ids. Compaction applying the tombstones
    * physically (search-after ≡ search-before) is pinned in
    * IvfIndexSpec. */
  def qKnnDelete(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_delete"
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_knn_delete") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.delete(spark, grow,
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), 3L)
      graft.sim.IvfIndex.searchGrown(spark, table, grow, knnQueries(emb), 5)
    }
  }

  /** IVF compaction e2e (VERDICT r9 #4 — the other half of the growth
    * contract): the exact q_knn_grow setup (base = even vec_ids, two
    * frozen-quantizer extent batches), then [[graft.sim.IvfIndex
    * .compact]] folds the extents into the bucketed base, and top-k is
    * served from the COMPACTED base alone. Shares q_knn_grow's oracle
    * verbatim: compaction must be invisible to results (same pairs,
    * sims, ranks), which is precisely what the shared oracle asserts
    * at gate SF. */
  def qKnnCompact(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_compact"
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_knn_compact") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.compact(spark, table, grow)
      graft.sim.IvfIndex.search(spark, table, knnQueries(emb), 5)
    }
  }

  /** Quantizer RETRAIN e2e (VERDICT r10 #3 — the last index-lifecycle
    * stage): the grown-index setup (base = even vec_ids, two
    * frozen-quantizer extent batches), vec_id%7==0 tombstoned, then
    * [[graft.sim.IvfIndex.retrain]] re-trains the coarse quantizer on
    * the LIVE corpus, reassigns every vector, rewrites the bucketed
    * base and clears extents+tombstones; top-k is served from the
    * retrained base alone. Oracle: retrain ≡ a fresh write of the
    * live corpus — the KMeans trajectory runs on vec_id%7<>0 (NOT the
    * even half: the new quantizer sees the whole live corpus, which
    * is the point of retraining) and assignment/ranking covers the
    * live set only. */
  def qKnnRetrain(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_retrain"
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_knn_retrain") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.delete(spark, grow,
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), 3L)
      graft.sim.IvfIndex.retrain(spark, table, grow)
      graft.sim.IvfIndex.search(spark, table, knnQueries(emb), 5)
    }
  }

  /** Metadata-filtered ANN (VERDICT r9 #6 — the vector-store serving
    * primitive): the grown-index setup of q_knn_grow, searched with a
    * label predicate (`label IN (1,4,7)`) pushed into EACH index
    * part's parquet scan BEFORE the candidate join (PushedFilters —
    * asserted in PlanAuditSpec). Ranks are over the allowed set only:
    * "top-k of the filtered corpus", not "filtered global top-k".
    * Oracle: the q_knn_grow replay with the same label filter on the
    * corpus assignment CTE. */
  def qKnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_filtered"
    graft.sim.IvfIndex.write(emb.filter(col("vec_id") % 2 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_knn_filtered") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admit(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.searchGrown(spark, table, grow, knnQueries(emb), 5,
        pred = Some(col("label").isin(1, 4, 7)))
    }
  }

  /** Int8-quantized IVF serving e2e (VERDICT r7 #3): persist the
    * quantized index (codes+scale+normq bucketed by cell, floats by
    * id), then answer top-k with the int8 candidate scan + exact
    * float re-rank. The timed work includes the index WRITE, same
    * cost model as q_dedup_index (train+quantize+persist once, probe
    * per query batch). Oracle replays KMeans trajectory, quantization,
    * integer-dot candidate ranking and float re-rank in SQL. */
  def qKnnIvfInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    graft.sim.IvfIndex.writeInt8(emb, "graft_q_knn_ivf_int8", buckets = 8)
    graft.sim.IvfIndex.searchInt8(spark, "graft_q_knn_ivf_int8",
      knnQueries(emb), k = 5)
  }

  /** Metadata-filtered int8 serving (the quantized leg of VERDICT r9
    * #6): the q_knn_ivf_int8 index with metadata riding the codes
    * scan table, searched with `label IN (1,4,7)` pushed into the
    * bucketed codes scan — the rerank-cut and final ranks are over
    * the allowed set only. */
  def qKnnFilteredInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    graft.sim.IvfIndex.writeInt8(emb, "graft_q_knn_filtered_int8", buckets = 8)
    graft.sim.IvfIndex.searchInt8(spark, "graft_q_knn_filtered_int8",
      knnQueries(emb), k = 5, pred = Some(col("label").isin(1, 4, 7)))
  }

  /** GROWING int8 index e2e (r11 — lifecycle parity with the float
    * path): quantized base over even vec_ids, two frozen-quantizer
    * admission batches (%4==1, %4==3) landing codes + float extents,
    * vec_id%7==0 tombstoned, then top-k served through the two-stage
    * int8 scan + float re-rank over base + extents with deleted
    * vectors masked BEFORE the rerank cut. Oracle: the int8 replay
    * with the KMeans trajectory trained on the even half and the
    * corpus-side assignment covering live vectors only (per-vector
    * quantization means admit-time codes are bit-identical to
    * write-time codes — the growth contract). */
  def qKnnGrowInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_grow_int8"
    graft.sim.IvfIndex.writeInt8(
      emb.filter(col("vec_id") % 2 === 0), table, buckets = 8)
    graft.api.Materialize.withTempRoot("graft_q_knn_grow_int8") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admitInt8(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admitInt8(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.delete(spark, grow,
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), 3L)
      graft.sim.IvfIndex.searchInt8Grown(spark, table, grow,
        knnQueries(emb), k = 5)
    }
  }

  /** Int8 quantizer retrain e2e (the quantized twin of
    * q_knn_retrain): the q_knn_grow_int8 setup, then
    * [[graft.sim.IvfIndex.retrainInt8]] re-trains on the live floats,
    * re-quantizes, rewrites both tables and clears the grow dirs;
    * top-k served by the plain two-stage search. Oracle: the int8
    * replay with the trajectory AND the corpus side on the live set
    * (retrain ≡ fresh writeInt8 of the live corpus). */
  def qKnnRetrainInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val table = "graft_q_knn_retrain_int8"
    graft.sim.IvfIndex.writeInt8(
      emb.filter(col("vec_id") % 2 === 0), table, buckets = 8)
    graft.api.Materialize.withTempRoot("graft_q_knn_retrain_int8") { root =>
      val grow = s"$root/ext"
      graft.sim.IvfIndex.admitInt8(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 1), 1L)
      graft.sim.IvfIndex.admitInt8(spark, table, grow,
        emb.filter(pmod(col("vec_id"), lit(4)) === 3), 2L)
      graft.sim.IvfIndex.delete(spark, grow,
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), 3L)
      graft.sim.IvfIndex.retrainInt8(spark, table, grow, buckets = 8)
      graft.sim.IvfIndex.searchInt8(spark, table, knnQueries(emb), k = 5)
    }
  }

  /** Int8 vector-quantization audit: per-label scale/code/residual
    * checksums of the symmetric-127 quantizer — the ANN compression
    * arithmetic itself is oracle-checked. */
  def qQuantizeInt8(spark: SparkSession, dir: String): DataFrame =
    graft.sim.Quantize.int8Stats(t(spark, dir, "embeddings"))

  /** Per-label embedding centroids (mean-pooling / prototype
    * vectors): one posexplode + combiner groupBy per (label, dim),
    * each element quantized to a 1e-6-unit long BEFORE summing so the
    * per-dim sums are order-independent and engine-exact. Output
    * folds the 64 per-dim sums into a weighted checksum per label —
    * a single wrong dim breaks the hash. Sums + count are returned
    * rather than the mean: integer division of possibly-NEGATIVE
    * sums is floor in DuckDB but truncation in Spark, so the mean is
    * left to the (float-tolerant) consumer. */
  def qCentroids(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(sum(round(col("v") * 1e6).cast("long")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        max(when(col("d") === 0, col("s"))).as("sum0_q"),
        sum((col("d") + 1) * col("s")).as("checksum"))

  /** Embedding Gram matrix: G[i][j] = Σ_docs xq_i·xq_j over 1e-6-unit
    * quantized elements — the distributed second-moment statistic
    * behind PCA / whitening / covariance of an embedding column
    * (covariance = (G − n·μμᵀ)/n is driver-side arithmetic on the
    * dim² result; μ comes from q_centroids' sums).
    *
    * 100 TB posture: the per-row dim² product expansion is ONE
    * codegen'd primitive loop ([[graft.functions.GramFlat]] — the
    * nested-transform HOF formulation measured 1.9s warm at sf0.1 vs
    * 0.6s for this shape) inside the same whole-stage pipeline as the
    * hash aggregate, so partial aggregation collapses it map-side:
    * the exchange carries only partitions × dim² rows (4096 at
    * dim 64) and the final agg is dim²-bounded. Zero joins, one
    * shuffle. Products are exact 1e-12-unit longs (|xq| ≤ 1e6 for
    * unit-norm embeddings → |p| ≤ 1e12); the BIGINT sum crosses 2^63
    * at ~9.2M docs — at production scale widen the agg to
    * DECIMAL(38,0) (good past 1e25 docs; the oracle's pandas bridge
    * degrades DECIMAL to float64, so the declared gate query stays
    * BIGINT-exact). */
  def qEmbedGram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("xq"))
      .select(size(col("xq")).as("n"),
        posexplode(graft.functions.GramFlat.gramFlat(col("xq")))
          .as(Seq("t", "p")))
      .groupBy(expr("CAST(t div n AS BIGINT)").as("i"),
        expr("CAST(t % n AS BIGINT)").as("j"))
      .agg(sum(col("p")).as("gram"))

  // ---- deterministic splits / sampling -------------------------------

  /** Train/val/test split summary: per (split, lang) doc + char counts
    * — the reproducible-split primitive of a training pipeline. */
  def qSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("split", graft.pipeline.Sampling.splitLabel(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))

  /** Deterministic stratified ~10% sample: per-lang sampled counts. */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(graft.pipeline.Sampling.sampleFilter(col("doc_id"), keep = 100))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("n_chars"))

  /** Deterministic fixed-size uniform sample (k smallest by hash
    * bucket): the reproducible "give me exactly k examples" op. */
  def qSampleFixed(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.fixedSample(
        t(spark, dir, "documents"), "doc_id", 100)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** Deterministic epoch shuffle
    * ([[graft.pipeline.Sampling.epochShuffle]]): every doc gets a
    * shard and in-shard position per epoch from a pure (id, epoch)
    * hash — a different order each epoch, bit-identical across
    * re-runs/engines, and never a global sort (per-shard windows
    * only). The reproducible-dataloader contract at corpus scale. */
  def qEpochShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.epochShuffle(
        t(spark, dir, "documents").select(col("doc_id")),
        "doc_id", epochs = 2, shards = 8)
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))

  /** Deterministic fixed-k sample per stratum ("20 docs per lang"):
    * the per-group twin of q_sample_fixed (WindowGroupLimit, no
    * global sort; hash order makes the pick uniform + reproducible). */
  /** Deterministic weighted sample: 5 docs per lang, selection
    * probability proportional to n_chars (the "sample long documents
    * preferentially" training-mix shape), no RNG. */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.weightedSamplePerGroup(
        t(spark, dir, "documents"), "doc_id", "n_chars", Seq("lang"), 5)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars"))

  def qSamplePerGroup(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.fixedSamplePerGroup(
        t(spark, dir, "documents"), "doc_id", Seq("lang"), 20)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars"))

  /** Corpus snapshot diff (incremental-ingest primitive): today's
    * "crawl" is derived deterministically from the documents table —
    * the top id-hash decile decays away (removed), the bottom 5%
    * change content (fingerprint bumped), buckets [50,60) reappear
    * under fresh ids (added) — and the diff classifies every key with
    * ONE fingerprint-only full-outer join. Status histogram output. */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bucket = graft.pipeline.Sampling.idBucket(col("doc_id"), 1000)
    val prev = docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val next = docs.filter(bucket < 900)
      .select(col("doc_id"),
        when(bucket < 50, fingerprint(col("text")) + 1)
          .otherwise(fingerprint(col("text"))).as("fp"))
      // synthetic "added" keys sit above a flipped high bit, provably
      // outside any realistic doc_id space — a small additive offset
      // (r6's +1e7) collides with real ids once a scale factor mints
      // >=10M docs, silently violating diff's unique-key contract in
      // a way both engines would reproduce (ADVICE r6)
      .unionByName(docs.filter(bucket >= 50 && bucket < 60)
        .select((col("doc_id") + (1L << 40)).as("doc_id"),
          fingerprint(col("text")).as("fp")))
    graft.pipeline.SnapshotDiff.diff(prev, next, "doc_id", "fp")
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
  }

  /** SCD-style upsert e2e: apply a synthetic delta (modified texts for
    * one id band, brand-new high-bit ids for another) to the corpus
    * and checksum the MERGED corpus per lang — delta rows must
    * replace, inserts must land, untouched rows must survive exactly
    * once. */
  def qUpsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val bucket = graft.pipeline.Sampling.idBucket(col("doc_id"), 1000)
    val delta = docs.filter(bucket < 50)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"), col("lang"))
      .unionByName(docs.filter(bucket >= 50 && bucket < 60)
        .select((col("doc_id") + (1L << 40)).as("doc_id"), col("text"), col("lang")))
    graft.pipeline.SnapshotDiff.upsert(docs, delta, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(fingerprint(col("text"))).as("fp_sum"))
  }

  /** Audio plumbing: per-sample-rate stream stats parsed back out of
    * real RIFF/WAVE headers (AudioCodec). Oracle replicates the
    * ENCODER's arithmetic — a mis-walked chunk list hash-mismatches. */
  def qAudioStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioStats(Multimodal.asAudioTable(t(spark, dir, "documents")))

  /** Per-lang target keep-rates (mills) for the weighted domain
    * mixture query: downsample over-represented English, keep German
    * whole, drop Spanish hard; French is deliberately absent so the
    * default-rate path is exercised. */
  val MixRatesMills: Map[String, Int] =
    Map("en" -> 400, "zh" -> 800, "de" -> 1000, "es" -> 250)
  val MixDefaultMills = 150

  /** Weighted domain mixture: per-lang deterministic downsampling —
    * how a training mix rebalances sources. Pure per-row hash-bucket
    * predicate (no RNG, no shuffle), so the mix is reproducible at
    * any scale and the filter pushes into the scan. */
  def qMixture(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(graft.pipeline.Sampling.mixtureFilter(
        col("doc_id"), col("lang"), MixRatesMills, MixDefaultMills))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))

  /** Within-doc repetition histogram (Gopher/C4-style quality
    * signal): percent buckets of the duplicate-3-gram fraction per
    * (lang, bucket) — integer mills arithmetic, engine-exact. The
    * corpus tops out around 7% duplicate trigrams, so percent (not
    * decile) buckets keep the histogram discriminative. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"),
        floor(TextFunctions.repetitionMills(col("text")).cast("double") / 10)
          .cast("long").as("rep_pct"))
      .groupBy(col("lang"), col("rep_pct"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-lang top-10 tokens (vocabulary / heavy-hitters extraction):
    * one combiner-friendly groupBy over the exploded corpus, then a
    * per-group rank window (WindowGroupLimit — never a global sort).
    * Fully deterministic tie-break (count DESC, token ASC). */
  def qTopTokens(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("tok"))
    t(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("tok"), col("n"))
  }

  /** Corpus-frequency (unigram) doc scoring: per-lang score sums —
    * the two-pass LM-quality-filter shape (corpus stats, then score
    * docs against them). Integer ppm arithmetic, engine-exact. */
  def qUnigramScore(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusScoring.unigramScores(t(spark, dir, "documents"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"))

  /** Bigram LM scoring with stupid backoff: counts from the train
    * id-band only, every doc scored, unseen bigrams back off to
    * halved unigram weight — the held-out-split LM-filter shape. */
  def qBigramScore(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusScoring.bigramScores(t(spark, dir, "documents"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"))

  /** Trigram LM scoring with the full two-level stupid-backoff chain
    * (trigram → halved bigram → quartered unigram) — the complete
    * n-gram LM-filter family alongside q_unigram/q_bigram_score. */
  def qTrigramScore(spark: SparkSession, dir: String): DataFrame =
    graft.text.CorpusScoring.trigramScores(t(spark, dir, "documents"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"))

  /** Cross-document duplicate n-gram exposure (Gopher-style corpus
    * contamination signal): per doc, the fraction (mills) of its
    * DISTINCT 3-gram shingles that also occur in at least one OTHER
    * document, bucketed into deciles per lang. The doc-frequency
    * join rides [[graft.text.CorpusScoring.hybridWeightJoin]], so
    * the Zipf head of hot shingles never enters the shuffle. Docs
    * with < 3 tokens have no shingles and drop out (both engines). */
  def qCrossdocNgrams(spark: SparkSession, dir: String): DataFrame = {
    // persisted: sh is read 3x (doc-frequency groupBy + both hybrid
    // branches) and the 3-gram string explode is the expensive part
    // of this query (1.57 -> 1.04s warm sf0.1). Exploded-shingle-
    // sized, spills past memory; lifetime = caller drop / clearCache
    // (the dedup-cache contract, Dedup.scala header).
    val sh = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(shingles(col("text"))).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted (count-table-sized): the hybrid reads it three ways
    // (hot head TakeOrdered, hotKeys broadcast, tail anti-join) — same
    // reasoning as the unigram weights persist
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .withColumn("freq", col("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.text.CorpusScoring.hybridWeightJoin(
        sh, dfreq, Seq("s"), "freq", 1024, "inner")
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("(sum(case when df > 1 then 1 else 0 end) * 1000)" +
        " div count(1)").as("m"))
      .groupBy(col("lang"), expr("m div 100").as("dup_decile"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Exact per-lang length percentiles (p50/p90 of n_chars) by rank
    * selection: one window pass ranks within lang, the quantile is
    * the row at rank ceil(q*n) — integer-exact on both engines, with
    * doc_id as the full tie-break. 100 TB: one keyed shuffle + per-
    * partition sort per lang (same cost class as any groupBy); when
    * exactness isn't contractual, approx_percentile does it with a
    * sketch and no sort — this op is the exact-oracle form. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    t(spark, dir, "documents")
      .select(col("lang"), col("n_chars"),
        row_number().over(w).as("rn"), count(lit(1)).over(cw).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_chars"))).as("p50"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("n_chars"))).as("p90"))
  }

  /** Per-lang DISTINCTIVE vocabulary (contrastive TF-IDF shape):
    * rank tokens by the integer-ppm ratio of in-lang count to
    * corpus-wide count — "the" scores ~its lang share everywhere,
    * lang-exclusive tokens score 1e6 — with a min-count floor so
    * hapaxes don't dominate. Two combiner groupBys + one count-table
    * join (never the corpus) + WindowGroupLimit. Complements
    * q_top_tokens (absolute heavy hitters). */
  /** Per-DOCUMENT top-3 TF-IDF terms (document keywording — the
    * per-doc complement of the per-lang [[qDistinctiveTokens]]):
    * score_ppm = (tf · 1e6 · N) div (len · df), the log-free
    * integer-rational tf-idf surrogate (monotone in tf/len · N/df),
    * full tie-break (score desc, token asc) so top-3 is
    * deterministic.
    *
    * 100 TB posture: N arrives via a broadcast 1-row cross join (no
    * driver action); the Zipf-headed df join rides
    * [[graft.text.CorpusScoring.hybridWeightJoin]] so hot tokens
    * never enter a shuffle; per-doc top-3 plans as WindowGroupLimit
    * (doc-keyed partial limit, no global sort). */
  def qTfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    val nd = docs.agg(count(lit(1)).as("nd"))
    // read twice: doc frequencies + the probe side. Doc length rides a
    // doc_id window over the SAME frame instead of a separate agg +
    // join-back (one exchange fewer; measured 1.9 -> 1.5s warm sf0.1)
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val probe = tf
      .withColumn("len", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .crossJoin(broadcast(nd))
    // numerator widened through DECIMAL: tf*1e6*nd passes 2^63 once
    // the corpus is large enough (nd ~ 1e10 at the 100 TB posture),
    // same discipline as q14's ppm ratio; div of non-negatives stays
    // floor==truncate on both engines
    val scored = graft.text.CorpusScoring.hybridWeightJoin(
        probe, dfreq.withColumn("freq", col("df")), Seq("tok"), "freq",
        graft.text.CorpusScoring.DefaultHotTokens, "inner")
      .withColumn("score_ppm",
        expr("(CAST(tf AS DECIMAL(28,0)) * 1000000 * nd) div (len * df)"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("tok"))
    graft.api.Materialize.releasing(
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("tok"), col("score_ppm")),
      Seq(tf))
  }

  def qDistinctiveTokens(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = t(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
    val cg = cl.groupBy(col("tok")).agg(sum(col("n")).as("g"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ratio_ppm").desc, col("n").desc, col("tok"))
    cl.join(cg, "tok")
      .filter(col("n") >= 5)
      .withColumn("ratio_ppm", expr("(n * 1000000L) div g"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("tok"), col("ratio_ppm"), col("n"))
  }

  /** Sequence packing: per-(shard, pack) fill stats using the
    * est-token proxy (n_chars+3)/4 and a 2048-token budget. */
  def qPack(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Packing.packGreedy(
        t(spark, dir, "documents")
          .select(col("doc_id"), ((col("n_chars") + 3) / 4).cast("long").as("est_tokens")),
        "doc_id", "est_tokens", budget = 2048, shards = 64)
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("n_tokens"))

  /** Benchmark decontamination: a 2% id-hash slice OF A FIXED ID
    * WINDOW plays the benchmark set; flag the rest of the corpus on
    * >= 3 shared shingles. A benchmark set is fixed-size by nature,
    * so the probe side must NOT scale with the corpus (VERDICT r8
    * broadcast discipline): the id window bounds it to ~20 docs at
    * every SF (identical to the old unbounded slice at the sf0.01
    * gate, where all doc_ids are < 1000), and the limit — a no-op on
    * the result — makes the bound plan-visible for the suite-wide
    * broadcast-hint audit. */
  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val isProbe = graft.pipeline.Sampling.sampleFilter(col("doc_id"), 20) &&
      col("doc_id") < 1000
    graft.pipeline.Decontaminate.flagOverlap(
      docs.filter(!isProbe), docs.filter(isProbe).limit(1000), minCommon = 3)
  }

  /** Split-leakage audit ([[graft.pipeline.Decontaminate
    * .splitLeakage]]): MinHash-verified near-dup pairs whose two docs
    * land in DIFFERENT train/val/test splits — per-row hash split
    * labels over the dedup pipeline's own pair output. */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Decontaminate.splitLeakage(t(spark, dir, "documents"), 0.5)

  /** Leakage-safe split ([[graft.pipeline.Decontaminate
    * .leakageSafeSplit]]): near-dup clusters assigned atomically, so
    * the q_split_leakage audit over THIS assignment returns zero rows
    * by construction (asserted in DecontaminateSpec). */
  def qSafeSplit(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Decontaminate.leakageSafeSplit(
      t(spark, dir, "documents"), 0.5)

  /** Token-window chunking (64-token windows, stride 48): every chunk
    * content- and boundary-pinned by a rolling-hash fingerprint. */
  def qChunking(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Chunking.chunkTokens(t(spark, dir, "documents"), 64, 48)

  // ---- file-format roundtrips (SURVEY §2.1 Csv/Text IO, driver-green) --

  /** Run a roundtrip body against a fresh temp dir, materialize the
    * (small) aggregate eagerly, then delete the corpus-sized dump —
    * repeated bench/verify runs must not accumulate dead data in
    * java.io.tmpdir (now the shared [[graft.api.Materialize
    * .withTempRoot]] discipline, which the index-lifecycle queries
    * use too). */
  private def withRoundtripDir(prefix: String)(body: String => DataFrame)
      : DataFrame = graft.api.Materialize.withTempRoot(prefix)(body)

  /** CSV sink → CSV source roundtrip, content-pinned: write the
    * documents table as part-file CSV, read it back under the same
    * schema, and aggregate per-lang counts, char sums and FINGERPRINT
    * sums — any quoting/escaping/type corruption in either direction
    * changes a rolling-hash fingerprint and hash-mismatches the
    * oracle (which reads the original parquet). Part-file parallel
    * write + read; the final agg is one combiner groupBy. */
  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    withRoundtripDir("graft_csv") { tmp =>
      // explicit whitespace opts: the CSV writer's ignore*WhiteSpace
      // default to TRUE and would silently trim padded texts — latent
      // corruption this roundtrip exists to catch, not to commit
      docs.write.mode("overwrite")
        .option("ignoreLeadingWhiteSpace", false)
        .option("ignoreTrailingWhiteSpace", false)
        .csv(tmp)
      // multiLine: a text fixture containing a newline/bare CR must
      // read back as ONE record, not split mid-row — without it the
      // roundtrip would pin line-splitting behavior instead of
      // quoting/escaping (ADVICE r7 #3)
      spark.read.schema(docs.schema).option("multiLine", true).csv(tmp)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(fingerprint(col("text"))).as("fp_sum"))
    }
  }

  /** Text sink → text source roundtrip (one doc per line), pinned the
    * same way with a global count/char/fingerprint aggregate. */
  def qTextRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    withRoundtripDir("graft_text") { tmp =>
      docs.select(col("text")).write.mode("overwrite").text(tmp)
      spark.read.text(tmp)
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("value"))).as("total_chars"),
          sum(fingerprint(col("value"))).as("fp_sum"))
    }
  }

  // ---- multimodal ----------------------------------------------------

  def qMultimodal(spark: SparkSession, dir: String): DataFrame =
    Multimodal.formatStats(Multimodal.asMediaTable(t(spark, dir, "documents")))

  /** Resize plumbing: per-format sums of fit-within-224 target dims. */
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizedDims(Multimodal.asMediaTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
        sum(col("rw")).as("sum_rw"), sum(col("rh")).as("sum_rh"))

  /** Raster-payload checksums: the decoded-pixel walk itself is
    * oracle-checked (plain + position-weighted byte sums per format),
    * not just the header arithmetic. */
  def qMultimodalPixels(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelChecksums(Multimodal.asMediaTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("px_sum")).as("sum_px"),
        sum(col("px_wsum")).as("wsum_px"))

  /** PNG decode (r14): every doc as an 8-bit truecolor PNG of the
    * ppm leg's raster, row filters cycling None/Sub/Up/Average/Paeth;
    * decoded through the real chunk-walk + inflate + five-filter
    * reconstruction. The closed-form pixel checksums pin the
    * reconstruction byte-exactly — a single wrong Paeth predictor or
    * filter offset shifts sum_px/wsum_px. (n_bytes deliberately NOT
    * pinned: deflate output is JDK-version-dependent; pixels aren't.) */
  def qPngDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelChecksums(
        Multimodal.asPngTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("px_sum")).as("sum_px"),
        sum(col("px_wsum")).as("wsum_px"))

  /** GIF decode (r16, VERDICT r15 missing #3): every doc as a REAL
    * grayscale GIF89a — 256-gray global palette, genuine
    * variable-width LZW compression (width growth, KwKwK, CLEAR
    * resets on the fixture's repetitive rasters), odd ids INTERLACED,
    * comment + graphic-control extensions in every stream so block
    * skipping is load-bearing. GIF is lossless, so the closed-form
    * checksums pin the whole decode (the PGM gray closed form:
    * gray replicates to rgb, Σ weights per pixel q is 9q+6). */
  def qGifDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelChecksums(
        Multimodal.asGifTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("px_sum")).as("sum_px"),
        sum(col("px_wsum")).as("wsum_px"))

  /** WebP-lossless decode (r17, VERDICT r16 missing #6 — the last
    * common crawl image format): every doc as a REAL VP8L stream of
    * the same gray raster, bands cycling the transform families —
    * palette (with sub-byte bundling when few grays), subtract-green,
    * color-cache + LZ77 runs, and a predictor band cycling ALL 14
    * modes block-by-block. Lossless, so the same closed-form pixel
    * checksums pin the full entropy + transform decode; a wrong
    * prefix-code walk, cache hash, run copy, predictor mode or
    * palette unbundle all shift wsum_px. */
  def qWebpDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelChecksums(
        Multimodal.asWebpTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("px_sum")).as("sum_px"),
        sum(col("px_wsum")).as("wsum_px"))

  /** Baseline JPEG decode (r15): every doc as a REAL grayscale JPEG
    * of flat 8×8 blocks (the one regime where JPEG decode is
    * bit-exact — [[graft.multimodal.JpegCodec]]), odd ids with
    * restart intervals; the decoded-raster checksums have a closed
    * form the oracle replays. Exercises markers, Huffman DC decode
    * across categories, byte unstuffing, restart resync with DC
    * prediction reset, dequantization and the IDCT's DC path; the AC
    * paths are spec-pinned against javax.imageio (JpegSpec). */
  def qJpegDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelChecksums(
        Multimodal.asJpegTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("px_sum")).as("sum_px"),
        sum(col("px_wsum")).as("wsum_px"))

  /** Perceptual-hash image near-dup (VERDICT r10 #2): the media table
    * plus deterministically perturbed re-encodes of every 20th doc,
    * 56-bit dHash over each DECODED raster (real PPM/BMP/PGM decode —
    * a row-order or channel-swap bug changes gradients and breaks the
    * hash), banded-Hamming pairs at radius 7. Catches every perturbed
    * copy (spread 0-7) plus exact-dup originals; unrelated images sit
    * >= 14 bits apart on this corpus. Oracle: replay the encoder
    * (pixels = text bytes cycled), the 8x8 luma grid and the gradient
    * bits in SQL, then brute-force pairs at gate scale (the band join
    * is lossless within the radius, so the sets agree). */
  def qImageDedup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.imageNearDupPairs(
      Multimodal.asMediaTableWithVariants(t(spark, dir, "documents")),
      maxHamming = 7, materialize = true)

  /** Perceptual audio near-dup: the audio table plus perturbed
    * re-encodes of every 20th doc, 56-bit energy-gradient fingerprint
    * over each DECODED PCM stream (real RIFF chunk walk — a sample
    * sign/endianness bug changes |s| and breaks the hash),
    * banded-Hamming pairs at radius 7. Oracle: replay the encoder
    * (|sample| = 256*|byte-128|; the 256 cancels in gradient
    * comparisons so the oracle sums |byte-128|), the 57 4-sample
    * windows and the gradient bits in SQL, brute-force pairs. */
  def qAudioDedup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioNearDupPairs(
      Multimodal.asAudioTableWithVariants(t(spark, dir, "documents")),
      maxHamming = 7, materialize = true)

  /** Video near-dup by frame-fingerprint set similarity: originals
    * (frames sampled 0, 10, 20, ...) plus a TRIMMED variant of every
    * 20th doc (same footage, sampling starts at frame 10 — the
    * clipped-head case a video dedup exists to catch); two videos
    * pair when their distinct frame-dHash sets overlap with Jaccard
    * >= 0.5 (integer cross-multiplied). Candidates from exact shared
    * frame fingerprints — measured zero cross-video collisions on
    * this corpus, so candidates = true matches. Oracle: closed-form
    * frame fingerprints (the rolled-raster grid replay), set overlap
    * in SQL. */
  def qVideoDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val originals = Multimodal.videoFrameFingerprints(
      Multimodal.asMediaTable(docs), stride = 10, firstFrame = 0)
    val trimmed = Multimodal.videoFrameFingerprints(
      Multimodal.asMediaTable(docs.filter(col("doc_id") % 20 === 0))
        .withColumn("media_id", col("media_id") + 10000000L),
      stride = 10, firstFrame = 10)
    Multimodal.videoNearDupPairs(originals.unionByName(trimmed), 0.5,
      materialize = true)
  }

  /** Incremental image dedup against a persisted
    * [[graft.dedup.FingerprintIndex]]: index the EVEN docs' image
    * fingerprints (bucketed band store), then flag the odd docs plus
    * every perturbed variant against it — "is this crawl image
    * already in the corpus", the serving shape of q_image_dedup.
    * Every variant's source is even (doc_id%20==0 ⊂ evens), so the
    * planted copies all flag cross-boundary. Oracle: the image
    * fingerprint replay + the band join (shift/mask in SQL) with
    * candidates restricted to delta-vs-indexed, popcount-verified. */
  def qImageDedupIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_image_dedup_index"
    val bits = graft.functions.ImageHash.DHashBits
    graft.dedup.FingerprintIndex.write(
      Multimodal.imageFingerprints(
        Multimodal.asMediaTable(docs.filter(col("doc_id") % 2 === 0))),
      "media_id", "fp", table, bits, maxHamming = 7, buckets = 8)
    val deltaMedia = Multimodal.asMediaTable(docs.filter(col("doc_id") % 2 =!= 0))
      .unionByName(Multimodal.mediaVariants(docs))
    graft.dedup.FingerprintIndex.flagAgainst(spark, table,
      Multimodal.imageFingerprints(deltaMedia),
      "media_id", "fp", bits, maxHamming = 7)
  }

  /** Frame-sampling plumbing: per-format sampled-frame counts. */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.asMediaTable(t(spark, dir, "documents")))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum(col("frame_idx")).as("sum_frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_substring" -> (qDedupSubstring _),
    "q_substring_scrub" -> (qSubstringScrub _),
    "q_substring_fixpoint" -> (qSubstringFixpoint _),
    "q_dedup_jaccard" -> (qDedupJaccard _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_minhash_estimate" -> (qMinhashEstimate _),
    "q_band_stats" -> (qBandStats _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
    "q_embed_clusters" -> (qEmbedClusters _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_keep" -> (qDedupKeep _),
    "q_dup_weights" -> (qDupWeights _),
    "q_dedup_index" -> (qDedupIndex _),
    "q_dedup_grow" -> (qDedupGrow _),
    "q_dedup_compact" -> (qDedupCompact _),
    "q_dedup_forget" -> (qDedupForget _),
    "q_dedup_containment" -> (qDedupContainment _),
    "q_simhash" -> (qSimhash _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_snm" -> (qDedupSnm _),
    "q_dedup_snm_multi" -> (qDedupSnmMulti _),
    "q_sample_weighted" -> (qSampleWeighted _),
    "q_lang_id" -> (qLangId _),
    "q_normalize" -> (qNormalize _),
    "q_html_extract" -> (qHtmlExtract _),
    "q_warc_extract" -> (qWarcExtract _),
    "q_http_extract" -> (qHttpExtract _),
    "q_warcgz_extract" -> (qWarcgzExtract _),
    "q_http_encoded" -> (qHttpEncoded _),
    "q_meta_charset" -> (qMetaCharset _),
    "q_url_canon" -> (qUrlCanon _),
    "q_psl_domain" -> (qPslDomain _),
    "q_url_dedup" -> (qUrlDedup _),
    "q_robots_filter" -> (qRobotsFilter _),
    "q_robots_groups" -> (qRobotsGroups _),
    "q_domain_canon" -> (qDomainCanon _),
    "q_link_extract" -> (qLinkExtract _),
    "q_link_rank" -> (qLinkRank _),
    "q_link_degree" -> (qLinkDegree _),
    "q_wire_e2e" -> (qWireE2e _),
    "q_html_quality" -> (qHtmlQuality _),
    "q_blocklist" -> (qBlocklist _),
    "q_text_quality" -> (qTextQuality _),
    "q_token_stats" -> (qTokenStats _),
    "q_fingerprint" -> (qFingerprint _),
    "q_quality_filter" -> (qQualityFilter _),
    "q_knn_brute" -> (qKnnBrute _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_semi_hard_negatives" -> (qSemiHardNegatives _),
    "q_knn_lsh" -> (qKnnLsh _),
    "q_knn_ivf" -> (qKnnIvf _),
    "q_knn_graph" -> (qKnnGraph _),
    "q_knn_clusters" -> (qKnnClusters _),
    "q_label_prop" -> (qLabelProp _),
    "q_bitext_mine" -> (qBitextMine _),
    "q_knn_grow" -> (qKnnGrow _),
    "q_knn_compact" -> (qKnnCompact _),
    "q_knn_delete" -> (qKnnDelete _),
    "q_knn_retrain" -> (qKnnRetrain _),
    "q_knn_filtered" -> (qKnnFiltered _),
    "q_knn_ivf_int8" -> (qKnnIvfInt8 _),
    "q_knn_grow_int8" -> (qKnnGrowInt8 _),
    "q_knn_retrain_int8" -> (qKnnRetrainInt8 _),
    "q_knn_filtered_int8" -> (qKnnFilteredInt8 _),
    "q_quantize_int8" -> (qQuantizeInt8 _),
    "q_centroids" -> (qCentroids _),
    "q_embed_gram" -> (qEmbedGram _),
    "q_multimodal" -> (qMultimodal _),
    "q_png_decode" -> (qPngDecode _),
    "q_gif_decode" -> (qGifDecode _),
    "q_webp_decode" -> (qWebpDecode _),
    "q_jpeg_decode" -> (qJpegDecode _),
    "q_jpeg_progressive" -> (qJpegProgressive _),
    "q_multimodal_pixels" -> (qMultimodalPixels _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_image_dedup" -> (qImageDedup _),
    "q_image_dedup_index" -> (qImageDedupIndex _),
    "q_audio_dedup" -> (qAudioDedup _),
    "q_video_dedup" -> (qVideoDedup _),
    "q_audio_stats" -> (qAudioStats _),
    "q_split" -> (qSplit _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_sample_fixed" -> (qSampleFixed _),
    "q_epoch_shuffle" -> (qEpochShuffle _),
    "q_sample_per_group" -> (qSamplePerGroup _),
    "q_mixture" -> (qMixture _),
    "q_repetition" -> (qRepetition _),
    "q_unigram_score" -> (qUnigramScore _),
    "q_bigram_score" -> (qBigramScore _),
    "q_trigram_score" -> (qTrigramScore _),
    "q_crossdoc_ngrams" -> (qCrossdocNgrams _),
    "q_percentiles" -> (qPercentiles _),
    "q_top_tokens" -> (qTopTokens _),
    "q_distinctive_tokens" -> (qDistinctiveTokens _),
    "q_tfidf_terms" -> (qTfidfTerms _),
    "q_pack" -> (qPack _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_split_leakage" -> (qSplitLeakage _),
    "q_safe_split" -> (qSafeSplit _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_upsert" -> (qUpsert _),
    "q_chunking" -> (qChunking _),
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_text_roundtrip" -> (qTextRoundtrip _),
  )

  // ---- oracle SQL ----------------------------------------------------

  private val shinglesCte =
    s"""sh AS (SELECT doc_id, unnest(${sqlShingles3("text")}) AS s FROM documents),
       cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""

  private def jaccardVerifySql(threshold: Double): String =
    s"""SELECT da, db, common, ca.n AS na, cb.n AS nb
       FROM pairs JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
       WHERE CAST(common AS DOUBLE) / (ca.n + cb.n - common) >= $threshold"""

  private val minhashSqlParts: (String, String) = {
    val p = TextFunctions.HashMod
    val mins = Dedup.hashCoeffs.map { case (a, b) =>
      s"list_min(list_transform(sv, v -> (v*$a + $b) % $p))"
    }
    val sig = s"[${mins.mkString(",\n            ")}]"
    val bands = (0 until Dedup.NumHashes / Dedup.BandSize).map { bi =>
      (0 until Dedup.BandSize).map(r => s"mh[${bi * Dedup.BandSize + r + 1}]")
        .reduceLeft((acc, m) => s"($acc*31 + $m)")
    }.mkString("[", ", ", "]")
    (sig, bands)
  }

  /** Signature/banding CTE prefix of the MinHash-LSH oracles, through
    * the exploded band buckets `bk(doc_id, band_idx, band_key)` —
    * one arithmetic source shared by the pair-, cluster- and
    * index-form oracles so they can never drift from each other. */
  private val minhashBkCtes: String =
    s"""sv0 AS (SELECT doc_id, ${sqlShingleVals3("text")} AS sv FROM documents),
       sig AS (SELECT doc_id, sv, ${minhashSqlParts._1} AS mh FROM sv0),
       bnd AS (SELECT doc_id, sv, ${minhashSqlParts._2} AS bands FROM sig),
       bk AS (SELECT doc_id, i AS band_idx, bands[i] AS band_key
              FROM bnd, unnest(generate_series(1, ${Dedup.NumHashes / Dedup.BandSize})) AS t(i))"""

  /** [[minhashVerCtes]] extended through the recursive-closure
    * component labeling `comp(node, cluster_id)` — shared by the
    * clusters oracle and the keep-set (dedup terminal) oracle. Must
    * follow a `WITH RECURSIVE`. */
  private lazy val minhashCompCtes: String =
    s"""$minhashVerCtes,
       mhp AS (SELECT da, db FROM ver
               WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5),
       e AS (SELECT da AS u, db AS v FROM mhp
             UNION SELECT db, da FROM mhp),
       reach(node, lbl) AS (
         SELECT u, u FROM e
         UNION
         SELECT e2.v, r.lbl FROM reach r JOIN e e2 ON r.node = e2.u),
       comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)"""

  /** Shared CTE chain of the MinHash-LSH oracle, through the exact
    * verification frame `ver` (da, db, common, na, nb) — consumed by
    * the pairs oracle (q_dedup_minhash) and extended to clusters
    * (q_dedup_clusters). `bkg` mirrors the Spark side's hot-bucket
    * guard ([[graft.dedup.Dedup.DefaultBandBucketCap]]): buckets
    * above the cap are excluded from candidate generation in BOTH
    * engines, so the twins stay exact. */
  private val minhashVerCtes: String =
    s"""$minhashBkCtes,
       bkg AS (SELECT doc_id, band_idx, band_key FROM (
                 SELECT bk.*, COUNT(1) OVER (
                   PARTITION BY band_idx, band_key) AS bsz FROM bk)
               WHERE bsz <= ${Dedup.DefaultBandBucketCap}),
       cand AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
                FROM bkg x JOIN bkg y ON x.band_idx = y.band_idx
                  AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
       ver AS (SELECT da, db,
                 len(list_intersect(sa.sv, sb.sv)) AS common,
                 len(sa.sv) AS na, len(sb.sv) AS nb
               FROM cand JOIN sv0 sa ON da = sa.doc_id
                 JOIN sv0 sb ON db = sb.doc_id)"""

  /** Shared replay for the grown-IVF family (q_knn_grow /
    * q_knn_compact / q_knn_filtered): KMeans trajectory on the EVEN
    * half (the base write), frozen-quantizer assignment over ALL
    * vectors, probe + rank. `cbWhere` optionally filters the corpus
    * assignment CTE — the oracle twin of searchGrown's scan-side
    * metadata predicate (filter-before-or-after-assignment is
    * identical because a vector's nearest cell doesn't depend on
    * other rows). */
  private def knnGrownOracle(cbWhere: String = "",
      ptsWhere: String = "WHERE vec_id % 2 = 0"): String =
    s"""WITH ${Iterative.kmTrajectoryCtes(k = 16, iters = 3,
          ptsWhere = ptsWhere)},
       allp AS (SELECT vec_id, embedding, label FROM embeddings),
       cb AS MATERIALIZED (
         SELECT p.vec_id AS cid, p.embedding AS cv, c.cid AS cell
         FROM allp p CROSS JOIN c3 c
         $cbWhere
         QUALIFY row_number() OVER (PARTITION BY p.vec_id
           ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) = 1),
       qp AS (
         SELECT p.vec_id AS qid, p.embedding AS qv, c.cid AS cell
         FROM allp p CROSS JOIN c3 c
         WHERE p.vec_id < 10
         QUALIFY row_number() OVER (PARTITION BY p.vec_id
           ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) <= 4),
       cand AS (
         SELECT qid, cid, ${Similarity.sqlSimRounded("qv", "cv", 64)} AS sim
         FROM qp JOIN cb USING (cell) WHERE qid <> cid),
       ranked AS (
         SELECT qid, cid, sim,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
         FROM cand)
       SELECT qid, cid, sim, rk FROM ranked WHERE rk <= 5"""

  /** CTE body shared by the kNN-graph family (q_knn_graph /
    * q_knn_clusters): KMeans trajectory, corpus cell assignment,
    * whole-corpus probe sets, candidate sims, per-vector ranks. */
  private def knnGraphCtes: String =
    s"""${Iterative.kmTrajectoryCtes(k = 16, iters = 3)},
       cb AS MATERIALIZED (
         SELECT p.vec_id AS cid, p.embedding AS cv, c.cid AS cell
         FROM pts p CROSS JOIN c3 c
         QUALIFY row_number() OVER (PARTITION BY p.vec_id
           ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) = 1),
       qp AS (
         SELECT p.vec_id AS qid, p.embedding AS qv, c.cid AS cell
         FROM pts p CROSS JOIN c3 c
         QUALIFY row_number() OVER (PARTITION BY p.vec_id
           ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) <= 4),
       cand AS (
         SELECT qid, cid, ${Similarity.sqlSimRounded("qv", "cv", 64)} AS sim
         FROM qp JOIN cb USING (cell) WHERE qid <> cid),
       ranked AS (
         SELECT qid, cid, sim,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
         FROM cand)"""

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT n_copies, COUNT(1) AS n_groups FROM (
           SELECT text, COUNT(1) AS n_copies FROM documents GROUP BY text)
         GROUP BY n_copies""",
    "q_dedup_substring" ->
      Dedup.sqlExactSubstringSpans("documents", SubstringK),
    "q_substring_scrub" ->
      Dedup.sqlExactSubstringScrub("documents", SubstringK),
    "q_substring_fixpoint" ->
      Dedup.sqlExactSubstringScrubFixpoint("documents", SubstringK,
        passes = SubstringFixpointPasses),
    "q_dedup_jaccard" ->
      s"""WITH $shinglesCte,
         pairs AS (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         ${jaccardVerifySql(0.8)}""",
    // index side = even doc_ids, delta side = odd; candidate pairs are
    // strictly cross-boundary (delta doc vs indexed doc), mirroring
    // DedupIndex.write(even) + flagAgainst(odd)
    "q_dedup_index" ->
      s"""WITH $minhashBkCtes,
         hot AS (SELECT band_idx, band_key FROM bk WHERE doc_id % 2 = 0
                 GROUP BY 1, 2
                 HAVING count(*) > ${Dedup.DefaultBandBucketCap}),
         cand AS (SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS dup_of
                  FROM bk d JOIN bk i ON d.band_idx = i.band_idx
                    AND d.band_key = i.band_key
                    AND d.doc_id % 2 <> 0 AND i.doc_id % 2 = 0
                    AND NOT EXISTS (SELECT 1 FROM hot h
                      WHERE h.band_idx = d.band_idx
                        AND h.band_key = d.band_key))
         SELECT cand.doc_id AS doc_id, cand.dup_of AS dup_of,
           len(list_intersect(sa.sv, sb.sv)) AS common,
           len(sa.sv) AS na, len(sb.sv) AS nb
         FROM cand JOIN sv0 sa ON cand.doc_id = sa.doc_id
           JOIN sv0 sb ON cand.dup_of = sb.doc_id
         WHERE CAST(len(list_intersect(sa.sv, sb.sv)) AS DOUBLE) /
           (len(sa.sv) + len(sb.sv) - len(list_intersect(sa.sv, sb.sv))) >= 0.5""",
    // growing index, 3-batch admission recursion UNROLLED: idx(k+1) =
    // idx(k) + batch-k docs with no verified near-dup in idx(k) or
    // among smaller ids of their own batch — exactly flagAndAdmit's
    // decision sequence (unrolled-oracle contract, as CC/KMeans)
    "q_dedup_grow" -> {
      val per = (1 to 3).map { k =>
        s"""cand$k AS (
             SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS dup_of
             FROM bk d JOIN bk i ON d.band_idx = i.band_idx
               AND d.band_key = i.band_key
             WHERE d.doc_id % 4 = $k
               AND (i.doc_id IN (SELECT doc_id FROM idx$k)
                    OR (i.doc_id % 4 = $k AND i.doc_id < d.doc_id))
               -- hot-bucket guard mirrors flagAndAdmit: a delta band
               -- row probing an over-cap BASE bucket is dropped for
               -- the base part only (extents/self stay unguarded)
               AND NOT (i.doc_id % 4 = 0 AND EXISTS (SELECT 1 FROM hot h
                 WHERE h.band_idx = d.band_idx
                   AND h.band_key = d.band_key))),
           ver$k AS (
             SELECT c.doc_id AS doc_id, c.dup_of AS dup_of,
               len(list_intersect(sa.sv, sb.sv)) AS common,
               len(sa.sv) AS na, len(sb.sv) AS nb,
               CAST(${k - 1} AS BIGINT) AS batch_id
             FROM cand$k c JOIN sv0 sa ON c.doc_id = sa.doc_id
               JOIN sv0 sb ON c.dup_of = sb.doc_id
             WHERE CAST(len(list_intersect(sa.sv, sb.sv)) AS DOUBLE) /
               (len(sa.sv) + len(sb.sv) - len(list_intersect(sa.sv, sb.sv))) >= 0.5),
           adm$k AS (SELECT doc_id FROM sv0 WHERE doc_id % 4 = $k
                     AND doc_id NOT IN (SELECT doc_id FROM ver$k)),
           idx${k + 1} AS (SELECT doc_id FROM idx$k
                           UNION ALL SELECT doc_id FROM adm$k)"""
      }.mkString(",\n")
      s"""WITH $minhashBkCtes,
         hot AS (SELECT band_idx, band_key FROM bk WHERE doc_id % 4 = 0
                 GROUP BY 1, 2
                 HAVING count(*) > ${Dedup.DefaultBandBucketCap}),
         idx1 AS (SELECT doc_id FROM sv0 WHERE doc_id % 4 = 0),
         $per
         SELECT doc_id, dup_of, common, na, nb, batch_id FROM (
           SELECT * FROM ver1 UNION ALL SELECT * FROM ver2
           UNION ALL SELECT * FROM ver3)"""
    },
    // compaction run: batches 1-2 replay q_dedup_grow's recursion
    // (hot guard scoped to the %4==0 base), then DedupIndex.compact
    // folds the extents into the base and RECOMPUTES the hot sidecar
    // over the WHOLE compacted index, so batch 3's guard covers every
    // indexed doc — the one semantic compaction legitimately changes
    // (everything else must be invisible, which the shared batch-1/2
    // replay asserts)
    "q_dedup_compact" -> {
      val per12 = (1 to 2).map { k =>
        s"""cand$k AS (
             SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS dup_of
             FROM bk d JOIN bk i ON d.band_idx = i.band_idx
               AND d.band_key = i.band_key
             WHERE d.doc_id % 4 = $k
               AND (i.doc_id IN (SELECT doc_id FROM idx$k)
                    OR (i.doc_id % 4 = $k AND i.doc_id < d.doc_id))
               AND NOT (i.doc_id % 4 = 0 AND EXISTS (SELECT 1 FROM hot h
                 WHERE h.band_idx = d.band_idx
                   AND h.band_key = d.band_key))),
           ver$k AS (
             SELECT c.doc_id AS doc_id, c.dup_of AS dup_of,
               len(list_intersect(sa.sv, sb.sv)) AS common,
               len(sa.sv) AS na, len(sb.sv) AS nb,
               CAST(${k - 1} AS BIGINT) AS batch_id
             FROM cand$k c JOIN sv0 sa ON c.doc_id = sa.doc_id
               JOIN sv0 sb ON c.dup_of = sb.doc_id
             WHERE CAST(len(list_intersect(sa.sv, sb.sv)) AS DOUBLE) /
               (len(sa.sv) + len(sb.sv) - len(list_intersect(sa.sv, sb.sv))) >= 0.5),
           adm$k AS (SELECT doc_id FROM sv0 WHERE doc_id % 4 = $k
                     AND doc_id NOT IN (SELECT doc_id FROM ver$k)),
           idx${k + 1} AS (SELECT doc_id FROM idx$k
                           UNION ALL SELECT doc_id FROM adm$k)"""
      }.mkString(",\n")
      s"""WITH $minhashBkCtes,
         hot AS (SELECT band_idx, band_key FROM bk WHERE doc_id % 4 = 0
                 GROUP BY 1, 2
                 HAVING count(*) > ${Dedup.DefaultBandBucketCap}),
         idx1 AS (SELECT doc_id FROM sv0 WHERE doc_id % 4 = 0),
         $per12,
         hot3 AS (SELECT band_idx, band_key FROM bk
                  WHERE doc_id IN (SELECT doc_id FROM idx3)
                  GROUP BY 1, 2
                  HAVING count(*) > ${Dedup.DefaultBandBucketCap}),
         cand3 AS (
           SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS dup_of
           FROM bk d JOIN bk i ON d.band_idx = i.band_idx
             AND d.band_key = i.band_key
           WHERE d.doc_id % 4 = 3
             AND (i.doc_id IN (SELECT doc_id FROM idx3)
                  OR (i.doc_id % 4 = 3 AND i.doc_id < d.doc_id))
             AND NOT (i.doc_id IN (SELECT doc_id FROM idx3)
               AND EXISTS (SELECT 1 FROM hot3 h
                 WHERE h.band_idx = d.band_idx
                   AND h.band_key = d.band_key))),
         ver3 AS (
           SELECT c.doc_id AS doc_id, c.dup_of AS dup_of,
             len(list_intersect(sa.sv, sb.sv)) AS common,
             len(sa.sv) AS na, len(sb.sv) AS nb,
             CAST(2 AS BIGINT) AS batch_id
           FROM cand3 c JOIN sv0 sa ON c.doc_id = sa.doc_id
             JOIN sv0 sb ON c.dup_of = sb.doc_id
           WHERE CAST(len(list_intersect(sa.sv, sb.sv)) AS DOUBLE) /
             (len(sa.sv) + len(sb.sv) - len(list_intersect(sa.sv, sb.sv))) >= 0.5)
         SELECT doc_id, dup_of, common, na, nb, batch_id FROM (
           SELECT * FROM ver1 UNION ALL SELECT * FROM ver2
           UNION ALL SELECT * FROM ver3)"""
    },
    // forget run: batch 1 replays the grow recursion, the tombstone
    // set (indexed ids with doc_id%5==0) then anti-filters batch 2's
    // VERIFIED pairs on dup_of — the exact pairs-side anti-join of
    // flagAndAdmit (deleted docs still sit in the stored bands until
    // compaction, so candidate generation is untouched; only the
    // flag output loses the forgotten witnesses)
    "q_dedup_forget" ->
      s"""WITH $minhashBkCtes,
         hot AS (SELECT band_idx, band_key FROM bk WHERE doc_id % 4 = 0
                 GROUP BY 1, 2
                 HAVING count(*) > ${Dedup.DefaultBandBucketCap}),
         idx1 AS (SELECT doc_id FROM sv0 WHERE doc_id % 4 = 0),
         cand1 AS (
           SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS dup_of
           FROM bk d JOIN bk i ON d.band_idx = i.band_idx
             AND d.band_key = i.band_key
           WHERE d.doc_id % 4 = 1
             AND (i.doc_id IN (SELECT doc_id FROM idx1)
                  OR (i.doc_id % 4 = 1 AND i.doc_id < d.doc_id))
             AND NOT (i.doc_id % 4 = 0 AND EXISTS (SELECT 1 FROM hot h
               WHERE h.band_idx = d.band_idx
                 AND h.band_key = d.band_key))),
         ver1 AS (
           SELECT c.doc_id AS doc_id, c.dup_of AS dup_of,
             len(list_intersect(sa.sv, sb.sv)) AS common,
             len(sa.sv) AS na, len(sb.sv) AS nb,
             CAST(0 AS BIGINT) AS batch_id
           FROM cand1 c JOIN sv0 sa ON c.doc_id = sa.doc_id
             JOIN sv0 sb ON c.dup_of = sb.doc_id
           WHERE CAST(len(list_intersect(sa.sv, sb.sv)) AS DOUBLE) /
             (len(sa.sv) + len(sb.sv) - len(list_intersect(sa.sv, sb.sv))) >= 0.5),
         adm1 AS (SELECT doc_id FROM sv0 WHERE doc_id % 4 = 1
                  AND doc_id NOT IN (SELECT doc_id FROM ver1)),
         idx2 AS (SELECT doc_id FROM idx1
                  UNION ALL SELECT doc_id FROM adm1),
         tomb AS (SELECT doc_id FROM idx2 WHERE doc_id % 5 = 0),
         cand2 AS (
           SELECT DISTINCT d.doc_id AS doc_id, i.doc_id AS dup_of
           FROM bk d JOIN bk i ON d.band_idx = i.band_idx
             AND d.band_key = i.band_key
           WHERE d.doc_id % 4 = 2
             AND (i.doc_id IN (SELECT doc_id FROM idx2)
                  OR (i.doc_id % 4 = 2 AND i.doc_id < d.doc_id))
             AND NOT (i.doc_id % 4 = 0 AND EXISTS (SELECT 1 FROM hot h
               WHERE h.band_idx = d.band_idx
                 AND h.band_key = d.band_key))),
         ver2 AS (
           SELECT c.doc_id AS doc_id, c.dup_of AS dup_of,
             len(list_intersect(sa.sv, sb.sv)) AS common,
             len(sa.sv) AS na, len(sb.sv) AS nb,
             CAST(1 AS BIGINT) AS batch_id
           FROM cand2 c JOIN sv0 sa ON c.doc_id = sa.doc_id
             JOIN sv0 sb ON c.dup_of = sb.doc_id
           WHERE CAST(len(list_intersect(sa.sv, sb.sv)) AS DOUBLE) /
             (len(sa.sv) + len(sb.sv) - len(list_intersect(sa.sv, sb.sv))) >= 0.5
             AND c.dup_of NOT IN (SELECT doc_id FROM tomb))
         SELECT doc_id, dup_of, common, na, nb, batch_id FROM (
           SELECT * FROM ver1 UNION ALL SELECT * FROM ver2)""",
    // bk's band_idx is 1-based (generate_series) vs Spark posexplode's
    // 0-based — shift on output so the engines agree on the column
    "q_band_stats" ->
      s"""WITH $minhashBkCtes,
         b AS (SELECT band_idx, band_key, count(*) AS n
               FROM bk GROUP BY 1, 2)
         SELECT CAST(band_idx - 1 AS INTEGER) AS band_idx,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_bucket,
           CAST(sum(n) AS BIGINT) AS n_rows
         FROM b GROUP BY 1""",
    "q_minhash_estimate" ->
      s"""WITH $minhashVerCtes
         SELECT ver.da AS da, ver.db AS db, common, na, nb,
           CAST(len(list_filter(range(1, ${Dedup.NumHashes + 1}),
             i -> sa.mh[i] = sb.mh[i])) AS BIGINT) AS slots_match
         FROM ver JOIN sig sa ON ver.da = sa.doc_id
           JOIN sig sb ON ver.db = sb.doc_id
         WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5""",
    "q_dedup_minhash" ->
      s"""WITH $minhashVerCtes
         SELECT da, db, common, na, nb FROM ver
         WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5""",
    // leakage-safe split: components over the verified pair graph
    // (recursive closure, min-id label), split key = COALESCE(component,
    // own id) — singletons keep the plain hash assignment
    "q_safe_split" ->
      s"""WITH RECURSIVE $minhashVerCtes,
         vp AS (SELECT da, db FROM ver
                WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5),
         e AS (SELECT da AS u, db AS v FROM vp UNION SELECT db, da FROM vp),
         reach(node, lbl) AS (
           SELECT u, u FROM e
           UNION
           SELECT e2.v, r.lbl FROM reach r JOIN e e2 ON r.node = e2.u),
         comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
         keyed AS (
           SELECT d.doc_id AS doc_id, COALESCE(c.component, d.doc_id) AS k
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
         SELECT doc_id, ${graft.pipeline.Sampling.sqlSplitLabel("k")} AS split
         FROM keyed""",
    // split-leakage: the verified pair set with per-id hash split
    // labels, boundary-crossing pairs only
    "q_split_leakage" ->
      s"""WITH $minhashVerCtes,
         lk AS (
           SELECT da, db, common, na, nb,
             ${graft.pipeline.Sampling.sqlSplitLabel("da")} AS split_a,
             ${graft.pipeline.Sampling.sqlSplitLabel("db")} AS split_b
           FROM ver
           WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5)
         SELECT da, db, common, na, nb, split_a, split_b FROM lk
         WHERE split_a <> split_b""",
    // brute-force candidate generation is fine at oracle scale; the
    // integer cross-multiplied threshold mirrors the Spark side exactly
    "q_dedup_containment" ->
      s"""WITH $shinglesCte,
         pairs AS (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT da, db, common, ca.n AS na, cb.n AS nb
         FROM pairs JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
         WHERE common * 1000 >= ca.n * 900""",
    // transitive closure of the verified pair graph: DuckDB's
    // recursive CTE enumerates (node, reachable-label) pairs until
    // the dedup'd UNION fixpoints (dup clusters are small, so the
    // enumeration is tiny at oracle scale); MIN(label) per node is
    // exactly the Spark side's min-id component
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCompCtes
         SELECT cluster_id, COUNT(1) AS n_docs,
           MAX(node) AS max_doc, CAST(SUM(node) AS BIGINT) AS sum_doc
         FROM comp GROUP BY cluster_id""",
    // the dedup TERMINAL: drop every non-representative cluster member
    // (node <> its min-id label), keep representatives + singletons
    "q_dup_weights" ->
      """WITH d AS (
           SELECT doc_id, COUNT(1) OVER (PARTITION BY text) AS n_copies
           FROM documents),
         dw AS (SELECT n_copies, 1000000 // n_copies AS weight_ppm FROM d)
         SELECT n_copies, CAST(weight_ppm AS BIGINT) AS weight_ppm,
           COUNT(1) AS n_docs,
           CAST(SUM(weight_ppm) AS BIGINT) AS eff_sum
         FROM dw GROUP BY 1, 2""",
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $minhashCompCtes
         SELECT lang, COUNT(1) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
         FROM documents
         WHERE NOT EXISTS (SELECT 1 FROM comp
           WHERE node = doc_id AND node <> cluster_id)
         GROUP BY lang""",
    "q_dedup_embedding" ->
      s"""SELECT a.vec_id AS va, b.vec_id AS vb,
           ${graft.sim.Similarity.sqlSimRounded("a.embedding", "b.embedding", 64)} AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE ${graft.sim.Similarity.sqlSimRounded("a.embedding", "b.embedding", 64)} >= 0.35""",
    // embedding clusters: recursive closure over the SAME pair graph
    // as q_dedup_embedding, reported per min-id cluster label
    "q_embed_clusters" ->
      s"""WITH RECURSIVE ep AS (
           SELECT a.vec_id AS va, b.vec_id AS vb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id
           WHERE ${graft.sim.Similarity.sqlSimRounded("a.embedding", "b.embedding", 64)} >= 0.35),
         e AS (SELECT va AS u, vb AS v FROM ep
               UNION SELECT vb, va FROM ep),
         reach(node, lbl) AS (
           SELECT u, u FROM e
           UNION
           SELECT e2.v, r.lbl FROM reach r JOIN e e2 ON r.node = e2.u),
         comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
         SELECT cluster_id, COUNT(1) AS n_vecs, MAX(node) AS max_vec,
           CAST(SUM(node) AS BIGINT) AS sum_vec
         FROM comp GROUP BY cluster_id""",
    "q_simhash" ->
      s"""SELECT doc_id, CAST(${Dedup.sqlSimhash("text")} AS BIGINT) AS simhash
         FROM documents""",
    // the banded join is lossless within the radius (pigeonhole), so
    // the oracle's brute-force all-pairs popcount is the same set
    "q_dedup_simhash" ->
      s"""WITH sh AS (SELECT doc_id,
             CAST(${Dedup.sqlSimhash("text", Dedup.HammingBits)} AS BIGINT) AS sh
           FROM documents)
         SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sh, b.sh)) <= 3""",
    // window-4 lead() neighbors in (lang, token-sorted-text) order,
    // then the shared exact-Jaccard verify
    "q_dedup_snm" ->
      s"""WITH $shinglesCte,
         rk AS (SELECT doc_id, lang,
             array_to_string(list_sort(string_split(text, ' ')), ' ') AS k
           FROM documents),
         nbl AS (SELECT doc_id,
             [lead(doc_id, 1) OVER w, lead(doc_id, 2) OVER w,
              lead(doc_id, 3) OVER w] AS ns
           FROM rk WINDOW w AS (PARTITION BY lang ORDER BY k, doc_id)),
         cand AS (SELECT DISTINCT LEAST(doc_id, y) AS da, GREATEST(doc_id, y) AS db
           FROM (SELECT doc_id, unnest(ns) AS y FROM nbl) WHERE y IS NOT NULL),
         pairs AS (SELECT c.da, c.db, count(*) AS common
           FROM cand c JOIN sh a ON a.doc_id = c.da
             JOIN sh b ON b.doc_id = c.db AND a.s = b.s
           GROUP BY 1, 2)
         ${jaccardVerifySql(0.8)}""",
    // two candidate passes (token-sorted key ascending and reversed),
    // unioned DISTINCT, then the shared exact-Jaccard verify
    "q_dedup_snm_multi" ->
      s"""WITH $shinglesCte,
         rk AS (SELECT doc_id, lang,
             array_to_string(list_sort(string_split(text, ' ')), ' ') AS k1,
             array_to_string(list_reverse(list_sort(string_split(text, ' '))), ' ') AS k2
           FROM documents),
         nbl1 AS (SELECT doc_id,
             [lead(doc_id, 1) OVER w, lead(doc_id, 2) OVER w,
              lead(doc_id, 3) OVER w] AS ns
           FROM rk WINDOW w AS (PARTITION BY lang ORDER BY k1, doc_id)),
         nbl2 AS (SELECT doc_id,
             [lead(doc_id, 1) OVER w, lead(doc_id, 2) OVER w,
              lead(doc_id, 3) OVER w] AS ns
           FROM rk WINDOW w AS (PARTITION BY lang ORDER BY k2, doc_id)),
         cand AS (SELECT DISTINCT LEAST(doc_id, y) AS da, GREATEST(doc_id, y) AS db
           FROM (SELECT doc_id, unnest(ns) AS y FROM nbl1
                 UNION ALL SELECT doc_id, unnest(ns) AS y FROM nbl2)
           WHERE y IS NOT NULL),
         pairs AS (SELECT c.da, c.db, count(*) AS common
           FROM cand c JOIN sh a ON a.doc_id = c.da
             JOIN sh b ON b.doc_id = c.db AND a.s = b.s
           GROUP BY 1, 2)
         ${jaccardVerifySql(0.8)}""",
    "q_lang_id" ->
      s"""SELECT lang, ${sqlPredictedLang("text")} AS predicted, COUNT(1) AS n
         FROM documents GROUP BY lang, predicted""",
    "q_blocklist" -> {
      val phrases = Blocklist.map(p => s"'${p}'").mkString("[", ", ", "]")
      s"""SELECT doc_id,
           unnest(list_intersect(${graft.text.TextFunctions
             .sqlShingles3("text")}, $phrases)) AS phrase
         FROM documents"""
    },
    // the dirty fixture is synthesized with chr(): a combining acute
    // (769) NFC must compose, the precomposed e-acute (233) with a
    // doubled space, C0/DEL controls — byte-for-byte the Spark escapes
    "q_normalize" ->
      s"""SELECT doc_id, raw_chars, norm,
           CAST(length(norm) AS BIGINT) AS norm_chars
         FROM (SELECT doc_id, CAST(length(raw) AS BIGINT) AS raw_chars,
             ${graft.text.TextFunctions.sqlNormalizeText("raw")} AS norm
           FROM (SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'e' || chr(769) || ' ' || text
               WHEN 1 THEN chr(233) || '  ' || text
               WHEN 2 THEN chr(9) || text || chr(11) || chr(127)
               ELSE text END AS raw
             FROM documents))""",
    // WARC framing + end-of-chain extraction: the synthesis is the
    // shared sqlWarcify/warcify pair, the parse is the
    // Content-Length slice, and fp_clean pins the WHOLE
    // wire-to-clean-text chain per header-layout variant
    "q_warc_extract" -> {
      import graft.text.Warc
      val rec = Warc.sqlWarcify("doc_id", sqlHtmlize("doc_id", "text"))
      s"""WITH r AS (SELECT CAST(doc_id % 4 AS BIGINT) AS variant,
             $rec AS rec
           FROM documents),
         p AS (SELECT variant,
             ${Warc.sqlContentLength("rec")} AS clen,
             CASE WHEN length(${Warc.sqlBody("rec")})
                  = ${Warc.sqlContentLength("rec")}
                  THEN 1 ELSE 0 END AS ok,
             ${sqlFingerprint(Warc.sqlTargetUri("rec"))} AS fp_uri,
             ${sqlFingerprint(
               graft.text.HtmlExtract.sqlCleanText(Warc.sqlBody("rec")))}
               AS fp_clean
           FROM r)
         SELECT variant, COUNT(1) AS n_records,
           CAST(SUM(clen) AS BIGINT) AS total_octets,
           CAST(SUM(ok) AS BIGINT) AS n_body_ok,
           CAST(SUM(fp_uri) AS BIGINT) AS fp_uri_sum,
           CAST(SUM(fp_clean) AS BIGINT) AS fp_clean_sum
         FROM p GROUP BY variant"""
    },
    // the HTTP envelope chain: shared sqlHttpWrap/httpWrap synthesis
    // inside the WARC framing, then status/content-type/charset
    // columns + the envelope strip before extraction; the no-envelope
    // band (variant 2) must surface null status and pass the body
    // through unchanged
    "q_http_extract" -> {
      import graft.text.Warc
      val rec = Warc.sqlWarcify("doc_id",
        Warc.sqlHttpWrap("doc_id", sqlHtmlize("doc_id", "text")))
      s"""WITH r AS (SELECT CAST(doc_id % 3 AS BIGINT) AS variant,
             $rec AS rec
           FROM documents),
         p AS (SELECT variant, ${Warc.sqlBody("rec")} AS body FROM r),
         q AS (SELECT variant,
             ${Warc.sqlHttpStatus("body")} AS status,
             ${Warc.sqlHttpContentType("body")} AS ct,
             ${Warc.sqlHttpCharset("body")} AS cs,
             ${sqlFingerprint(
               graft.text.HtmlExtract.sqlCleanText(Warc.sqlHttpPayload("body")))}
               AS fp_clean
           FROM p)
         SELECT variant, COUNT(1) AS n_records,
           COUNT(status) AS n_with_status,
           CAST(COALESCE(SUM(status), 0) AS BIGINT) AS status_sum,
           COUNT(CASE WHEN ct = 'text/html' THEN 1 END) AS n_html,
           COUNT(cs) AS n_charset,
           CAST(SUM(fp_clean) AS BIGINT) AS fp_clean_sum
         FROM q GROUP BY variant"""
    },
    // the wire-side funnel: each CTE is one stage, counted once — a
    // wrong drop at any stage shows as its own row
    "q_wire_e2e" -> {
      import graft.text.{HtmlExtract, Warc}
      // page synthesis keys on page_id (a re-crawl reproduces its
      // original page byte-for-byte); WARC/HTTP identity on doc_id
      val rec = Warc.sqlWarcify("doc_id",
        Warc.sqlHttpWrap("doc_id", sqlHtmlize("page_id", "text")))
      // every stage MATERIALIZED: the scalar-subquery counts reference
      // each CTE a second time, and inlined re-expansion of the
      // extraction chain blew DuckDB past its memory limit at sf0.1
      // (observed r15) — materialization bounds each stage to its
      // actual row count
      s"""WITH corpus AS MATERIALIZED (
           SELECT doc_id, doc_id AS page_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000, doc_id, text FROM documents
           WHERE doc_id % 25 = 0),
         r AS MATERIALIZED (SELECT doc_id, $rec AS rec FROM corpus),
         p AS MATERIALIZED (
           SELECT doc_id, ${Warc.sqlHttpStatus("body")} AS status,
             ${Warc.sqlHttpPayload("body")} AS payload
           FROM (SELECT doc_id, ${Warc.sqlBody("rec")} AS body FROM r)),
         k AS MATERIALIZED (SELECT doc_id, payload FROM p
           WHERE status = 200 OR status IS NULL),
         c AS MATERIALIZED (
           SELECT doc_id, clean, replace(clean, chr(10), ' ') AS flat
           FROM (SELECT doc_id, ${HtmlExtract.sqlCleanText("payload")}
               AS clean FROM k)),
         d AS MATERIALIZED (SELECT doc_id, clean, flat FROM (
             SELECT doc_id, clean, flat, row_number() OVER (
               PARTITION BY clean ORDER BY doc_id) AS rn FROM c)
           WHERE rn = 1),
         q AS MATERIALIZED (SELECT doc_id, flat FROM d
           WHERE ${TextFunctions.sqlQualityOk("flat")})
         SELECT 1 AS pos, 'wire_records' AS stage,
           (SELECT COUNT(1) FROM r) AS n
         UNION ALL SELECT 2, 'http_keep', (SELECT COUNT(1) FROM k)
         UNION ALL SELECT 3, 'dedup_keep', (SELECT COUNT(1) FROM d)
         UNION ALL SELECT 4, 'quality_ok', (SELECT COUNT(1) FROM q)
         UNION ALL SELECT 5, 'tokens',
           (SELECT CAST(COALESCE(SUM(len(string_split(flat, ' '))), 0)
              AS BIGINT) FROM q)"""
    },
    // the gz layer is transparent to the oracle: same synthesis +
    // parse as q_http_extract, grouped by recovered status — only a
    // byte-faithful member round trip on the Spark side reproduces it
    "q_warcgz_extract" -> {
      import graft.text.Warc
      val rec = Warc.sqlWarcify("doc_id",
        Warc.sqlHttpWrap("doc_id", sqlHtmlize("doc_id", "text")))
      s"""WITH r AS (SELECT $rec AS rec FROM documents),
         p AS (SELECT ${Warc.sqlBody("rec")} AS body,
             CASE WHEN length(${Warc.sqlBody("rec")})
                  = ${Warc.sqlContentLength("rec")}
                  THEN 1 ELSE 0 END AS ok,
             ${sqlFingerprint(Warc.sqlTargetUri("rec"))} AS fp_uri
           FROM r),
         q AS (SELECT ${Warc.sqlHttpStatus("body")} AS status, ok, fp_uri,
             ${sqlFingerprint(
               graft.text.HtmlExtract.sqlCleanText(Warc.sqlHttpPayload("body")))}
               AS fp_clean
           FROM p)
         SELECT status, COUNT(1) AS n_records,
           CAST(SUM(ok) AS BIGINT) AS n_body_ok,
           CAST(SUM(fp_uri) AS BIGINT) AS fp_uri_sum,
           CAST(SUM(fp_clean) AS BIGINT) AS fp_clean_sum
         FROM q GROUP BY status"""
    },
    // the wire ENCODINGS are transparent to the oracle (de-chunk +
    // inflate is lossless): per-band groups + clean-text fingerprints
    // straight from documents — only a byte-faithful decode AND the
    // Content-Length rewrite (n_body_ok) reproduce them on the Spark
    // side, which ran the real segment round trip
    "q_http_encoded" -> {
      val fp = sqlFingerprint(
        graft.text.HtmlExtract.sqlCleanText(sqlHtmlize("doc_id", "text")))
      s"""SELECT
           CASE CAST(doc_id % 6 AS INT)
             WHEN 1 THEN 'gzip' WHEN 2 THEN 'deflate' WHEN 4 THEN 'gzip'
             WHEN 5 THEN 'zstd'
             ELSE 'identity' END AS encoding,
           CAST(doc_id % 6 AS INT) IN (3, 4) AS chunked,
           COUNT(1) AS n_records,
           COUNT(1) AS n_body_ok,
           COUNT(1) AS n_200,
           CAST(SUM($fp) AS BIGINT) AS fp_clean_sum
         FROM documents
         GROUP BY 1, 2"""
    },
    // meta-charset bands: the wire charsets are transparent when the
    // chain leg is right, so the expected text comes straight from
    // documents + the shared marker; band 3 (header lies, header
    // wins) is the deterministic one-substitution mojibake — the
    // all-ASCII corpus guarantees é is the only multi-byte sequence;
    // the prepended meta tags clean to a trimmed leading space, so
    // every band shares ONE clean form
    "q_meta_charset" -> {
      val clean = graft.text.HtmlExtract.sqlCleanText(
        s"(${sqlHtmlize("doc_id", "text")} || '<p>café</p>')")
      s"""WITH m AS (SELECT doc_id, $clean AS clean FROM documents),
         r AS (SELECT doc_id,
             CASE WHEN doc_id % 6 = 3 THEN replace(clean, 'é', 'Ã©')
                  ELSE clean END AS rec
           FROM m)
         SELECT CAST(doc_id % 6 AS BIGINT) AS band,
           COUNT(1) AS n_records,
           COUNT(1) AS n_body_ok,
           CAST(SUM(${sqlFingerprint("rec")}) AS BIGINT) AS fp_clean_sum
         FROM r GROUP BY 1"""
    },
    // the canonicalization step chain runs as DuckDB lateral column
    // aliases (linear — nesting would re-expand each step
    // exponentially); the canonical URL and site strings themselves
    // are hash-compared
    "q_url_canon" -> {
      import graft.text.Url
      s"""SELECT doc_id, uc_canon AS canon, uc_site AS site
         FROM (SELECT doc_id, ${Url.sqlCanonSteps(Url.sqlUrlize("doc_id"))}
           FROM documents)"""
    },
    // PSL-rule registrable domain: rules VALUES + the CTE fold render
    // from the same FixtureSuffixRules/sqlRegistrableDomainCtes as
    // the Spark frame
    "q_psl_domain" -> {
      import graft.text.Url
      s"""WITH src AS (SELECT doc_id, ${Url.sqlHostize("doc_id")} AS host
           FROM documents),
         rules AS (SELECT * FROM ${Url.sqlFixtureSuffixRules}),
         ${Url.sqlRegistrableDomainCtes("src")}
         SELECT s.doc_id, s.host, rdmap.site
         FROM src s JOIN rdmap ON s.host = rdmap.host"""
    },
    // URL-keyed dedup: four spellings per page must fold to one
    // canonical key; count + keep-first per key
    "q_url_dedup" -> {
      import graft.text.Url
      s"""SELECT uc_canon AS canon, COUNT(1) AS n_dups,
           MIN(doc_id) AS keep_doc
         FROM (SELECT doc_id, ${Url.sqlCanonSteps(Url.sqlUrlizeDup("doc_id"))}
           FROM documents)
         GROUP BY 1"""
    },
    // robots exclusion: the rules VALUES relation and its regexes
    // render from the SAME fixtureRules/translate as the Spark frame;
    // per-url argmax over (pattern_len*2 + isAllow), default allow
    "q_robots_filter" -> {
      import graft.text.{Robots, Url}
      s"""WITH urls AS (
           SELECT doc_id, uc_canon AS canon, uc_site AS site,
             ${Robots.sqlPathQueryOf("uc_canon")} AS pathq
           FROM (SELECT doc_id, ${Url.sqlCanonSteps(Url.sqlUrlize("doc_id"))}
             FROM documents)),
         m AS (
           SELECT u.doc_id, arg_max(rules.verdict, rules.pattern_len * 2 +
               CASE WHEN rules.verdict = 'allow' THEN 1 ELSE 0 END) AS win
           FROM urls u
           JOIN ${Robots.sqlFixtureRules} ON u.site = rules.site
           WHERE regexp_matches(u.pathq, rules.regex)
           GROUP BY u.doc_id)
         SELECT site, COALESCE(m.win, 'allow') AS verdict,
           COUNT(1) AS n_urls,
           CAST(SUM(${sqlFingerprint("canon")}) AS BIGINT) AS fp_canon_sum
         FROM urls LEFT JOIN m USING (doc_id)
         GROUP BY 1, 2"""
    },
    // group-selected robots rules + politeness metadata: the rules
    // AND meta VALUES render through the same parse+select+translate
    // as the Spark frames — the twins share the whole ingestion path
    "q_robots_groups" -> {
      import graft.text.{Robots, Url}
      s"""WITH urls AS (
           SELECT doc_id, uc_canon AS canon, uc_site AS site,
             ${Robots.sqlPathQueryOf("uc_canon")} AS pathq
           FROM (SELECT doc_id, ${Url.sqlCanonSteps(Url.sqlUrlize("doc_id"))}
             FROM documents)),
         mm AS (
           SELECT u.doc_id, arg_max(rules.verdict, rules.pattern_len * 2 +
               CASE WHEN rules.verdict = 'allow' THEN 1 ELSE 0 END) AS win
           FROM urls u
           JOIN ${Robots.sqlGroupRules} ON u.site = rules.site
           WHERE regexp_matches(u.pathq, rules.regex)
           GROUP BY u.doc_id),
         agg AS (
           SELECT site, COALESCE(mm.win, 'allow') AS verdict,
             COUNT(1) AS n_urls,
             CAST(SUM(${sqlFingerprint("canon")}) AS BIGINT) AS fp_canon_sum
           FROM urls LEFT JOIN mm USING (doc_id)
           GROUP BY 1, 2)
         SELECT agg.site, agg.verdict, agg.n_urls, agg.fp_canon_sum,
           CAST(meta.crawl_delay AS BIGINT) AS crawl_delay,
           CAST(meta.n_sitemaps AS BIGINT) AS n_sitemaps
         FROM agg LEFT JOIN ${Robots.sqlGroupMeta}
           ON agg.site = meta.site"""
    },
    // the registrable-domain-keyed reputation rollup: the shared
    // rollup CTE over a relation whose source IS the site key
    "q_domain_canon" -> {
      import graft.text.Url
      s"""WITH urlkeyed AS (SELECT uc_site AS source, text FROM
           (SELECT text, ${Url.sqlCanonSteps(Url.sqlUrlize("doc_id"))}
            FROM documents)),
         ${graft.pipeline.DomainReputation.sqlRollupCteOver("urlkeyed")}
         SELECT source, n_docs, n_quality_bad, n_dup_extra, n_pii_docs,
           risk, reputation
         FROM rep"""
    },
    // link extraction: fixture, href patterns, resolution steps and
    // the canonical chain all render from the SAME tables as the
    // Spark side (Links/Url single-source discipline)
    "q_link_extract" -> {
      import graft.text.TextFunctions
      s"""WITH $sqlLinkCtes
         SELECT dst_site, COUNT(1) AS n_links,
           COUNT(DISTINCT doc_id) AS n_pages,
           CAST(SUM(${TextFunctions.sqlFingerprint("target")}) AS BIGINT)
             AS fp_target_sum,
           MIN(target) AS min_target
         FROM lf GROUP BY 1"""
    },
    // domain PageRank over the link graph: the q_pagerank unroll (3
    // supersteps, 1e-12-quantized) with the edge CTE swapped to the
    // extracted cross-site domain edges
    "q_link_rank" -> {
      val off = s"CAST(${(1 - 0.85).toString} AS DOUBLE)/(SELECT n FROM nn)"
      def prStep(prev: String, out: String) =
        s"""$out AS (
             SELECT v.id,
               CAST(round(($off + 0.85*(COALESCE(s.csum,0)/1e12))*1e12) AS BIGINT)/1e12 AS rank
             FROM v LEFT JOIN (
               SELECT e.dst AS id,
                 SUM(CAST(round(r.rank/d.outdeg*1e12) AS BIGINT)) AS csum
               FROM $prev r JOIN e ON r.id = e.src JOIN d ON e.src = d.src
               GROUP BY e.dst) s ON v.id = s.id)"""
      s"""WITH $sqlLinkCtes,
         e AS MATERIALIZED (
           SELECT src_site AS src, dst_site AS dst FROM lf
           WHERE dst_site <> src_site),
         v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
         d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS rank FROM v),
         ${prStep("r0", "r1")},
         ${prStep("r1", "r2")},
         ${prStep("r2", "r3")}
         SELECT id, rank FROM r3 ORDER BY rank DESC, id LIMIT 20"""
    },
    // degree stats joined into the canonical-site reputation rollup
    "q_link_degree" -> {
      import graft.text.Url
      s"""WITH $sqlLinkCtes,
         e AS MATERIALIZED (
           SELECT src_site, dst_site FROM lf WHERE dst_site <> src_site),
         od AS (SELECT src_site, COUNT(1) AS out_links FROM e GROUP BY 1),
         idg AS (SELECT dst_site, COUNT(1) AS in_links FROM e GROUP BY 1),
         urlkeyed AS (SELECT uc_site AS source, text FROM
           (SELECT text, ${Url.sqlCanonSteps(Url.sqlUrlize("doc_id"))}
            FROM documents)),
         ${graft.pipeline.DomainReputation.sqlRollupCteOver("urlkeyed")}
         SELECT source, n_docs,
           CAST(COALESCE(od.out_links, 0) AS BIGINT) AS out_links,
           CAST(COALESCE(idg.in_links, 0) AS BIGINT) AS in_links,
           reputation
         FROM rep LEFT JOIN od ON rep.source = od.src_site
         LEFT JOIN idg ON rep.source = idg.dst_site"""
    },
    // the HTML fixture + extraction pipeline are each generated from
    // ONE shared table (sqlHtmlize / HtmlExtract.Steps) so the twins
    // cannot drift; the clean STRING itself is hash-compared
    "q_html_extract" -> {
      val raw = sqlHtmlize("doc_id", "text")
      s"""SELECT doc_id, clean_text,
           ${graft.text.HtmlExtract.sqlBoilerplatePpm("raw", "clean_text")}
             AS boilerplate_ppm,
           ${graft.text.HtmlExtract.sqlNParas("clean_text")} AS n_paras
         FROM (SELECT doc_id, raw,
             ${graft.text.HtmlExtract.sqlCleanText("raw")} AS clean_text
           FROM (SELECT doc_id, $raw AS raw FROM documents))"""
    },
    "q_html_quality" -> {
      val raw = sqlHtmlize("doc_id", "text")
      s"""SELECT doc_id,
           CAST(len(string_split(flat, ' ')) AS BIGINT) AS n_tokens,
           ${graft.text.HtmlExtract.sqlBoilerplatePpm("raw", "flat")}
             AS boilerplate_ppm,
           ${graft.text.HtmlExtract.sqlLinkDensityPpm("raw", "flat")}
             AS link_density_ppm
         FROM (SELECT doc_id, raw,
             replace(${graft.text.HtmlExtract.sqlCleanText("raw")},
               chr(10), ' ') AS flat
           FROM (SELECT doc_id, $raw AS raw FROM documents))
         WHERE ${TextFunctions.sqlQualityOk("flat")}"""
    },
    "q_text_quality" ->
      s"""SELECT lang, COUNT(1) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           ${sqlExactAvg("CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE) / len(string_split(text,' '))", 6)} AS avg_word_len,
           ${sqlExactAvg(s"CAST(${sqlLangScore("text", TextFunctions.Stopwords)} AS DOUBLE) / len(string_split(text,' '))", 6)} AS avg_stopword_ratio
         FROM documents GROUP BY lang""",
    "q_token_stats" ->
      s"""SELECT lang, source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(${TextFunctions.sqlBpeTokenCount("text")}) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS est_bpe_tokens
         FROM documents GROUP BY lang, source""",
    "q_fingerprint" ->
      s"""SELECT doc_id, ${sqlFingerprint("text")} AS fingerprint FROM documents""",
    "q_chunking" -> graft.pipeline.Chunking.sqlChunkTokens(64, 48),
    // the oracle reads the ORIGINAL parquet — only a faithful
    // sink→source roundtrip on the Spark side reproduces the sums
    "q_csv_roundtrip" ->
      s"""SELECT lang, COUNT(1) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(${sqlFingerprint("text")}) AS BIGINT) AS fp_sum
         FROM documents GROUP BY lang""",
    "q_text_roundtrip" ->
      s"""SELECT COUNT(1) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_chars,
           CAST(SUM(${sqlFingerprint("text")}) AS BIGINT) AS fp_sum
         FROM documents""",
    "q_quality_filter" ->
      s"""WITH q AS (
           SELECT lang,
             len(string_split(text, ' ')) AS nt,
             length(text) - len(string_split(text, ' ')) + 1 AS wl,
             ${sqlLangScore("text", TextFunctions.Stopwords)} AS ns
           FROM documents)
         SELECT lang,
           CASE WHEN nt < ${TextFunctions.QualityMinTokens} THEN 'too_short'
                WHEN wl > nt * ${TextFunctions.QualityMaxAvgWordLen} THEN 'long_words'
                WHEN ns * ${TextFunctions.QualityStopwordDen} < nt THEN 'low_stopword'
                ELSE 'ok' END AS verdict,
           COUNT(1) AS n_docs
         FROM q GROUP BY 1, 2""",
    "q_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
                     FROM embeddings WHERE vec_id < 10),
         sims AS (
           SELECT qid, c.vec_id AS cid, c.label AS neg_label,
             ${Similarity.sqlSimRounded("qv", "c.embedding", 64)} AS sim
           FROM q JOIN embeddings c
             ON qid <> c.vec_id AND qlabel <> c.label),
         ranked AS (
           SELECT qid, cid, neg_label, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
           FROM sims)
         SELECT qid, cid, neg_label, sim, rk FROM ranked WHERE rk <= 5""",
    // semi-hard band in exact 1e-6-unit longs: pos_simq = hardest
    // positive, negatives kept iff pos_simq - 100000 <= simq < pos_simq
    "q_semi_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
                     FROM embeddings WHERE vec_id < 10),
         pos AS (
           SELECT qid,
             MAX(CAST(round((${Similarity.sqlCosine("qv", "c.embedding", 64)}) * 1e6) AS BIGINT)) AS pos_simq
           FROM q JOIN embeddings c
             ON qid <> c.vec_id AND qlabel = c.label
           GROUP BY qid),
         cands AS (
           SELECT qid, c.vec_id AS cid, c.label AS neg_label,
             CAST(round((${Similarity.sqlCosine("qv", "c.embedding", 64)}) * 1e6) AS BIGINT) AS simq,
             p.pos_simq
           FROM q JOIN pos p USING (qid)
             JOIN embeddings c ON qid <> c.vec_id AND qlabel <> c.label),
         band AS (
           SELECT * FROM cands
           WHERE simq < pos_simq AND simq >= pos_simq - 100000),
         ranked AS (
           SELECT qid, cid, neg_label, simq, pos_simq,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY simq DESC, cid) AS INT) AS rk
           FROM band)
         SELECT qid, cid, neg_label, simq / 1e6 AS sim,
           pos_simq / 1e6 AS pos_sim, rk
         FROM ranked WHERE rk <= 5""",
    "q_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
         sims AS (
           SELECT qid, c.vec_id AS cid,
             ${Similarity.sqlSimRounded("qv", "c.embedding", 64)} AS sim
           FROM q JOIN embeddings c ON qid <> c.vec_id),
         ranked AS (
           SELECT qid, cid, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
           FROM sims)
         SELECT qid, cid, sim, rk FROM ranked WHERE rk <= 5""",
    // ANN oracles: every stage is exact-quantized (LSH plane sums in
    // 1e-6-unit longs, IVF centroid trajectory + cell argmins in
    // 1e-12-unit longs, similarity via the shared sqlSimRounded), so
    // bucket layouts and rankings replicate the Spark side
    // bit-for-bit. Recall vs brute force stays asserted in
    // SimilaritySpec — the oracle proves determinism, not quality.
    "q_knn_lsh" ->
      s"""WITH qb AS (
           SELECT vec_id AS qid, embedding AS qv,
             ${Similarity.sqlLshBucket("embedding", 8, 64)} AS b0
           FROM embeddings WHERE vec_id < 10),
         qp AS (
           SELECT qid, qv,
             unnest([b0, ${(0 until 8).map(p => s"xor(b0, ${1 << p})").mkString(", ")}]) AS bucket
           FROM qb),
         cb AS MATERIALIZED (
           SELECT vec_id AS cid, embedding AS cv,
             ${Similarity.sqlLshBucket("embedding", 8, 64)} AS bucket
           FROM embeddings),
         cand AS (
           SELECT qid, cid, ${Similarity.sqlSimRounded("qv", "cv", 64)} AS sim
           FROM qp JOIN cb USING (bucket) WHERE qid <> cid),
         ranked AS (
           SELECT qid, cid, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
           FROM cand)
         SELECT qid, cid, sim, rk FROM ranked WHERE rk <= 5""",
    "q_knn_ivf" ->
      s"""WITH ${Iterative.kmTrajectoryCtes(k = 16, iters = 3)},
         cb AS MATERIALIZED (
           SELECT p.vec_id AS cid, p.embedding AS cv, c.cid AS cell
           FROM pts p CROSS JOIN c3 c
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) = 1),
         qp AS (
           SELECT p.vec_id AS qid, p.embedding AS qv, c.cid AS cell
           FROM pts p CROSS JOIN c3 c
           WHERE p.vec_id < 10
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) <= 4),
         cand AS (
           SELECT qid, cid, ${Similarity.sqlSimRounded("qv", "cv", 64)} AS sim
           FROM qp JOIN cb USING (cell) WHERE qid <> cid),
         ranked AS (
           SELECT qid, cid, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
           FROM cand)
         SELECT qid, cid, sim, rk FROM ranked WHERE rk <= 5""",
    // kNN graph: the q_knn_ivf replay with the probe set = the whole
    // corpus (no vec_id bound) — every vector ranks its probed cells
    "q_knn_graph" ->
      s"""WITH $knnGraphCtes
         SELECT qid, cid, sim, rk FROM ranked WHERE rk <= 5""",
    // mutual-kNN clusters: the same graph, edges kept only where BOTH
    // directions are in the other's top-5, components via the
    // recursive closure (the q_embed_clusters pattern)
    "q_knn_clusters" ->
      s"""WITH RECURSIVE $knnGraphCtes,
         top5 AS (SELECT qid, cid FROM ranked WHERE rk <= 5),
         mp AS (
           SELECT a.qid AS va, a.cid AS vb FROM top5 a JOIN top5 b
           ON a.qid = b.cid AND a.cid = b.qid WHERE a.qid < a.cid),
         e AS (SELECT va AS u, vb AS v FROM mp UNION SELECT vb, va FROM mp),
         reach(node, lbl) AS (
           SELECT u, u FROM e
           UNION
           SELECT e2.v, r.lbl FROM reach r JOIN e e2 ON r.node = e2.u),
         comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
         SELECT cluster_id, COUNT(1) AS n_vecs, MAX(node) AS max_vec,
           CAST(SUM(node) AS BIGINT) AS sum_vec
         FROM comp GROUP BY cluster_id""",
    // label propagation: the q_knn_graph top-5 as the out-edge set,
    // 3 unrolled synchronous majority-vote rounds — each round's
    // votes come only from the PREVIOUS round's label frame
    // (materialized — referenced by the vote join, the unlabeled
    // anti-filter, and the union), ties to the smaller label
    "q_label_prop" -> {
      val seed = graft.pipeline.Sampling.sqlIdBucket("vec_id", 1000)
      val rounds = (1 to 3).map { t =>
        val p = t - 1
        s"""v$t AS (SELECT g.qid, l.label, COUNT(*) AS c
             FROM g JOIN l$p l ON g.cid = l.vec_id
             WHERE g.qid NOT IN (SELECT vec_id FROM l$p)
             GROUP BY 1, 2),
           n$t AS (SELECT qid AS vec_id, label, $t AS round FROM v$t
             QUALIFY row_number() OVER (PARTITION BY qid
               ORDER BY c DESC, label) = 1),
           l$t AS MATERIALIZED (
             SELECT * FROM l$p UNION ALL SELECT * FROM n$t)"""
      }
      s"""WITH $knnGraphCtes,
         g AS MATERIALIZED (SELECT qid, cid FROM ranked WHERE rk <= 5),
         l0 AS MATERIALIZED (
           SELECT vec_id, label, 0 AS round FROM embeddings
           WHERE $seed < ${TextOps.LabelPropSeedMills}),
         ${rounds.mkString(",\n         ")}
         SELECT vec_id, label, round FROM l3"""
    },
    // bitext mining: cb/qp reused from the kNN-graph CTEs, candidates
    // restricted to the two label pools in both directions, k=4
    // neighborhood sums, margin in integer ppm over positive-guarded
    // operands, mutual best = both row_numbers 1 over the same frame
    "q_bitext_mine" ->
      s"""WITH $knnGraphCtes,
         ab AS MATERIALIZED (
           SELECT qid AS aid, cid AS bid,
             CAST(round((${Similarity.sqlCosine("qv", "cv", 64)}) * 1e6) AS BIGINT) AS simq
           FROM qp JOIN cb USING (cell)
           WHERE qid IN (SELECT vec_id FROM embeddings WHERE label = 0)
             AND cid IN (SELECT vec_id FROM embeddings WHERE label = 1)),
         ba AS (
           SELECT cid AS aid, qid AS bid,
             CAST(round((${Similarity.sqlCosine("qv", "cv", 64)}) * 1e6) AS BIGINT) AS simq
           FROM qp JOIN cb USING (cell)
           WHERE qid IN (SELECT vec_id FROM embeddings WHERE label = 1)
             AND cid IN (SELECT vec_id FROM embeddings WHERE label = 0)),
         sa AS (SELECT aid, CAST(SUM(simq) AS BIGINT) AS sum_a,
               COUNT(*) AS cnt_a
             FROM (SELECT aid, simq, row_number() OVER (PARTITION BY aid
                 ORDER BY simq DESC, bid) AS rk FROM ab)
             WHERE rk <= 4 GROUP BY aid),
         sb AS (SELECT bid, CAST(SUM(simq) AS BIGINT) AS sum_b,
               COUNT(*) AS cnt_b
             FROM (SELECT bid, simq, row_number() OVER (PARTITION BY bid
                 ORDER BY simq DESC, aid) AS rk FROM ba)
             WHERE rk <= 4 GROUP BY bid),
         m AS MATERIALIZED (
           SELECT aid, bid,
             CAST((simq * (cnt_a + cnt_b) * 1000000) // (sum_a + sum_b)
               AS BIGINT) AS margin_ppm
           FROM ab JOIN sa USING (aid) JOIN sb USING (bid)
           WHERE simq > 0 AND sum_a + sum_b > 0)
         SELECT aid, bid, margin_ppm FROM (
           SELECT aid, bid, margin_ppm,
             row_number() OVER (PARTITION BY aid
               ORDER BY margin_ppm DESC, bid) AS ra,
             row_number() OVER (PARTITION BY bid
               ORDER BY margin_ppm DESC, aid) AS rb
           FROM m)
         WHERE ra = 1 AND rb = 1 AND margin_ppm >= ${TextOps.BitextMarginPpm}""",
    // growing IVF: quantizer trained on the EVEN half only (the base
    // write), assignment over ALL vectors (frozen-quantizer admission),
    // identical probe/rank contract - extents must be invisible
    "q_knn_grow" -> knnGrownOracle(),
    // compaction must ALSO be invisible to results (the other half of
    // the growth contract), so q_knn_compact shares the exact oracle
    "q_knn_compact" -> knnGrownOracle(),
    // tombstone deletes: the grow replay over the live corpus only
    "q_knn_delete" -> knnGrownOracle("WHERE p.vec_id % 7 <> 0"),
    // retrain ≡ fresh write of the live corpus: the KMeans trajectory
    // trains on the WHOLE live set (vec_id % 7 <> 0), not the even
    // half — new quantizer geometry is the point; the corpus
    // assignment covers the same live set, queries stay vec_id < 10
    "q_knn_retrain" -> knnGrownOracle(
      cbWhere = "WHERE p.vec_id % 7 <> 0",
      ptsWhere = "WHERE vec_id % 7 <> 0"),
    // filtered ANN: same replay with the label predicate applied to
    // the corpus assignment CTE — ranks over the allowed set only,
    // mirroring the scan-side filter in IvfIndex.searchGrown(pred)
    "q_knn_filtered" -> knnGrownOracle("WHERE p.label IN (1, 4, 7)"),
    // int8 IVF: the same KMeans trajectory + cell assignment, then the
    // quantizer of q_quantize_int8 (exact integer codes), the integer
    // dot candidate ranking (dotq / sqrt(normq) — scales cancel out of
    // cosine; dotq/normq exact longs, one fixed IEEE divide+sqrt) cut
    // to top-25, and the exact float re-rank — every stage replayed.
    "q_knn_ivf_int8" -> knnInt8Oracle(),
    // filtered int8 serving: the same replay with the label predicate
    // restricting the corpus-side assignment CTE — both the int8
    // candidate stage (incl. the top-25 cut) and the float re-rank
    // see allowed vectors only, mirroring searchInt8(pred)'s
    // scan-side filter
    "q_knn_filtered_int8" -> knnInt8Oracle(
      "WHERE p.vec_id IN (SELECT vec_id FROM embeddings WHERE label IN (1, 4, 7))"),
    // grown int8: trajectory trained on the even half (the base
    // write), corpus side = live vectors (deletes masked pre-rerank)
    "q_knn_grow_int8" -> knnInt8Oracle(
      cbWhere = "WHERE p.vec_id % 7 <> 0",
      ptsWhere = "WHERE vec_id % 2 = 0"),
    // int8 retrain ≡ fresh writeInt8 of the live corpus: trajectory
    // AND corpus side on vec_id % 7 <> 0 (queries stay vec_id < 10)
    "q_knn_retrain_int8" -> knnInt8Oracle(
      cbWhere = "WHERE p.vec_id % 7 <> 0",
      ptsWhere = "WHERE vec_id % 7 <> 0"),
  ) ++ oracleSqlTail

  /** Shared replay for the int8-IVF family (q_knn_ivf_int8 /
    * q_knn_filtered_int8): KMeans trajectory, exact-integer int8
    * quantization, integer-dot candidate ranking cut to top-25, float
    * re-rank. `cbWhere` optionally restricts the corpus-side
    * assignment CTE — the oracle twin of [[graft.sim.IvfIndex
    * .searchInt8]]'s scan-side metadata predicate. */
  private def knnInt8Oracle(cbWhere: String = "",
      ptsWhere: String = ""): String =
      s"""WITH ${Iterative.kmTrajectoryCtes(k = 16, iters = 3,
            ptsWhere = ptsWhere)},
         allp AS (SELECT vec_id, embedding FROM embeddings),
         xqv AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
           FROM embeddings),
         scq AS (SELECT vec_id, xq,
             list_max(list_transform(xq, v -> abs(v))) AS scale_q
           FROM xqv),
         cdz AS (SELECT vec_id,
             list_transform(xq, v -> CASE WHEN scale_q = 0 THEN 0
               ELSE (CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END)
                    * ((abs(v) * 254 + scale_q) // (scale_q * 2)) END) AS q
           FROM scq),
         nz AS (SELECT vec_id, q,
             CAST(COALESCE(list_sum(list_transform(q, v -> v * v)), 0) AS BIGINT) AS normq
           FROM cdz),
         cb AS MATERIALIZED (
           SELECT p.vec_id AS cid, p.embedding AS cv, n.q AS cq, n.normq, c.cid AS cell
           FROM allp p JOIN nz n ON p.vec_id = n.vec_id CROSS JOIN c3 c
           $cbWhere
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) = 1),
         qp AS (
           SELECT p.vec_id AS qid, p.embedding AS qv, n.q AS qq, c.cid AS cell
           FROM allp p JOIN nz n ON p.vec_id = n.vec_id CROSS JOIN c3 c
           WHERE p.vec_id < 10
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) <= 4),
         cand AS (
           SELECT qid, qv, cid, cv, normq,
             CAST(list_sum(list_transform(generate_series(1, 64), i -> qq[i] * cq[i])) AS BIGINT) AS dotq
           FROM qp JOIN cb USING (cell) WHERE qid <> cid),
         topc AS (
           SELECT qid, qv, cid, cv FROM (
             SELECT qid, qv, cid, cv,
               CASE WHEN normq = 0 THEN -1e9
                    ELSE CAST(dotq AS DOUBLE) / sqrt(CAST(normq AS DOUBLE)) END AS scoreq
             FROM cand)
           QUALIFY row_number() OVER (PARTITION BY qid
             ORDER BY scoreq DESC, cid) <= 25),
         rer AS (
           SELECT qid, cid, ${Similarity.sqlSimRounded("qv", "cv", 64)} AS sim
           FROM topc),
         ranked AS (
           SELECT qid, cid, sim,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rk
           FROM rer)
         SELECT qid, cid, sim, rk FROM ranked WHERE rk <= 5"""

  // lazy: referenced by oracleSql's initializer ABOVE its own
  // definition site — a plain val would still be null there
  private lazy val oracleSqlTail: Map[String, String] = Map(
    "q_quantize_int8" -> graft.sim.Quantize.sqlInt8Stats,
    "q_centroids" ->
      """WITH e AS (
           SELECT label, i - 1 AS d,
             CAST(round(embedding[i] * 1e6) AS BIGINT) AS q
           FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
         s AS (SELECT label, d, CAST(SUM(q) AS BIGINT) AS s, COUNT(1) AS n
               FROM e GROUP BY 1, 2)
         SELECT label, MAX(n) AS n_vecs,
           MAX(CASE WHEN d = 0 THEN s END) AS sum0_q,
           CAST(SUM((d + 1) * s) AS BIGINT) AS checksum
         FROM s GROUP BY label""",
    // full-square Gram over the same 1e-6-unit quantization; two
    // lateral unnests enumerate (i, j), 0-based to match the flat
    // div/mod key recovery on the Spark side
    "q_embed_gram" ->
      """WITH xq AS (
           SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
           FROM embeddings),
         pairs AS (
           SELECT a.i - 1 AS i, b.j - 1 AS j, xq.v[a.i] * xq.v[b.j] AS p
           FROM xq, unnest(generate_series(1, len(xq.v))) AS a(i),
                unnest(generate_series(1, len(xq.v))) AS b(j))
         SELECT i, j, CAST(SUM(p) AS BIGINT) AS gram
         FROM pairs GROUP BY i, j""",
    // strlen = UTF-8 BYTE length in DuckDB, mirroring MediaCodec.dims
    // (computed on text.getBytes at encode time); the character-count
    // length() would diverge on any non-ASCII doc. These oracles
    // replicate the ENCODER's dimension arithmetic — Spark's side
    // parses the dims back out of real PPM/BMP/PGM headers, so a
    // mis-parsed header hash-mismatches here.
    "q_multimodal" ->
      """WITH m AS (
           SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'ppm'
                  WHEN 1 THEN 'bmp' ELSE 'pgm' END AS format,
             8 + strlen(text) % 57 AS w,
             8 + (strlen(text) * 31) % 43 AS h
           FROM documents)
         SELECT format, COUNT(1) AS n,
           CAST(SUM(w) AS BIGINT) AS sum_width,
           CAST(SUM(h) AS BIGINT) AS sum_height,
           CAST(MAX(w) AS INT) AS max_width
         FROM m GROUP BY 1""",
    // PNG leg: all docs are truecolor (n = w*h*3, weights (1,1,1)),
    // so the q_multimodal_pixels closed form specializes to the rgb
    // case — if the inflate or any of the five filter reconstructions
    // were wrong, the decoded sums would not match this replay of the
    // pre-compression raster
    // GIF leg: grayscale palette raster (the PGM regime), lossless —
    // pixel q carries text byte (q mod len) replicated to rgb, so the
    // weight sum per pixel is 9q+6; a wrong LZW decode, a skipped
    // deinterlace, or a palette off-by-one all shift wsum_px
    "q_gif_decode" ->
      """WITH m AS (
           SELECT doc_id, text, strlen(text) AS len,
             (8 + strlen(text) % 57) * (8 + (strlen(text) * 31) % 43) AS n
           FROM documents),
         x AS (
           SELECT doc_id,
             ascii(substr(text, CAST(j + 1 AS INT), 1)) AS b,
             j, len, n, (n - 1 - j) // len + 1 AS cj
           FROM m, unnest(range(0, least(len, n))) AS t(j)),
         d AS (
           SELECT doc_id, SUM(3 * b * cj) AS px_sum,
             SUM(b * (9 * (cj * j + len * (cj * (cj - 1) // 2)) + 6 * cj))
               AS px_wsum
           FROM x GROUP BY doc_id)
         SELECT 'gif' AS format, COUNT(1) AS n_media,
           CAST(SUM(COALESCE(d.px_sum, 0)) AS BIGINT) AS sum_px,
           CAST(SUM(COALESCE(d.px_wsum, 0)) AS BIGINT) AS wsum_px
         FROM m LEFT JOIN d ON m.doc_id = d.doc_id""",
    // WebP-lossless: the identical PGM-regime closed form (VP8L is
    // lossless; only the format label differs from the GIF leg)
    "q_webp_decode" ->
      """WITH m AS (
           SELECT doc_id, text, strlen(text) AS len,
             (8 + strlen(text) % 57) * (8 + (strlen(text) * 31) % 43) AS n
           FROM documents),
         x AS (
           SELECT doc_id,
             ascii(substr(text, CAST(j + 1 AS INT), 1)) AS b,
             j, len, n, (n - 1 - j) // len + 1 AS cj
           FROM m, unnest(range(0, least(len, n))) AS t(j)),
         d AS (
           SELECT doc_id, SUM(3 * b * cj) AS px_sum,
             SUM(b * (9 * (cj * j + len * (cj * (cj - 1) // 2)) + 6 * cj))
               AS px_wsum
           FROM x GROUP BY doc_id)
         SELECT 'webp' AS format, COUNT(1) AS n_media,
           CAST(SUM(COALESCE(d.px_sum, 0)) AS BIGINT) AS sum_px,
           CAST(SUM(COALESCE(d.px_wsum, 0)) AS BIGINT) AS wsum_px
         FROM m LEFT JOIN d ON m.doc_id = d.doc_id""",
    "q_png_decode" ->
      """WITH m AS (
           SELECT doc_id, text, strlen(text) AS len,
             (8 + strlen(text) % 57) * (8 + (strlen(text) * 31) % 43) * 3 AS n
           FROM documents),
         x AS (
           SELECT doc_id,
             ascii(substr(text, CAST(j + 1 AS INT), 1)) AS b,
             j, len, n, (n - 1 - j) // len + 1 AS cj
           FROM m, unnest(range(0, least(len, n))) AS t(j)),
         d AS (
           SELECT doc_id, SUM(b * cj) AS px_sum,
             SUM(b * (cj * j + len * (cj * (cj - 1) // 2) + cj)) AS px_wsum
           FROM x GROUP BY doc_id)
         SELECT 'png' AS format, COUNT(1) AS n_media,
           CAST(SUM(COALESCE(d.px_sum, 0)) AS BIGINT) AS sum_px,
           CAST(SUM(COALESCE(d.px_wsum, 0)) AS BIGINT) AS wsum_px
         FROM m LEFT JOIN d ON m.doc_id = d.doc_id""",
    // baseline + progressive share ONE oracle builder (review r15 #5)
    // — the wire forms differ, the decoded raster must not
    "q_jpeg_decode" -> sqlJpegRasterOracle("jpeg"),
    "q_jpeg_progressive" -> sqlJpegRasterOracle("jpeg_prog"),
    // encoder-replay oracle for the decoded RASTER (not just headers):
    // the fixture's pixels are text bytes cycled to fill n raster
    // positions (n = w*h*3 rgb for ppm/bmp; w*h gray for pgm, which
    // decode replicates to rgb so gray index m covers rgb positions
    // 3m..3m+2 — plain weight 3, positional weight (3m+1)+(3m+2)+(3m+3)
    // = 9m+6). Text byte j lands at positions j, j+len, j+2len, ...,
    // i.e. cj = (n-1-j)//len + 1 times, so the decoded sums have the
    // closed forms
    //   px_sum  = Σ_j b_j · sb·cj
    //   px_wsum = Σ_j b_j · (wa·(cj·j + len·cj·(cj-1)//2) + wb·cj)
    // with (sb,wa,wb) = (1,1,1) for rgb and (3,9,6) for gray.
    // ascii(substr) == byte value because documents.text is pure
    // ASCII (strlen == length over all SFs, verified); all terms
    // non-negative so DuckDB's floor-div == truncation here.
    "q_multimodal_pixels" ->
      """WITH m AS (
           SELECT doc_id, text, strlen(text) AS len,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'ppm'
                  WHEN 1 THEN 'bmp' ELSE 'pgm' END AS format,
             8 + strlen(text) % 57 AS w,
             8 + (strlen(text) * 31) % 43 AS h
           FROM documents),
         p AS (
           SELECT doc_id, text, len, format,
             CASE WHEN format = 'pgm' THEN w*h ELSE w*h*3 END AS n,
             CASE WHEN format = 'pgm' THEN 3 ELSE 1 END AS sb,
             CASE WHEN format = 'pgm' THEN 9 ELSE 1 END AS wa,
             CASE WHEN format = 'pgm' THEN 6 ELSE 1 END AS wb
           FROM m),
         x AS (
           SELECT format, doc_id,
             ascii(substr(text, CAST(j + 1 AS INT), 1)) AS b,
             j, len, n, sb, wa, wb,
             (n - 1 - j) // len + 1 AS cj
           FROM p, unnest(range(0, least(len, n))) AS t(j)),
         d AS (
           SELECT format, doc_id,
             SUM(b * sb * cj) AS px_sum,
             SUM(b * (wa * (cj * j + len * (cj * (cj - 1) // 2)) + wb * cj)) AS px_wsum
           FROM x GROUP BY format, doc_id)
         -- LEFT JOIN from p: a zero-length text emits no x rows but its
         -- all-zero raster still counts one n_media with zero sums on
         -- the Spark side
         SELECT p.format, COUNT(1) AS n_media,
           CAST(SUM(COALESCE(d.px_sum, 0)) AS BIGINT) AS sum_px,
           CAST(SUM(COALESCE(d.px_wsum, 0)) AS BIGINT) AS wsum_px
         FROM p LEFT JOIN d ON p.doc_id = d.doc_id
         GROUP BY p.format""",
    "q_multimodal_resize" ->
      """WITH dims AS (
           SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'ppm'
                  WHEN 1 THEN 'bmp' ELSE 'pgm' END AS format,
             8 + strlen(text) % 57 AS w,
             8 + (strlen(text) * 31) % 43 AS h
           FROM documents)
         SELECT format, COUNT(1) AS n,
           CAST(SUM((w * 224) // greatest(w, h)) AS BIGINT) AS sum_rw,
           CAST(SUM((h * 224) // greatest(w, h)) AS BIGINT) AS sum_rh
         FROM dims GROUP BY format""",
    "q_multimodal_frames" ->
      """WITH m AS (
           SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'ppm'
                  WHEN 1 THEN 'bmp' ELSE 'pgm' END AS format,
             ((8 + strlen(text) % 57) * (8 + (strlen(text) * 31) % 43)) % 241 + 8 AS n_frames
           FROM documents),
         fr AS (SELECT format, unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx FROM m)
         SELECT format, COUNT(1) AS n_frames_sampled,
           CAST(SUM(frame_idx) AS BIGINT) AS sum_frame_idx
         FROM fr GROUP BY format""",
    // encoder-replay oracle for the perceptual dHash: raster pixel p
    // holds text byte (p % len) [+8 on the perturbed-variant leg when
    // (p % len) % 5 = 0 — ASCII, never wraps]; luma at a sampled grid
    // point is r+g+b for ppm/bmp and 3*gray for pgm (decode replicates
    // gray to rgb, so the same closed form). 8x8 grid at x=(i*w)//8,
    // y=(j*h)//8; bit (j,i) = [luma(i+1) > luma(i)] << (j*7+i); pairs
    // brute-forced at gate scale (banded join is lossless in-radius).
    // 56-bit fp stays positive, so BIGINT sums/shifts are exact twins.
    "q_image_dedup" -> {
      // byte value at raster position p (expanded inline per channel)
      def bv(p: String) =
        s"""(ascii(substr(text, CAST(($p) % len + 1 AS INT), 1))
            + CASE WHEN pert AND (($p) % len) % 5 = 0 THEN 8 ELSE 0 END)"""
      s"""WITH docs0 AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
         m AS (
           SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS fmt,
             text, len, FALSE AS pert FROM docs0
           UNION ALL
           SELECT doc_id + 10000000 AS media_id, CAST(doc_id % 3 AS INT) AS fmt,
             text, len, TRUE AS pert FROM docs0 WHERE doc_id % 20 = 0),
         d AS (SELECT m.*, 8 + len % 57 AS w, 8 + (len * 31) % 43 AS h FROM m),
         gp AS (SELECT media_id, fmt, text, len, pert, w, h, j, i,
                  (j*h)//8 AS y, (i*w)//8 AS x
                FROM d, unnest(range(0, 8)) t1(j), unnest(range(0, 8)) t2(i)),
         lu AS MATERIALIZED (SELECT media_id, j, i,
             CASE WHEN fmt = 2 THEN 3 * ${bv("y*w + x")}
               ELSE ${bv("3*(y*w + x)")} + ${bv("3*(y*w + x) + 1")}
                  + ${bv("3*(y*w + x) + 2")} END AS luma
           FROM gp),
         bits AS (SELECT a.media_id,
             CASE WHEN b.luma > a.luma
               THEN CAST(1 AS BIGINT) << (a.j*7 + a.i) ELSE 0 END AS bit
           FROM lu a JOIN lu b ON a.media_id = b.media_id AND a.j = b.j
             AND b.i = a.i + 1
           WHERE a.i < 7),
         fp AS (SELECT media_id, CAST(SUM(bit) AS BIGINT) AS fp
                FROM bits GROUP BY media_id)
         SELECT a.media_id AS ma, b.media_id AS mb,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         FROM fp a JOIN fp b ON a.media_id < b.media_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 7"""
    },
    // incremental image dedup: the image-fingerprint replay, then the
    // band join (shift/mask in SQL — the pigeonhole candidate step is
    // replicated, not brute-forced, because the index contract is
    // "within the radius of an INDEXED fp", which equals brute force
    // within the radius by losslessness) restricted delta-vs-indexed
    "q_image_dedup_index" -> {
      def bv(p: String) =
        s"""(ascii(substr(text, CAST(($p) % len + 1 AS INT), 1))
            + CASE WHEN pert AND (($p) % len) % 5 = 0 THEN 8 ELSE 0 END)"""
      s"""WITH docs0 AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
         m AS (
           SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS fmt,
             text, len, FALSE AS pert FROM docs0
           UNION ALL
           SELECT doc_id + 10000000 AS media_id, CAST(doc_id % 3 AS INT) AS fmt,
             text, len, TRUE AS pert FROM docs0 WHERE doc_id % 20 = 0),
         d AS (SELECT m.*, 8 + len % 57 AS w, 8 + (len * 31) % 43 AS h FROM m),
         gp AS (SELECT media_id, fmt, text, len, pert, w, h, j, i,
                  (j*h)//8 AS y, (i*w)//8 AS x
                FROM d, unnest(range(0, 8)) t1(j), unnest(range(0, 8)) t2(i)),
         lu AS MATERIALIZED (SELECT media_id, j, i,
             CASE WHEN fmt = 2 THEN 3 * ${bv("y*w + x")}
               ELSE ${bv("3*(y*w + x)")} + ${bv("3*(y*w + x) + 1")}
                  + ${bv("3*(y*w + x) + 2")} END AS luma
           FROM gp),
         bits AS (SELECT a.media_id,
             CASE WHEN b.luma > a.luma
               THEN CAST(1 AS BIGINT) << (a.j*7 + a.i) ELSE 0 END AS bit
           FROM lu a JOIN lu b ON a.media_id = b.media_id AND a.j = b.j
             AND b.i = a.i + 1
           WHERE a.i < 7),
         fp AS (SELECT media_id, CAST(SUM(bit) AS BIGINT) AS fp
                FROM bits GROUP BY media_id),
         bk AS (SELECT media_id, fp, b AS band_idx,
                  (fp >> (b * 7)) & 127 AS band_key
                FROM fp, unnest(range(0, 8)) t(b)),
         idx AS (SELECT * FROM bk
                 WHERE media_id % 2 = 0 AND media_id < 10000000),
         delta AS (SELECT * FROM bk
                   WHERE media_id % 2 = 1 OR media_id >= 10000000)
         SELECT DISTINCT d.media_id AS id, i.media_id AS dup_of,
           CAST(bit_count(xor(d.fp, i.fp)) AS BIGINT) AS hamming
         FROM delta d JOIN idx i ON d.band_idx = i.band_idx
           AND d.band_key = i.band_key
         WHERE bit_count(xor(d.fp, i.fp)) <= 7"""
    },
    // frame-fingerprint video dedup: frame f of a video is the still
    // raster scrolled by f pixels, so the grid replay is the image
    // oracle's with sampled pixel index m = (grid_pos + f) % (w*h);
    // the trimmed variant samples frames 10,20,... of the SAME text
    // (no perturbation). Pairing = exact distinct-fingerprint set
    // overlap, integer cross-multiplied Jaccard at 0.5.
    "q_video_dedup" -> {
      def bv(p: String) =
        s"ascii(substr(text, CAST(($p) % len + 1 AS INT), 1))"
      s"""WITH docs0 AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
         v AS (
           SELECT doc_id AS media_id, CAST(doc_id % 3 AS INT) AS fmt,
             text, len, 0 AS ff FROM docs0
           UNION ALL
           SELECT doc_id + 10000000 AS media_id, CAST(doc_id % 3 AS INT) AS fmt,
             text, len, 10 AS ff FROM docs0 WHERE doc_id % 20 = 0),
         d AS (SELECT v.*, 8 + len % 57 AS w, 8 + (len * 31) % 43 AS h FROM v),
         d2 AS (SELECT d.*, (w * h) % 241 + 8 AS n_frames FROM d),
         fr AS (SELECT media_id, fmt, text, len, w, h,
                  unnest(range(ff, n_frames, 10)) AS f
                FROM d2 WHERE n_frames > ff),
         gp AS (SELECT media_id, fmt, text, len, f, j, i,
                  ((j*h)//8 * w + (i*w)//8 + f) % (w*h) AS m
                FROM fr, unnest(range(0, 8)) t1(j), unnest(range(0, 8)) t2(i)),
         lu AS MATERIALIZED (SELECT media_id, f, j, i,
             CASE WHEN fmt = 2 THEN 3 * ${bv("m")}
               ELSE ${bv("3*m")} + ${bv("3*m + 1")} + ${bv("3*m + 2")} END AS luma
           FROM gp),
         fbits AS (SELECT a.media_id, a.f,
             CASE WHEN b.luma > a.luma
               THEN CAST(1 AS BIGINT) << (a.j*7 + a.i) ELSE 0 END AS bit
           FROM lu a JOIN lu b ON a.media_id = b.media_id AND a.f = b.f
             AND a.j = b.j AND b.i = a.i + 1
           WHERE a.i < 7),
         fp AS (SELECT DISTINCT media_id, fp FROM (
             SELECT media_id, f, CAST(SUM(bit) AS BIGINT) AS fp
             FROM fbits GROUP BY media_id, f)),
         sets AS (SELECT media_id, count(*) AS n FROM fp GROUP BY media_id),
         cand AS (SELECT DISTINCT a.media_id AS ma, b.media_id AS mb
                  FROM fp a JOIN fp b ON a.fp = b.fp AND a.media_id < b.media_id),
         cm AS (SELECT c.ma, c.mb, count(*) AS common
                FROM cand c JOIN fp a ON a.media_id = c.ma
                  JOIN fp b ON b.media_id = c.mb AND b.fp = a.fp
                GROUP BY 1, 2)
         SELECT cm.ma, cm.mb, cm.common, sa.n AS na, sb.n AS nb
         FROM cm JOIN sets sa ON cm.ma = sa.media_id
           JOIN sets sb ON cm.mb = sb.media_id
         WHERE cm.common * 1000 >= 500 * (sa.n + sb.n - cm.common)"""
    },
    // encoder-replay oracle for the audio fingerprint: sample i holds
    // (byte(i % len) - 128) << 8, so |sample| = 256*|byte-128| and the
    // 256 cancels in the gradient comparisons — the oracle sums
    // |byte-128| per 4-sample window at the 57 anchors k*n//57 and
    // compares consecutive windows, exactly AudioHash.energyHash56.
    "q_audio_dedup" -> {
      def bv(p: String) =
        s"""(ascii(substr(text, CAST(($p) % len + 1 AS INT), 1))
            + CASE WHEN pert AND (($p) % len) % 5 = 0 THEN 8 ELSE 0 END)"""
      s"""WITH docs0 AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
         m AS (
           SELECT doc_id AS media_id, text, len, FALSE AS pert FROM docs0
           UNION ALL
           SELECT doc_id + 10000000 AS media_id, text, len, TRUE AS pert
           FROM docs0 WHERE doc_id % 20 = 0),
         d AS (SELECT m.*, 500 + (len * 17) % 4000 AS n FROM m),
         e AS MATERIALIZED (
           SELECT media_id, k, SUM(ABS(${bv("(k*n)//57 + i")} - 128)) AS energy
           FROM d, unnest(range(0, 57)) t1(k), unnest(range(0, 4)) t2(i)
           GROUP BY media_id, k),
         bits AS (SELECT a.media_id,
             CASE WHEN b.energy > a.energy
               THEN CAST(1 AS BIGINT) << a.k ELSE 0 END AS bit
           FROM e a JOIN e b ON a.media_id = b.media_id AND b.k = a.k + 1
           WHERE a.k < 56),
         fp AS (SELECT media_id, CAST(SUM(bit) AS BIGINT) AS fp
                FROM bits GROUP BY media_id)
         SELECT a.media_id AS ma, b.media_id AS mb,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         FROM fp a JOIN fp b ON a.media_id < b.media_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 7"""
    },
    "q_audio_stats" ->
      """WITH m AS (
           SELECT CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000
                  WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate,
             500 + (strlen(text) * 17) % 4000 AS n_samples
           FROM documents)
         SELECT sample_rate, COUNT(1) AS n,
           CAST(SUM((n_samples * 1000) // sample_rate) AS BIGINT) AS sum_duration_ms,
           CAST(MAX(n_samples) AS INT) AS max_samples
         FROM m GROUP BY 1""",
    "q_split" -> {
      import graft.pipeline.Sampling.sqlSplitLabel
      s"""SELECT ${sqlSplitLabel("doc_id")} AS split, lang,
           COUNT(1) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM documents GROUP BY 1, 2"""
    },
    "q_sample_stratified" -> {
      import graft.pipeline.Sampling.sqlIdBucket
      s"""SELECT lang, COUNT(1) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM documents WHERE ${sqlIdBucket("doc_id", 1000)} < 100
         GROUP BY lang"""
    },
    "q_mixture" -> {
      import graft.pipeline.Sampling.sqlMixtureFilter
      s"""SELECT lang, COUNT(1) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM documents
         WHERE ${sqlMixtureFilter("doc_id", "lang", MixRatesMills, MixDefaultMills)}
         GROUP BY lang"""
    },
    "q_repetition" ->
      s"""SELECT lang,
           CAST((${TextFunctions.sqlRepetitionMills("text")}) // 10 AS BIGINT)
             AS rep_pct,
           COUNT(1) AS n_docs
         FROM documents GROUP BY 1, 2""",
    "q_unigram_score" ->
      s"""WITH ${graft.text.CorpusScoring.sqlUnigramScoresCtes("documents")}
         SELECT lang, COUNT(1) AS n_docs, CAST(SUM(score) AS BIGINT) AS sum_score
         FROM ds GROUP BY lang""",
    "q_bigram_score" ->
      s"""WITH ${graft.text.CorpusScoring.sqlBigramScoresCtes("documents")}
         SELECT lang, COUNT(1) AS n_docs, CAST(SUM(score) AS BIGINT) AS sum_score
         FROM ds GROUP BY lang""",
    "q_trigram_score" ->
      s"""WITH ${graft.text.CorpusScoring.sqlTrigramScoresCtes("documents")}
         SELECT lang, COUNT(1) AS n_docs, CAST(SUM(score) AS BIGINT) AS sum_score
         FROM ds GROUP BY lang""",
    "q_crossdoc_ngrams" ->
      s"""WITH sh AS (SELECT doc_id, lang, unnest(${sqlShingles3("text")}) AS s
             FROM documents),
         df AS (SELECT s, COUNT(1) AS df FROM sh GROUP BY s),
         d AS (SELECT doc_id, lang,
                 (CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
                   // COUNT(1) AS m
               FROM sh JOIN df USING (s) GROUP BY doc_id, lang)
         SELECT lang, m // 100 AS dup_decile, COUNT(1) AS n_docs
         FROM d GROUP BY 1, 2""",
    "q_percentiles" ->
      """WITH r AS (
           SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(1) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT lang, COUNT(1) AS n_docs,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90
         FROM r GROUP BY lang""",
    "q_top_tokens" ->
      """WITH c AS (
           SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
         n AS (SELECT lang, tok, COUNT(1) AS n FROM c GROUP BY 1, 2)
         SELECT lang,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS BIGINT) AS rk,
           tok, n
         FROM n QUALIFY rk <= 10""",
    "q_distinctive_tokens" ->
      """WITH c AS (
           SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
         cl AS (SELECT lang, tok, COUNT(1) AS n FROM c GROUP BY 1, 2),
         cg AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS g FROM cl GROUP BY tok),
         r AS (SELECT lang, tok, n,
                 CAST((n * 1000000) // g AS BIGINT) AS ratio_ppm
               FROM cl JOIN cg USING (tok) WHERE n >= 5)
         SELECT lang,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY ratio_ppm DESC, n DESC, tok) AS BIGINT) AS rk,
           tok, ratio_ppm, n
         FROM r QUALIFY rk <= 10""",
    // all factors non-negative, so DuckDB floor-div == Spark div here
    "q_tfidf_terms" ->
      """WITH dt AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, COUNT(1) AS tf FROM dt GROUP BY 1, 2),
         len AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1),
         dfreq AS (SELECT tok, COUNT(1) AS df FROM tf GROUP BY 1),
         nd AS (SELECT COUNT(1) AS nd FROM documents),
         s AS (SELECT tf.doc_id, tf.tok,
                 CAST((CAST(tf.tf AS HUGEINT) * 1000000 * nd.nd) // (len.len * dfreq.df) AS BIGINT)
                   AS score_ppm
               FROM tf JOIN len USING (doc_id) JOIN dfreq USING (tok)
                 CROSS JOIN nd)
         SELECT doc_id, tok, score_ppm FROM s
         QUALIFY row_number() OVER (PARTITION BY doc_id
           ORDER BY score_ppm DESC, tok) <= 3""",
    "q_sample_fixed" -> {
      import graft.pipeline.Sampling.sqlIdBucket
      s"""SELECT doc_id, lang, n_chars FROM documents
         ORDER BY ${sqlIdBucket("doc_id", 1000000)}, doc_id LIMIT 100"""
    },
    // CAST epoch: Spark's sequence() yields INT, DuckDB's
    // generate_series BIGINT
    "q_epoch_shuffle" ->
      s"""SELECT CAST(epoch AS INT) AS epoch, shard, pos, doc_id
         FROM (${graft.pipeline.Sampling.sqlEpochShuffle(
            "(SELECT doc_id FROM documents)", "doc_id",
            epochs = 2, shards = 8)})""",
    "q_sample_per_group" -> {
      import graft.pipeline.Sampling.sqlIdBucket
      s"""SELECT lang,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY ${sqlIdBucket("doc_id", 1000000)}, doc_id) AS BIGINT) AS rk,
           doc_id, n_chars
         FROM documents QUALIFY rk <= 20"""
    },
    "q_sample_weighted" -> {
      import graft.pipeline.Sampling.sqlWeightedPriority
      s"""SELECT lang,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY ${sqlWeightedPriority("doc_id", "n_chars")}, doc_id)
             AS BIGINT) AS rk,
           doc_id, n_chars
         FROM documents QUALIFY rk <= 5"""
    },
    "q_pack" -> {
      val inner = graft.pipeline.Packing.sqlPackCte(
        "(SELECT doc_id, (n_chars + 3) // 4 AS est_tokens FROM documents)",
        "doc_id", "est_tokens", budget = 2048, shards = 64)
      s"""SELECT shard, pack, COUNT(1) AS n_docs,
           CAST(SUM(est_tokens) AS BIGINT) AS n_tokens
         FROM ($inner) GROUP BY shard, pack"""
    },
    "q_decontaminate" -> graft.pipeline.Decontaminate.sqlFlagOverlap(
      s"${graft.pipeline.Sampling.sqlIdBucket("doc_id", 1000)} < 20 AND doc_id < 1000",
      minCommon = 3),
    "q_snapshot_diff" -> {
      import graft.pipeline.Sampling.sqlIdBucket
      s"""WITH fp AS (SELECT doc_id, ${sqlFingerprint("text")} AS fp,
             ${sqlIdBucket("doc_id", 1000)} AS b FROM documents),
         prev AS (SELECT doc_id AS key, fp AS fp_prev FROM fp),
         nxt AS (
           SELECT doc_id AS key,
             CASE WHEN b < 50 THEN fp + 1 ELSE fp END AS fp_next
           FROM fp WHERE b < 900
           UNION ALL
           SELECT doc_id + (1::BIGINT << 40), fp FROM fp WHERE b >= 50 AND b < 60),
         d AS (SELECT CASE WHEN fp_prev IS NULL THEN 'added'
                 WHEN fp_next IS NULL THEN 'removed'
                 WHEN fp_prev = fp_next THEN 'same'
                 ELSE 'changed' END AS status
               FROM prev FULL OUTER JOIN nxt USING (key))
         SELECT status, COUNT(1) AS n FROM d GROUP BY status"""
    },
    "q_upsert" -> {
      import graft.pipeline.Sampling.sqlIdBucket
      s"""WITH src AS (SELECT doc_id, text, lang,
             ${sqlIdBucket("doc_id", 1000)} AS b FROM documents),
         delta AS (
           SELECT doc_id, text || ' v2' AS text, lang FROM src WHERE b < 50
           UNION ALL
           SELECT doc_id + (1::BIGINT << 40), text, lang
           FROM src WHERE b >= 50 AND b < 60),
         merged AS (
           SELECT doc_id, text, lang FROM delta
           UNION ALL
           SELECT doc_id, text, lang FROM src
           WHERE doc_id NOT IN (SELECT doc_id FROM delta))
         SELECT lang, COUNT(1) AS n_docs,
           CAST(SUM(${sqlFingerprint("text")}) AS BIGINT) AS fp_sum
         FROM merged GROUP BY lang"""
    },
  )
}
