package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.text.{Retrieval, TextFunctions}

/** Corpus-mining queries: retrieval, model distillation, communities,
  * semantic dedup — the "use the corpus to improve the corpus" family
  * a training-data pipeline runs after cleaning (round 11; registry
  * split out of TextOps to keep module sizes reviewable).
  */
object MiningOps {

  /** Query-set bound for [[qBm25TopK]]: doc_id is unique, so the
    * id-window filter admits at most this many query docs at ANY SF;
    * the limit makes the bound PLAN-VISIBLE for the suite-wide
    * broadcast audit (same discipline as TextOps.knnQueries). */
  val Bm25Queries = 40
  /** First-N distinct tokens of a query doc that form its query. */
  val Bm25Terms = 5
  /** Results per query. */
  val Bm25K = 3

  /** The shared bounded query set: the first [[Bm25Queries]] docs,
    * each query its doc's first [[Bm25Terms]] distinct tokens —
    * ONE definition for the bm25/hybrid family so the three queries'
    * query sets can't diverge (the knnQueries discipline). */
  private def bm25QuerySet(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") < Bm25Queries).limit(Bm25Queries)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(
          slice(TextFunctions.tokens(col("text")), 1, Bm25Terms))).as("tok"))

  /** The query docs' embedding rows (same id window, plan-visible
    * bound). */
  private def bm25QVecs(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < Bm25Queries).limit(Bm25Queries)

  /** BM25 top-k retrieval ([[graft.text.Retrieval]]): the first 40
    * docs act as the bounded "benchmark" query set, each query being
    * its doc's first 5 distinct tokens, ranked against the whole
    * corpus. */
  def qBm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Retrieval.bm25TopK(docs, bm25QuerySet(docs), Bm25K)
  }

  // ---- served lexical index ([[graft.text.PostingsIndex]]) ------------
  //
  // The same bounded query set as q_bm25_topk runs against the
  // PERSISTED inverted index instead of a one-shot corpus scan — and
  // the lifecycle queries assert the serving invariant that matters:
  // search over base+extents−tombstones equals brute-force BM25 over
  // exactly the live doc set (stats, df and ranks included), which is
  // what each oracle replays with a docs-universe predicate.

  /** Live-universe predicate pieces shared by the lifecycle queries
    * (and their oracles): base = doc_id%3==0, admitted batches
    * %3==1 / %3==2, forgotten = indexed ids with doc_id%5==0. */
  private val Bm25ForgetPred = "doc_id % 3 < 2 AND doc_id % 5 = 0"

  /** BM25 top-k served from a written [[graft.text.PostingsIndex]]
    * over the full corpus — must equal q_bm25_topk exactly (same
    * oracle SQL: the index path is pure machinery, not semantics). */
  def qBm25Index(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.text.PostingsIndex.write(docs, "graft_q_bm25_index")
    graft.text.PostingsIndex.search(spark, "graft_q_bm25_index",
      bm25QuerySet(docs), Bm25K)
  }

  /** Growing lexical index: base (doc_id%3==0) + two admitted batches
    * (%3==1, %3==2), searched — equals brute-force BM25 over ALL docs
    * (the monolithic q_bm25_topk oracle), proving admission changes
    * nothing but the storage layout. */
  def qBm25Grow(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_bm25_grow"
    graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 3 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_bm25_grow") { root =>
      (1 to 2).foreach(k => graft.text.PostingsIndex.admit(spark, table,
        root, docs.filter(col("doc_id") % 3 === k), k - 1L))
      graft.text.PostingsIndex.searchGrown(spark, table, root,
        bm25QuerySet(docs), Bm25K)
    }
  }

  /** Forget predicate for [[qBm25Merge]]'s shard A — hits BOTH the
    * shard's base (%4==0 ∩ %3==0) and its extent (%4==2 ∩ %3==0), so
    * the merge provably applies tombstones from each storage class. */
  private val Bm25MergeForgetPred = "doc_id % 2 = 0 AND doc_id % 3 = 0"

  /** SHARD-MERGE of independently built lexical indexes (VERDICT r12
    * #6 — build shards in parallel, then serve ONE index): shard A =
    * evens with its own grow lifecycle (base %4==0, admitted extent
    * %4==2, forget [[Bm25MergeForgetPred]]), shard B = odds (plain
    * base). [[graft.text.PostingsIndex.merge]] folds live rows +
    * stats and applies A's tombstones; the merged index serves the
    * union. Live universe = all docs minus the forgotten evens
    * (doc_id % 6 != 0) — the oracle replays brute-force BM25 over
    * exactly that set, proving merged ≡ monolithic. */
  def qBm25Merge(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val (a, b, out) = ("graft_q_bm25_merge_a", "graft_q_bm25_merge_b",
      "graft_q_bm25_merge_out")
    // the two shard builds are the "build shards in parallel" half of
    // the merge story — actually overlapped since r18 (guide §2.6;
    // disjoint doc slices, disjoint tables)
    graft.api.Overlap.run(
      () => graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 4 === 0), a),
      () => graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 2 === 1), b))
    graft.api.Materialize.withTempRoot("graft_q_bm25_merge") { root =>
      graft.text.PostingsIndex.admit(spark, a, root,
        docs.filter(col("doc_id") % 4 === 2), 0L)
      graft.text.PostingsIndex.forget(spark, root,
        docs.filter(expr(Bm25MergeForgetPred)).select(col("doc_id")), 100L)
      graft.text.PostingsIndex.merge(spark,
        Seq(a -> Some(root), b -> None), out)
      graft.text.PostingsIndex.search(spark, out, bm25QuerySet(docs), Bm25K)
    }
  }

  /** Right-to-be-forgotten on the lexical index: base (%3==0) +
    * batch 1 (%3==1) admitted, then every indexed doc with
    * doc_id%5==0 is forgotten (tombstones only — no rewrite), then
    * searched. Equals brute-force BM25 over the live set — a
    * forgotten doc must vanish from results AND stop counting toward
    * df / N / avgdl. */
  def qBm25Forget(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_bm25_forget"
    graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 3 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_bm25_forget") { root =>
      graft.text.PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 3 === 1), 0L)
      graft.text.PostingsIndex.forget(spark, root,
        docs.filter(expr(Bm25ForgetPred)).select(col("doc_id")), 100L)
      graft.text.PostingsIndex.searchGrown(spark, table, root,
        bm25QuerySet(docs), Bm25K)
    }
  }

  /** The lexical-index lifecycle end-to-end: write base (%3==0),
    * admit batch 1 (%3==1), forget (%5==0 of the indexed), COMPACT
    * (tombstones applied physically, stats recomputed, dirs cleared),
    * then admit batch 2 (%3==2) against the compacted base and
    * search. Live universe = (base ∪ batch1 − forgotten) ∪ batch2.
    * There is no retrain leg: an inverted index has no trained state,
    * so compact closes the lifecycle (PostingsIndex scaladoc). */
  def qBm25Compact(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_bm25_compact"
    graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 3 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_bm25_compact") { root =>
      graft.text.PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 3 === 1), 0L)
      graft.text.PostingsIndex.forget(spark, root,
        docs.filter(expr(Bm25ForgetPred)).select(col("doc_id")), 100L)
      graft.text.PostingsIndex.compact(spark, table, root)
      graft.text.PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 3 === 2), 1L)
      graft.text.PostingsIndex.searchGrown(spark, table, root,
        bm25QuerySet(docs), Bm25K)
    }
  }

  /** Live-universe predicate for [[qBm25CompactTiered]]: the tiered
    * fixture's forget pass tombstones every indexed doc (base %10<8 ∪
    * batch-1 %10==8) with doc_id%4==0 — %4, NOT %5, deliberately:
    * x ≡ 8 (mod 10) forces x ≡ 3 (mod 5), so a %5 tombstone set could
    * never intersect the extent batch and the tiered compactor's
    * apply-tombstones-to-extents branch would be vacuously green
    * (review r12 finding); %4 hits both base docs (surviving
    * tombstones) and extent docs (applied physically). */
  private val Bm25TieredForgetPred = "doc_id % 10 < 9 AND doc_id % 4 = 0"

  /** SIZE-TIERED compaction of the lexical index, e2e (VERDICT r11
    * #4): base = doc_id%10<8 (so the admitted batch, %10==8, is
    * ~12.5% of the base — UNDER [[graft.text.PostingsIndex
    * .compactTiered]]'s 20% threshold, forcing the tiered path: the
    * base tables must not rewrite), forget ([[Bm25TieredForgetPred]]:
    * %4==0 of the indexed — %4, not %5, so tombstones hit both base
    * AND extent docs, see the predicate's scaladoc),
    * compactTiered (extents fold into ONE consolidated extent with
    * extent-hitting tombstones applied; base-hitting tombstones
    * survive and stay masked), then admit batch 2 (%10==9) and
    * search. Live universe = (%10<9 − forgotten) ∪ %10==9 — the same
    * shape as q_bm25_compact's, proving tiered ≡ full ≡ monolithic on
    * results. The file-level half of the contract (base parquet files
    * byte-identical, one consolidated extent partition, remaining
    * tombstones exactly the base-referencing ones) is pinned in
    * PostingsIndexSpec. */
  def qBm25CompactTiered(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_bm25_compact_tiered"
    graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 10 < 8), table)
    graft.api.Materialize.withTempRoot("graft_q_bm25_compact_tiered") { root =>
      graft.text.PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 8), 0L)
      graft.text.PostingsIndex.forget(spark, root,
        docs.filter(expr(Bm25TieredForgetPred)).select(col("doc_id")), 100L)
      graft.text.PostingsIndex.compactTiered(spark, table, root)
      graft.text.PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 9), 1L)
      graft.text.PostingsIndex.searchGrown(spark, table, root,
        bm25QuerySet(docs), Bm25K)
    }
  }

  /** Probe slice (mills of the id-hash space) for
    * [[qDecontaminateBloom]]: 15% of the corpus — an SF-SCALED probe
    * set, deliberately NOT the bounded-benchmark shape of
    * q_decontaminate, because the Bloom path exists precisely for
    * probe sets too big to broadcast raw. */
  val BloomProbeMills = 150

  /** Bloom-prefiltered decontamination
    * ([[graft.pipeline.Decontaminate.flagOverlapBloom]]): same
    * contract as q_decontaminate but the probe side stays distributed
    * — only its Bloom bitset broadcasts, and the exact verify join
    * runs keyed on the Bloom survivors. Oracle: the plain overlap SQL
    * (the Bloom filter is invisible to results by construction). */
  def qDecontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val isProbe =
      graft.pipeline.Sampling.sampleFilter(col("doc_id"), BloomProbeMills)
    graft.pipeline.Decontaminate.flagOverlapBloom(
      docs.filter(!isProbe), docs.filter(isProbe), minCommon = 3)
  }

  /** Merge-table size for [[qBpeTrain]] — well under the corpus's
    * mergeable-pair budget at every SF; if a corpus ever exhausts
    * earlier, both the Spark side and the unrolled oracle stop
    * identically (exhausted epoch CTEs are no-ops). */
  val BpeMerges = 12

  /** BPE tokenizer training ([[graft.text.Bpe]]): the 12-merge table
    * learned from the corpus — one corpus scan to the word-count
    * dictionary, then driver-local incremental merge training over
    * the vocab-bounded histogram (the production path; the oracle
    * replays the same trajectory as unrolled epoch CTEs, and BpeSpec
    * pins it bit-identical to the fully-distributed trainer). */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainFast(spark, t(spark, dir, "documents"), BpeMerges)

  /** BPE encoding ([[graft.text.Bpe.encodeVocabFast]]): the learned
    * merges applied corpus-wide — the subword vocabulary histogram
    * after 12 merges (each word's final segmentation weighted by its
    * corpus count; the corpus itself is scanned once). */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.encodeVocabFast(spark, t(spark, dir, "documents"),
      BpeMerges)

  /** Per-doc subword counts ([[graft.text.Bpe.docTokenCountsFast]]):
    * tokenizer-aware document lengths under the learned 12-merge
    * vocabulary — the budget/packing input. */
  def qBpeTokens(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.docTokenCountsFast(spark, t(spark, dir, "documents"),
      BpeMerges)

  /** Byte-fallback BPE training (r16, VERDICT r15 missing #5 — the
    * GPT-2-lineage leg): same trainer and argmax over the 256-symbol
    * BYTE alphabet (`b` + lowercase hex), which segments ANY input —
    * the no-OOV closure of the tokenizer family; the merge machinery
    * is [[graft.text.MergeMachine]] reused wholesale. */
  def qBpeBytesTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainFastBytes(spark, t(spark, dir, "documents"),
      BpeMerges)

  /** Per-doc subword counts under the learned byte-level vocabulary
    * ([[graft.text.Bpe.docTokenCountsFastBytes]]). */
  def qBpeBytesTokens(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.docTokenCountsFastBytes(spark,
      t(spark, dir, "documents"), BpeMerges)

  /** WordPiece tokenizer training ([[graft.text.Wordpiece]]): the
    * BERT-lineage sibling of qBpeTrain — merges chosen by the
    * quantized likelihood-gain score floor(c(ab)·10¹²/(c(a)·c(b)))
    * instead of raw pair frequency; driver-local production trainer,
    * oracle replays the scored trajectory as CTEs. */
  def qWordpieceTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Wordpiece.trainFast(spark, t(spark, dir, "documents"),
      BpeMerges)

  /** Per-doc subword counts under the learned wordpiece dictionary
    * ([[graft.text.Wordpiece.docTokenCountsFast]]). */
  def qWordpieceTokens(spark: SparkSession, dir: String): DataFrame =
    graft.text.Wordpiece.docTokenCountsFast(spark,
      t(spark, dir, "documents"), BpeMerges)

  /** Unigram-LM (SentencePiece-style) tokenizer training (r15) — the
    * third production family, completing the triad: a substring seed
    * pruned by hard-EM Viterbi rounds under engine-exact integer
    * quantized log costs ([[graft.text.Unigram]]). The oracle replays
    * the ENTIRE trajectory — qlog shift-and-square steps, the Viterbi
    * DP as a recursive CTE, pruning, the top-K cut — in SQL. */
  def qUnigramTrain(spark: SparkSession, dir: String): DataFrame =
    graft.text.Unigram.trainFast(spark, t(spark, dir, "documents"))

  /** Per-doc token counts under the trained unigram vocabulary —
    * the shared skew-safe dictionary join. */
  def qUnigramTokens(spark: SparkSession, dir: String): DataFrame =
    graft.text.Unigram.docTokenCountsFast(spark, t(spark, dir, "documents"))

  /** Context budget for [[qBpePack]] packs. */
  val BpePackBudget = 512L

  /** Tokenizer-aware sequence packing: q_pack's concat-and-chunk
    * assignment driven by REAL learned subword lengths
    * ([[graft.text.Bpe.docTokenCountsFast]]) instead of the
    * (n_chars+3)/4 proxy — what a production pipeline packs with
    * once the tokenizer exists. Same sharded window-cumsum shape. */
  def qBpePack(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Packing.packGreedy(
        graft.text.Bpe.docTokenCountsFast(spark, t(spark, dir, "documents"),
          BpeMerges),
        "doc_id", "n_subwords", budget = BpePackBudget, shards = 64)
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_subwords")).as("n_tokens"))

  /** Per-leg depth and fused result count for [[qHybridRetrieval]]. */
  val HybridEach = 10
  val HybridK = 5

  /** Hybrid lexical+semantic retrieval ([[Retrieval.hybridTopK]]):
    * the q_bm25_topk query set searched BOTH ways — BM25 over the
    * text and exact-quantized cosine over the query doc's embedding
    * row — fused with integer reciprocal-rank fusion. */
  def qHybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    Retrieval.hybridTopK(docs, emb, bm25QuerySet(docs), bm25QVecs(emb),
      HybridEach, HybridK)
  }

  /** Curriculum staging ([[graft.pipeline.Curriculum]]): the corpus
    * bucketed into 4 easy→hard stages by unigram typicality, stage
    * boundaries from a deterministic 256-doc sample's quartiles. */
  def qCurriculum(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curriculum.stages(t(spark, dir, "documents"))

  /** Target sample size for [[qTemperatureMix]]. */
  val TempMixBudget = 200L

  /** Temperature-rebalanced mixture
    * ([[graft.pipeline.Sampling.temperatureMix]]): per-lang quotas
    * ∝ isqrt(count) at a 200-doc budget, applied as self-adapting
    * hash keep-rates. */
  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.temperatureMix(
      t(spark, dir, "documents"), "lang", "doc_id", TempMixBudget)

  /** Selection size for [[qImportanceSelect]]. */
  val ImportanceK = 50

  /** DSIR importance selection ([[graft.pipeline.Importance]]): the
    * 50 non-English docs whose hashed token-bucket statistics look
    * most like the English pool — tilt-the-crawl data selection with
    * a bounded 128-bucket model. */
  def qImportanceSelect(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Importance.select(
      t(spark, dir, "documents"), col("lang") === "en", ImportanceK)

  /** The scale-path hybrid: same fusion contract, dense leg served
    * by the IVF probe ([[graft.sim.Similarity.ivfTopK]]) instead of
    * brute force — the swap hybridTopK's scaladoc promises, as a
    * declared oracle-checked query. Same recall contract as
    * q_knn_ivf (neighbors outside the probed cells are missed). */
  def qHybridIvf(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    val sem = graft.sim.Similarity.ivfTopK(emb, bm25QVecs(emb), HybridEach)
      .select(col("qid"), col("cid").as("id"), col("rk"))
    Retrieval.hybridFuse(
      Retrieval.lexRanked(docs, bm25QuerySet(docs), HybridEach),
      sem, HybridK)
  }

  /** FULLY-SERVED hybrid retrieval: the lex leg answered by the
    * persisted [[graft.text.PostingsIndex]] (self-excluded served
    * BM25) and the dense leg by the IVF probe — the shape a
    * 100 TB dataset-search actually deploys, where NEITHER leg may
    * re-scan the corpus per query batch. Leg contracts make it
    * drop-in: the oracle is q_hybrid_ivf's SQL verbatim, proving
    * served ≡ monolithic through the whole fusion. */
  def qHybridIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    // the lex-index build and the dense leg's eager driver work (the
    // oracle-pinned kMeans iteration collects + the bounded query
    // collect inside ivfTopK) touch disjoint inputs — overlapped
    // (guide §2.6, r18); the served lex search below still strictly
    // follows the write it reads
    val sem = new java.util.concurrent.atomic.AtomicReference[DataFrame]
    graft.api.Overlap.run(
      () => graft.text.PostingsIndex.write(docs, "graft_q_hybrid_index"),
      () => sem.set(
        graft.sim.Similarity.ivfTopK(emb, bm25QVecs(emb), HybridEach)
          .select(col("qid"), col("cid").as("id"), col("rk"))))
    Retrieval.hybridFuse(
      graft.text.PostingsIndex.lexRanked(spark, "graft_q_hybrid_index",
        bm25QuerySet(docs), HybridEach),
      sem.get, HybridK)
  }

  /** Quality-classifier distillation
    * ([[graft.pipeline.QualityModel]]): batch-perceptron weights
    * trained on the 80% id-band against the q_quality_filter rule
    * label, plus the held-out confusion matrix. */
  def qQualityDistill(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.QualityModel.distill(t(spark, dir, "documents"))

  /** Semantic packing (the in-context-pretraining data layout): docs
    * packed WITHIN their embedding cluster instead of an arbitrary
    * id-hash shard, so each fixed-budget training context holds
    * topically related documents. Cluster = the shared 16-cell
    * quantizer over the doc's embedding row (doc_id ≡ vec_id);
    * assignment replays exactly in the oracle, packing is the same
    * budget-aligned window cumsum as q_pack, partitioned by cell. */
  def qPackSemantic(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NearestCell
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    val pts = emb.select(col("vec_id").as("id"),
      col("embedding").as("features"))
    val cells = graft.graph.Algorithms.kMeansCentroids(pts, 16, 3)
    val clustered = docs
      .select(col("doc_id"), ((col("n_chars") + 3) / 4).cast("long")
        .as("est_tokens"))
      .join(emb.select(col("vec_id").as("doc_id"),
        NearestCell.nearestCell(col("embedding"), cells).as("cell")),
        Seq("doc_id"))
    graft.pipeline.Packing.packWithin(
        clustered, "cell", "doc_id", "est_tokens", budget = 2048)
      .groupBy(col("cell"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("est_tokens")).as("n_tokens"))
  }

  // ---- deterministic sketches ([[graft.sketch.Sketches]]) -------------

  /** Hash-space sampling rate for [[qDistinctSketch]] (1/16 of the
    * hash range survives the pre-distinct filter). */
  val SketchRate = 16
  /** Bottom-k size for [[qKmvDistinct]]. */
  val KmvK = 128
  /** Heavy-hitter cut for [[qCmsTopk]] (absolute occurrence
    * estimate). */
  val CmsThreshold = 900L

  /** Hash-range distinct estimator over lineitem order keys, next to
    * the exact answer: the distinct's exchange carries only the
    * ~1/16 of keys whose hash lands under the bound — the knob an
    * exact 100 TB count-distinct lacks. */
  def qDistinctSketch(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    graft.sketch.Sketches.distinctRangeEstimate(li, "l_orderkey", SketchRate)
      .crossJoin(broadcast(
        li.agg(count_distinct(col("l_orderkey")).as("exact"))))
  }

  /** KMV / bottom-k distinct estimator over part keys — the bounded-
    * state (k hashes), mergeable form that rides per-shard → global
    * rollups; the bottom-k is a TakeOrdered, never a global sort. */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    graft.sketch.Sketches.kmvEstimate(li, "l_partkey", KmvK)
      .crossJoin(broadcast(
        li.agg(count_distinct(col("l_partkey")).as("exact"))))
  }

  /** Count-min heavy hitters over the corpus token stream: the
    * sketch's groupBy partial-aggregates into a FIXED Depth×Width
    * counter space map-side (the exchange is ≤ 4096 rows per
    * partition regardless of corpus size), candidates then
    * point-query it and keep estimates over the cut. Output
    * (tok, est, cnt) — est ≥ cnt always (count-min is an upper
    * bound; collisions only inflate). */
  def qCmsTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.sketch.Sketches
    val docs = t(spark, dir, "documents")
    // cached: the tokenize + per-char polynomial hash pass feeds BOTH
    // the sketch build and the candidate counts — one corpus pass,
    // two readers (the PostingsIndex.write discipline)
    val tokv = docs
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("tok"), Sketches.tokVal(col("tok")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = Sketches.cmsSketch(tokv, col("v"))
    val cands = tokv.groupBy(col("tok"), col("v")).agg(count(lit(1)).as("cnt"))
    graft.api.Materialize.releasing(
      Sketches.cmsEstimate(sketch, cands)
        .filter(col("est") >= CmsThreshold)
        .select(col("tok"), col("est"), col("cnt")),
      Seq(tokv))
  }

  /** Phrase-query fixture for [[qBm25Phrase]]: for each query doc
    * (doc_id < PhraseQueries) the phrase is its first PhraseLen
    * tokens — guaranteed non-trivial, engine-derivable. */
  val PhraseQueries = 8
  val PhraseLen = 3

  private def phraseSet(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") < PhraseQueries)
      .select(col("doc_id").as("qid"),
        posexplode(slice(graft.text.TextFunctions.tokens(col("text")),
          1, PhraseLen)).as(Seq("off", "tok")))

  /** Served PHRASE match (VERDICT r11 #6 — positional postings): the
    * lexical index now stores each posting's in-doc position array,
    * so a phrase query answers from bucket-pruned candidate postings
    * + a position-offset adjacency check — no corpus rescan. Fixture:
    * base %3==0, admit %3==1, forget %5==0 of the indexed (the
    * q_bm25_forget universe), then each query doc's leading 3-gram is
    * phrase-matched over the live index. Oracle: token-position
    * shingle match over the live documents. Output
    * (qid, doc_id, n_occ). */
  def qBm25Phrase(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val table = "graft_q_bm25_phrase"
    graft.text.PostingsIndex.write(docs.filter(col("doc_id") % 3 === 0), table)
    graft.api.Materialize.withTempRoot("graft_q_bm25_phrase") { root =>
      graft.text.PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 3 === 1), 0L)
      graft.text.PostingsIndex.forget(spark, root,
        docs.filter(expr(Bm25ForgetPred)).select(col("doc_id")), 100L)
      graft.text.PostingsIndex.phraseSearchGrown(spark, table, root,
        phraseSet(docs))
    }
  }

  /** Percentiles the quantile-sketch queries read out. */
  val QsPercents = Seq(50, 90, 99)
  val QsGroupPercents = Seq(50, 90)

  /** Mergeable log-bucket quantile sketch over document lengths
    * (VERDICT r11 #5 — completes the sketch family with quantiles):
    * the corpus folds map-side into ≤ 63·16+1 bucket counters (the
    * CMS exchange shape — sketch-sized regardless of corpus), the
    * read-out interpolates integer-linearly inside the covering
    * bucket, and merge is counter add (per-half rollup ≡ global,
    * pinned in SketchesSpec). Worst-case relative error 1/16;
    * measured at 1M/10M rows in DevScaleSketch. Output (p, est). */
  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame =
    graft.sketch.Sketches.quantileSketchEstimate(
      t(spark, dir, "documents"), col("n_chars"), QsPercents)

  /** Per-group quantile sketch: P50/P90 document length per lang —
    * bounded per-group state, one map-side-combined exchange of
    * |groups|·buckets counter rows. Output (grp, p, est). */
  def qQuantilePerGroup(spark: SparkSession, dir: String): DataFrame =
    graft.sketch.Sketches.quantilePerGroup(
      t(spark, dir, "documents"), "lang", col("n_chars"), QsGroupPercents)

  /** Percentiles [[qQuantileBoundary]] reads out — 1 and 100 on
    * purpose (rank-1 and rank-n hit the first/last covering buckets,
    * the interpolation extremes). */
  val QsBoundaryPercents = Seq(1, 25, 50, 75, 99, 100)

  /** Full-long-domain boundary sweep of the quantile sketch (VERDICT
    * r12 #8 + ADVICE r12): doc_ids fold deterministically onto every
    * octave band 0–62 × sub-bucket 0–15 — including the band-62 top
    * sub-bucket whose exclusive bound both engines clamp to
    * Long.MaxValue — plus literal edges (0, 1, 2^59, 2^62−1, 2^62,
    * Long.MaxValue). Every fold and read-out product is overflow-free
    * by construction (shift-first bucketing; Decimal·div / HUGEINT·//
    * interpolation), and the oracle replays the identical integer
    * arithmetic, so engine parity is pinned ACROSS the domain, not
    * just at corpus-sized values. Output (p, est). */
  def qQuantileBoundary(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val band = col("doc_id") % 63L
    val base = call_function("shiftleft", lit(1L), band.cast("int"))
    val off = col("doc_id") % 16L
    val step = when(band >= 4L,
        call_function("shiftleft", off, (band - 4L).cast("int")))
      .otherwise(call_function("div", off * base, lit(16L)))
    val spread = t(spark, dir, "documents").select((base + step).as("v"))
    val edges = Seq(0L, 1L, 1L << 59, (1L << 62) - 1, 1L << 62,
      Long.MaxValue).toDF("v")
    graft.sketch.Sketches.quantileSketchEstimate(
      spread.unionByName(edges), col("v"), QsBoundaryPercents)
  }

  /** Bottom-k size for [[qKmvPerGroup]] — chosen so the gate SFs
    * exercise BOTH estimator branches: 15 distinct users/type at
    * sf0.001 (under-full → exact path), 150 at sf0.01 (full →
    * order-statistic path). */
  val KmvGroupK = 64

  /** KMV as a group aggregate: estimated distinct users per event
    * type next to the exact answer — the bounded-state rollup shape
    * ("distinct per language/source/day") where exact count-distinct
    * per group shuffles every key. */
  def qKmvPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    graft.sketch.Sketches.kmvPerGroup(ev, "event_type", "user_id", KmvGroupK)
      .withColumnRenamed("event_type", "grp")
      .join(ev.groupBy(col("event_type").as("grp"))
        .agg(count_distinct(col("user_id")).as("exact")), Seq("grp"))
  }

  /** Token-distribution drift between the train and test splits
    * ([[graft.pipeline.Drift.tokenShift]]): per-token ppm rates +
    * total-variation contribution, log-free so integer-exact. The
    * splits come from the SAME deterministic splitLabel the split
    * queries declare — the drift monitor watches the real pipeline's
    * slices, not ad-hoc ones. */
  def qTokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val label = graft.pipeline.Sampling.splitLabel(col("doc_id"))
    graft.pipeline.Drift.tokenShift(docs, col("text"),
      label === "train", label === "test")
  }

  /** Pre-flight join-size estimate
    * ([[graft.sketch.Sketches.cmsJoinSizeEstimate]]): how big is the
    * lineitem self-join on l_partkey, answered from the sketch
    * (two fixed counter arrays) next to the exact Σ cnt² — the check
    * a planner runs BEFORE committing to an expensive join at scale.
    * The estimate is an upper bound (CMS collisions only inflate). */
  def qJoinSizeSketch(spark: SparkSession, dir: String): DataFrame = {
    import graft.sketch.Sketches
    val li = t(spark, dir, "lineitem")
      .select(Sketches.longHash(col("l_partkey")).as("v"))
    val exact = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact"))
    // self-dot form: ONE sketch build (the two-sided call would scan
    // the corpus twice for an identical answer)
    Sketches.cmsSelfJoinSizeEstimate(li, col("v"))
      .crossJoin(broadcast(exact))
  }

  /** The curation pipeline composed end-to-end — quality filter →
    * exact-dedup keep-one → train split → sequence packing — with a
    * per-stage survivor count, the "a user runs their whole pipeline
    * on this library" smoke query. Every stage is the SAME operator
    * the standalone queries declare (shared thresholds, shared split
    * bands, shared pack assignment), so the composition can't drift
    * from the parts. Output: (stage, n) ordered by pipeline
    * position. */
  def qPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = t(spark, dir, "documents")
    // each surviving stage is persisted so the stage counts run
    // each stage ONCE (not re-derived per downstream count) — the
    // same discipline a real pipeline run uses
    // stage 2 (r14): domain reputation — drop blocked domains
    // WHOLESALE before any per-doc rule (the CCNet stage order)
    val rep = graft.pipeline.DomainReputation.rollup(docs)
    val domainKept = docs.join(
        rep.filter(col("reputation") =!= "blocked").select(col("source")),
        Seq("source"), "left_semi")
      .persist(MEMORY_AND_DISK)
    val ok = domainKept
      .filter(graft.text.TextFunctions.qualityOk(col("text")))
      .persist(MEMORY_AND_DISK)
    val keepW = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val deduped = ok.withColumn("rn", row_number().over(keepW))
      .filter(col("rn") === 1).drop("rn")
      .persist(MEMORY_AND_DISK)
    val train = deduped.filter(
        graft.pipeline.Sampling.splitLabel(col("doc_id")) === "train")
      .persist(MEMORY_AND_DISK)
    val packed = graft.pipeline.Packing.packGreedy(
      train.select(col("doc_id"),
        ((col("n_chars") + 3) / 4).cast("long").as("est_tokens")),
      "doc_id", "est_tokens", budget = 2048, shards = 64)
    import spark.implicits._
    val out = Seq(
      (1, "raw", docs.count()), (2, "domain_keep", domainKept.count()),
      (3, "quality_ok", ok.count()),
      (4, "dedup_keep", deduped.count()), (5, "train_split", train.count()),
      (6, "packs",
        packed.select(col("shard"), col("pack")).distinct().count()))
      .toDF("pos", "stage", "n")
    Seq(domainKept, ok, deduped, train)
      .foreach(_.unpersist(blocking = false))
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_e2e" -> (qPipelineE2e _),
    "q_pack_semantic" -> (qPackSemantic _),
    "q_bm25_topk" -> (qBm25TopK _),
    "q_bm25_index" -> (qBm25Index _),
    "q_bm25_grow" -> (qBm25Grow _),
    "q_bm25_forget" -> (qBm25Forget _),
    "q_bm25_merge" -> (qBm25Merge _),
    "q_bm25_compact" -> (qBm25Compact _),
    "q_bm25_compact_tiered" -> (qBm25CompactTiered _),
    "q_bm25_phrase" -> (qBm25Phrase _),
    "q_bpe_train" -> (qBpeTrain _),
    "q_bpe_bytes_train" -> (qBpeBytesTrain _),
    "q_bpe_bytes_tokens" -> (qBpeBytesTokens _),
    "q_wordpiece_train" -> (qWordpieceTrain _),
    "q_unigram_train" -> (qUnigramTrain _),
    "q_unigram_tokens" -> (qUnigramTokens _),
    "q_wordpiece_tokens" -> (qWordpieceTokens _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_bpe_tokens" -> (qBpeTokens _),
    "q_bpe_pack" -> (qBpePack _),
    "q_curriculum" -> (qCurriculum _),
    "q_distinct_sketch" -> (qDistinctSketch _),
    "q_kmv_distinct" -> (qKmvDistinct _),
    "q_kmv_per_group" -> (qKmvPerGroup _),
    "q_join_size_sketch" -> (qJoinSizeSketch _),
    "q_token_drift" -> (qTokenDrift _),
    "q_cms_topk" -> (qCmsTopk _),
    "q_quantile_sketch" -> (qQuantileSketch _),
    "q_quantile_per_group" -> (qQuantilePerGroup _),
    "q_quantile_boundary" -> (qQuantileBoundary _),
    "q_decontaminate_bloom" -> (qDecontaminateBloom _),
    "q_hybrid_retrieval" -> (qHybridRetrieval _),
    "q_hybrid_ivf" -> (qHybridIvf _),
    "q_hybrid_index" -> (qHybridIndex _),
    "q_importance_select" -> (qImportanceSelect _),
    "q_quality_distill" -> (qQualityDistill _),
    "q_temperature_mix" -> (qTemperatureMix _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_e2e" -> {
      import graft.text.TextFunctions
      val band = graft.pipeline.Sampling.sqlIdBucket("doc_id", 1000)
      s"""WITH ${graft.pipeline.DomainReputation.sqlRollupCte},
         dk AS (SELECT doc_id, text, n_chars FROM documents
           JOIN rep USING (source) WHERE rep.reputation <> 'blocked'),
         ok AS (SELECT doc_id, text, n_chars FROM dk
           WHERE ${TextFunctions.sqlQualityOk("text")}),
         ded AS (SELECT doc_id, n_chars FROM (
             SELECT doc_id, n_chars, row_number() OVER (PARTITION BY text
               ORDER BY doc_id) AS rn FROM ok)
           WHERE rn = 1),
         tr AS (SELECT doc_id, n_chars FROM ded WHERE $band < 800),
         pk AS (SELECT DISTINCT shard, pack FROM
           (${graft.pipeline.Packing.sqlPackCte(
              "(SELECT doc_id, (n_chars + 3) // 4 AS est_tokens FROM tr) tp",
              "doc_id", "est_tokens", 2048, 64)}))
         SELECT 1 AS pos, 'raw' AS stage,
           (SELECT COUNT(1) FROM documents) AS n
         UNION ALL SELECT 2, 'domain_keep', (SELECT COUNT(1) FROM dk)
         UNION ALL SELECT 3, 'quality_ok', (SELECT COUNT(1) FROM ok)
         UNION ALL SELECT 4, 'dedup_keep', (SELECT COUNT(1) FROM ded)
         UNION ALL SELECT 5, 'train_split', (SELECT COUNT(1) FROM tr)
         UNION ALL SELECT 6, 'packs', (SELECT COUNT(1) FROM pk)"""
    },
    "q_bm25_topk" -> Retrieval.sqlBm25TopK(
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    // the served-index family: the index path must be INVISIBLE in
    // the results, so index and grow replay the monolithic BM25
    // oracle verbatim, and forget/compact restrict its doc universe
    // to the live set
    "q_bm25_index" -> Retrieval.sqlBm25TopK(
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    "q_bm25_grow" -> Retrieval.sqlBm25TopK(
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    "q_bm25_forget" -> Retrieval.sqlBm25TopKLive(
      s"doc_id % 3 < 2 AND NOT ($Bm25ForgetPred)",
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    "q_bm25_merge" -> Retrieval.sqlBm25TopKLive(
      "doc_id % 6 <> 0",
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    "q_bm25_compact" -> Retrieval.sqlBm25TopKLive(
      s"(doc_id % 3 < 2 AND NOT ($Bm25ForgetPred)) OR doc_id % 3 = 2",
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    "q_bm25_compact_tiered" -> Retrieval.sqlBm25TopKLive(
      s"(doc_id % 10 < 9 AND NOT ($Bm25TieredForgetPred)) OR doc_id % 10 = 9",
      s"doc_id < $Bm25Queries", Bm25Terms, Bm25K),
    // phrase oracle: token-position shingle match over the LIVE doc
    // set — start = token position − phrase offset; a (qid, doc,
    // start) group covering all distinct offsets is one occurrence
    "q_bm25_phrase" ->
      s"""WITH toks AS (SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS i
           FROM documents
           WHERE doc_id % 3 < 2 AND NOT ($Bm25ForgetPred)),
         ph AS (SELECT qid, tok, i AS off FROM (
             SELECT doc_id AS qid,
               unnest(string_split(text, ' ')) AS tok,
               unnest(generate_series(1, len(string_split(text, ' ')))) AS i
             FROM documents WHERE doc_id < $PhraseQueries)
           WHERE i <= $PhraseLen),
         plen AS (SELECT qid, COUNT(DISTINCT off) AS m FROM ph GROUP BY 1),
         hits AS (SELECT ph.qid, t.doc_id, t.i - ph.off AS start,
             COUNT(DISTINCT ph.off) AS k
           FROM toks t JOIN ph ON t.tok = ph.tok
           GROUP BY 1, 2, 3)
         SELECT h.qid, h.doc_id, CAST(COUNT(1) AS BIGINT) AS n_occ
         FROM hits h JOIN plen USING (qid)
         WHERE h.k = plen.m
         GROUP BY 1, 2""",
    "q_bpe_train" -> graft.text.Bpe.sqlTrain(BpeMerges),
    "q_bpe_bytes_train" -> graft.text.Bpe.sqlTrainBytes(BpeMerges),
    "q_bpe_bytes_tokens" ->
      graft.text.Bpe.sqlDocTokenCountsBytes(BpeMerges),
    "q_wordpiece_train" -> graft.text.Wordpiece.sqlTrain(BpeMerges),
    "q_unigram_train" -> graft.text.Unigram.sqlTrain,
    "q_unigram_tokens" -> graft.text.Unigram.sqlDocTokenCounts,
    "q_wordpiece_tokens" ->
      graft.text.Wordpiece.sqlDocTokenCounts(BpeMerges),
    "q_bpe_encode" -> graft.text.Bpe.sqlEncodeVocab(BpeMerges),
    "q_bpe_tokens" -> graft.text.Bpe.sqlDocTokenCounts(BpeMerges),
    "q_bpe_pack" ->
      s"""WITH ${graft.text.Bpe.sqlDocTokenCtes(BpeMerges)},
         p AS (${graft.pipeline.Packing.sqlPackCte(
            "dt", "doc_id", "n_subwords", BpePackBudget, 64)})
         SELECT shard, pack, COUNT(1) AS n_docs,
           CAST(SUM(n_subwords) AS BIGINT) AS n_tokens
         FROM p GROUP BY 1, 2""",
    "q_curriculum" -> graft.pipeline.Curriculum.sqlStages(),
    "q_distinct_sketch" -> {
      import graft.sketch.Sketches
      s"""SELECT * FROM (${Sketches.sqlDistinctRangeEstimate(
            "lineitem", "l_orderkey", SketchRate)})
         CROSS JOIN (SELECT COUNT(DISTINCT l_orderkey) AS exact
                     FROM lineitem)"""
    },
    "q_kmv_distinct" -> {
      import graft.sketch.Sketches
      s"""SELECT * FROM (${Sketches.sqlKmvEstimate(
            "lineitem", "l_partkey", KmvK)})
         CROSS JOIN (SELECT COUNT(DISTINCT l_partkey) AS exact
                     FROM lineitem)"""
    },
    "q_kmv_per_group" -> {
      import graft.sketch.Sketches
      s"""SELECT grp, est, exact
         FROM (${Sketches.sqlKmvPerGroup(
            "events", "event_type", "user_id", KmvGroupK)})
         JOIN (SELECT event_type AS grp,
                 COUNT(DISTINCT user_id) AS exact
               FROM events GROUP BY 1) USING (grp)"""
    },
    "q_join_size_sketch" -> {
      import graft.sketch.Sketches
      s"""SELECT est, exact
         FROM (${Sketches.sqlCmsSelfJoinSizeEstimate(
            s"SELECT ${Sketches.sqlLongHash("l_partkey")} AS v FROM lineitem")})
         CROSS JOIN (SELECT CAST(SUM(c * c) AS BIGINT) AS exact
           FROM (SELECT COUNT(1) AS c FROM lineitem GROUP BY l_partkey))"""
    },
    "q_token_drift" -> graft.pipeline.Drift.sqlTokenShift(
      "documents", "text",
      s"${graft.pipeline.Sampling.sqlSplitLabel("doc_id")} = 'train'",
      s"${graft.pipeline.Sampling.sqlSplitLabel("doc_id")} = 'test'"),
    "q_cms_topk" -> {
      import graft.sketch.Sketches
      s"""WITH ${Sketches.sqlCmsCtes(
            s"""SELECT ${Sketches.sqlTokVal("tok")} AS v FROM
               (SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents)""")},
         cand AS (SELECT tok, ${Sketches.sqlTokVal("tok")} AS v,
             COUNT(1) AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents) GROUP BY 1, 2),
         cb AS (SELECT cand.tok, cand.cnt, r.row_i,
             ${Sketches.sqlCmsBucketCase("cand.v")} AS bucket
           FROM cand CROSS JOIN cmsrows r),
         e AS (SELECT cb.tok, cb.cnt, MIN(m.cnt) AS est
           FROM cb JOIN cms m USING (row_i, bucket) GROUP BY 1, 2)
         SELECT tok, est, cnt FROM e WHERE est >= $CmsThreshold"""
    },
    "q_quantile_sketch" -> graft.sketch.Sketches.sqlQuantileSketchEstimate(
      "SELECT CAST(n_chars AS BIGINT) AS v FROM documents", QsPercents),
    "q_quantile_per_group" -> graft.sketch.Sketches.sqlQuantilePerGroup(
      "SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v FROM documents",
      QsGroupPercents),
    "q_quantile_boundary" -> graft.sketch.Sketches.sqlQuantileSketchEstimate(
      """SELECT (1::BIGINT << (doc_id % 63))
           + (CASE WHEN doc_id % 63 >= 4
                   THEN (doc_id % 16) << ((doc_id % 63) - 4)
                   ELSE ((doc_id % 16) * (1::BIGINT << (doc_id % 63))) // 16
              END) AS v FROM documents
         UNION ALL SELECT unnest([0::BIGINT, 1::BIGINT,
           576460752303423488::BIGINT, 4611686018427387903::BIGINT,
           4611686018427387904::BIGINT, 9223372036854775807::BIGINT]) AS v""",
      QsBoundaryPercents),
    "q_decontaminate_bloom" -> graft.pipeline.Decontaminate.sqlFlagOverlap(
      s"${graft.pipeline.Sampling.sqlIdBucket("doc_id", 1000)} < $BloomProbeMills",
      minCommon = 3),
    "q_hybrid_retrieval" -> Retrieval.sqlHybridTopK(
      s"doc_id < $Bm25Queries", s"vec_id < $Bm25Queries",
      Bm25Terms, HybridEach, HybridK, dim = 64),
    // semantic packing: quantizer-trajectory cluster assignment +
    // the within-group pack window
    "q_pack_semantic" ->
      s"""WITH ${Iterative.kmTrajectoryCtes(k = 16, iters = 3)},
         cl AS (
           SELECT p.vec_id AS doc_id, c.cid AS cell
           FROM pts p CROSS JOIN c3 c
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) = 1),
         sdt AS (SELECT d.doc_id, (d.n_chars + 3) // 4 AS est_tokens, cl.cell
                FROM documents d JOIN cl USING (doc_id)),
         sp2 AS (${graft.pipeline.Packing.sqlPackWithinCte(
            "sdt", "cell", "doc_id", "est_tokens", 2048)})
         SELECT cell, pack, COUNT(1) AS n_docs,
           CAST(SUM(est_tokens) AS BIGINT) AS n_tokens
         FROM sp2 GROUP BY 1, 2""",
    // IVF-legged hybrid: the q_knn_ivf probe replay (quantizer
    // trajectory, cell assignment, 4-probe candidates) feeds the
    // shared RRF fuse tail as the `sem` leg
    "q_hybrid_ivf" -> sqlHybridIvf,
    // fully-served hybrid: the SAME oracle verbatim — serving both
    // legs from persisted indexes must be invisible in the results
    "q_hybrid_index" -> sqlHybridIvf,
    "q_importance_select" -> graft.pipeline.Importance.sqlSelect(
      "lang = 'en'", ImportanceK),
    "q_quality_distill" -> graft.pipeline.QualityModel.sqlDistill(),
    "q_temperature_mix" -> graft.pipeline.Sampling.sqlTemperatureMix(
      "documents", "lang", "doc_id", TempMixBudget),
  )

  /** Oracle of q_hybrid_ivf AND q_hybrid_index (a `def`: object-init
    * order safe). */
  private def sqlHybridIvf: String =
      s"""WITH ${Iterative.kmTrajectoryCtes(k = 16, iters = 3)},
         cb AS MATERIALIZED (
           SELECT p.vec_id AS cid, p.embedding AS cv, c.cid AS cell
           FROM pts p CROSS JOIN c3 c
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) = 1),
         qp AS (
           SELECT p.vec_id AS qid, p.embedding AS qv, c.cid AS cell
           FROM pts p CROSS JOIN c3 c
           WHERE p.vec_id < $Bm25Queries
           QUALIFY row_number() OVER (PARTITION BY p.vec_id
             ORDER BY ${Iterative.kmDist("p.embedding", "c.cent")}, c.cid) <= 4),
         icand AS (
           SELECT qid, cid, ${graft.sim.Similarity.sqlSimRounded("qv", "cv", 64)} AS sim
           FROM qp JOIN cb USING (cell) WHERE qid <> cid),
         sem AS (
           SELECT qid, cid AS id,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, cid) AS INT) AS rk
           FROM icand QUALIFY rk <= $HybridEach),
         ${Retrieval.sqlLexCtes(s"doc_id < $Bm25Queries", Bm25Terms, HybridEach)},
         ${Retrieval.sqlFuseTail(HybridK)}"""
}
