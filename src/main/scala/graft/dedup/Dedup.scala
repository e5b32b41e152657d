package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Deduplication operators for training-data pipelines (SURVEY.md §7
  * phase 4): exact, n-gram-Jaccard similarity join, MinHash+LSH, and
  * SimHash. All hashing is the portable arithmetic family from
  * TextFunctions so results are deterministic and (where output) the
  * DuckDB oracle can reproduce them exactly.
  *
  * 100 TB posture: every path is a keyed shuffle — no driver-side
  * state. The Jaccard join explodes distinct shingles and self-joins
  * on (lang, shingle); LSH replaces that quadratic-ish candidate step
  * with band-bucket joins whose volume is O(matches) for random text.
  *
  * Cache lifetime: jaccard/minhash persist their shingle projection
  * for reuse across the candidate and verify joins; because the
  * returned frame is lazy, that cache lives until the caller drops
  * the frame (context cleaner) or calls spark.catalog.clearCache().
  * Library callers that keep a session alive should pass
  * `materialize = true`: the pipeline runs once, the (small) pair
  * result is kept as a local checkpoint, and every internal cache is
  * released synchronously before the call returns
  * ([[graft.api.Materialize.releasing]]).
  */
object Dedup {

  /** Exact duplicate groups by full text: histogram of group sizes
    * (hash-groupBy; the degenerate-but-canonical exact dedup scan). */
  def exactDupHistogram(docs: DataFrame): DataFrame =
    docs.groupBy(col("text")).agg(count(lit(1)).as("n_copies"))
      .groupBy(col("n_copies")).agg(count(lit(1)).as("n_groups"))

  /** All document pairs with n-gram-shingle Jaccard >= threshold,
    * via an exact PPJoin-style prefix filter: for J(a,b) >= t, a and b
    * must share at least one of each other's ⌊(1-t)·|S|⌋+1 globally
    * rarest shingles — so only prefix shingles generate candidates
    * (no false negatives), and every candidate is verified against
    * the full shingle sets. A naive shared-shingle self-join is
    * quadratic in per-shingle document frequency (~700M intermediate
    * rows at sf0.1); the prefix filter keeps candidates O(true pairs).
    * Output is exact integers only (common/na/nb) — float-free for
    * the oracle comparison.
    */
  /** Shared prefix-filter scaffolding for the shingle-set joins:
    * returns (sets, ex, prefix) where `prefix` keeps each doc's
    * n - ceil(t·n) + 1 globally-rarest shingles. Exact integer
    * arithmetic throughout: float forms are poison —
    * (1.0-0.8)*130 = 25.999...96 shortens the prefix by one (missed
    * a true pair at sf0.1) and 0.8*130 = 104.000...01 wrongly
    * excludes nb=104 from the length filter — so the threshold is
    * carried as tq/1000 with integer ceil-division; and `n` is cast
    * to LONG here because size() yields Int and an Int×Int length
    * bound wraps for >2.1M-shingle docs, silently dropping true
    * pairs. `sets` is persisted (reused by the explode and the
    * verify joins); persisting `prefix` is the caller's choice
    * (jaccard reads it on both candidate sides, containment once). */
  private def prefixFiltered(docs: DataFrame, tq: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val sets = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = sets.select(col("doc_id"), size(col("sh")).cast("long").as("n"),
      explode(col("sh")).as("s"))
    val docFreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ceilTn = floor((lit(tq) * col("n") + lit(999)) / lit(1000.0)) // = ceil(t*n)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = ex.join(docFreq, "s")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceilTn + 1) // prefix len = n - ceil(t*n) + 1
      .select(col("doc_id"), col("n"), col("s"))
    (sets, ex, prefix)
  }

  /** Exact verification: join candidate (da, db) pairs back to the
    * full shingle sets → (da, db, common, na, nb) as longs. */
  private def verifyPairs(sets: DataFrame, cand: DataFrame): DataFrame =
    cand
      .join(sets.select(col("doc_id"), col("sh")).alias("sa"), col("da") === col("sa.doc_id"))
      .join(sets.select(col("doc_id"), col("sh")).alias("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("long").as("common"),
        size(col("sa.sh")).cast("long").as("na"),
        size(col("sb.sh")).cast("long").as("nb"))

  def jaccardSimilarityJoin(docs: DataFrame, threshold: Double = 0.8,
      materialize: Boolean = false): DataFrame = {
    val tq = math.round(threshold * 1000) // e.g. 0.8 -> 800
    val (sets, _, prefix0) = prefixFiltered(docs, tq)
    // persisted: the candidate self-join reads prefix on BOTH sides,
    // and without the barrier the docFreq join + rank window execute
    // twice (r5: ~1.4s -> ~1.0s warm at sf0.1)
    val prefix = prefix0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // length filter inside the candidate join (exact: J >= t requires
    // t*na <= nb and t*nb <= na) prunes dissimilar-size pairs before
    // they materialize
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * lit(1000L) >= col("a.n") * lit(tq) &&
          col("b.n") * lit(tq) <= col("a.n") * lit(1000L))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val pairs = verifyPairs(sets, cand)
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= threshold)
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(sets, prefix))
    else pairs
  }

  /** Directional CONTAINMENT pairs: (da, db) where
    * |S(da) ∩ S(db)| / |S(da)| >= threshold — "da's shingles are
    * mostly inside db" (quote / subset / boilerplate detection; the
    * asymmetric complement of [[jaccardSimilarityJoin]] — a short
    * quote scores high containment but low Jaccard). Output is
    * DIRECTIONAL (da != db, both orders possible) with exact
    * integers (common/na/nb) and a cross-multiplied integer
    * threshold — float-free end to end.
    *
    * Scalable path: the prefix filter applies ONE-SIDED — if
    * common >= ceil(t·na) then da shares one of its own
    * (na - ceil(t·na) + 1) globally-rarest shingles with db (same
    * lossless prefix theorem, contained side only), so only da's
    * rare-shingle prefix generates candidates while the container
    * side streams its full shingle explode; the nb*1000 >= na*tq
    * length bound prunes impossible containers inside the join. */
  def containmentJoin(docs: DataFrame, threshold: Double = 0.9,
      materialize: Boolean = false): DataFrame = {
    val tq = math.round(threshold * 1000)
    val (sets, ex, prefix) = prefixFiltered(docs, tq)
    val cand = prefix.alias("a")
      .join(ex.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.n") * lit(1000L) >= col("a.n") * lit(tq)) // container big enough
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val pairs = verifyPairs(sets, cand)
      .filter(col("common") * lit(1000L) >= col("na") * lit(tq))
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(sets))
    else pairs
  }

  // ---- MinHash + LSH --------------------------------------------------

  val NumHashes = 32
  val BandSize = 4 // -> 8 bands

  /** Hot-bucket guard cap (VERDICT r8 #2). A band bucket holding B
    * docs emits B*(B-1)/2 candidate pairs before verification, so ONE
    * degenerate bucket — viral boilerplate, a template shared by
    * millions of pages — turns LSH's O(true matches) candidate bound
    * quadratic. Buckets larger than this cap are excluded from
    * candidate generation: a group of >cap docs agreeing on a whole
    * band is exact/near-exact-duplicate territory, which exact dedup
    * ([[exactDupGroups]], run FIRST in a production pipeline) already
    * handles, and docs in a dropped bucket still pair through their
    * other 7 bands when those stay under the cap. [[bandBucketStats]]
    * is the monitoring view of what the guard would drop. The cap is
    * far above the gate fixtures' max bucket (4 at sf0.01, 12 at
    * sf0.1 — measured r9), so gate results are unchanged; the SQL
    * oracle mirrors the same cap so both engines stay exact twins. */
  val DefaultBandBucketCap = 64

  /** Deterministic LCG-style hash coefficients (driver-side constants,
    * embedded identically into the SQL oracle). */
  val hashCoeffs: Seq[(Long, Long)] = (0 until NumHashes).map { i =>
    ((1103515245L * (i + 1)) % HashMod, (12345L + 1013904223L * i) % HashMod)
  }

  /** 32-slot MinHash signature over distinct shingle values. */
  def minhashSignature(text: Column): Column =
    minhashSignature_(shingleVals(text))

  /** Signature from an already-computed shingle-value array column —
    * one codegen'd pass over the array (MinHashSigExpr). */
  def minhashSignature_(sv: Column): Column =
    graft.functions.MinHashSig.minhashSig(sv, hashCoeffs, HashMod)

  /** Column-HOF formulation of the signature: the parity-tested
    * semantic reference for [[minhashSignature_]] (NumHashes separate
    * interpreted array_min(transform(..)) passes — correct but slow).
    * Sole divergence: a NULL input yields [null x k] here (array() is
    * not null-tolerant) but NULL from the expression form, which is
    * the saner contract; parity is asserted on non-null inputs. */
  def minhashSignatureRef(sv: Column): Column =
    array(hashCoeffs.map { case (a, b) =>
      array_min(transform(sv, v => (v * a + b) % HashMod))
    }: _*)

  /** Band keys: polynomial combine of each band's minhashes (exact,
    * < 2^63, no modulo needed). */
  def bandKeys(sig: Column): Column =
    array((0 until NumHashes / BandSize).map { bi =>
      (0 until BandSize).map(r => element_at(sig, bi * BandSize + r + 1))
        .reduceLeft((acc, m) => acc * 31 + m)
    }: _*)

  /** THE signing pipeline: (doc_id, sv, sig, bands) from (doc_id,
    * text). Single source of truth for signature + banding — shared
    * by [[minhashLshPairs]], [[DedupIndex.write]] and
    * [[DedupIndex.flagAgainst]], so index-vs-delta and monolithic
    * runs can never drift apart arithmetically. */
  private[graft] def signedBands(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingleVals(col("text")).as("sv"))
      .select(col("doc_id"), col("sv"), minhashSignature_(col("sv")).as("sig"))
      .withColumn("bands", bandKeys(col("sig")))

  /** MinHash-LSH near-duplicate pairs: candidates share >= 1 band
    * bucket of at most `bucketCap` docs (the hot-bucket guard — see
    * [[DefaultBandBucketCap]]); candidates are then verified with
    * exact shingle-set Jaccard (array_intersect), so the output has
    * no false positives. */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5,
      materialize: Boolean = false,
      bucketCap: Int = DefaultBandBucketCap): DataFrame = {
    // materialize the distinct-shingle arrays ONCE: higher-order
    // functions run interpreted, and without this barrier Catalyst's
    // CollapseProject inlines the shingleVals expression into every
    // one of the 32 minhash expressions (measured 25x slowdown), and
    // the frame is reused by the bucket join + both verify joins.
    // (r5: the cache moved from the sv projection to withSig — the
    // bucket self-join's x/y branches and both verify joins all read
    // it, so sig/bands compute once instead of three times; bands is
    // 8 longs/doc, a negligible cache-size delta)
    val withSig = signedBands(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = minhashLshPairsFrom(withSig, threshold, bucketCap)
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(withSig))
    else pairs
  }

  /** MinHash ESTIMATE audit: for every LSH-verified near-dup pair,
    * the signature-slot agreement count (matching minhash slots of
    * [[NumHashes]]) alongside the exact shingle overlap — the
    * estimator-vs-truth view that pins the SIGNATURE arithmetic
    * itself, not just the band keys it feeds (slots/NumHashes is the
    * unbiased Jaccard estimate; common/(na+nb-common) the truth).
    * Integer-only output. One extra pass over the cached signed frame
    * — pair volume is O(true matches). */
  def minhashEstimatePairs(docs: DataFrame, threshold: Double = 0.5,
      bucketCap: Int = DefaultBandBucketCap): DataFrame = {
    val withSig = signedBands(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = minhashLshPairsFrom(withSig, threshold, bucketCap)
    val est = pairs
      .join(withSig.select(col("doc_id").as("da"), col("sig").as("siga")), Seq("da"))
      .join(withSig.select(col("doc_id").as("db"), col("sig").as("sigb")), Seq("db"))
      .select(col("da"), col("db"), col("common"), col("na"), col("nb"),
        size(filter(zip_with(col("siga"), col("sigb"), (a, b) => a === b),
          x => x)).cast("long").as("slots_match"))
    graft.api.Materialize.releasing(est, Seq(withSig))
  }

  /** Hot-bucket monitor: the (band_idx, band_key) buckets the guard
    * excludes at `cap`, with their doc counts — the "logged count" a
    * production dedup run watches to see how much boilerplate the cap
    * diverted to the exact-dedup path. Empty on a healthy corpus. */
  def bandBucketStats(docs: DataFrame,
      cap: Int = DefaultBandBucketCap): DataFrame =
    signedBands(docs)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > cap)

  /** Per-band occupancy summary: bucket count, hottest bucket, and
    * doc-row volume for each of the LSH bands — the health view a
    * production dedup watches to size [[DefaultBandBucketCap]] and
    * spot a banding scheme collapsing onto few keys (the degenerate-
    * vocabulary failure mode, docs/SCALE.md). Two keyed aggregations
    * over one signing pass; integer-only output. */
  def bandOccupancy(docs: DataFrame): DataFrame =
    signedBands(docs)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_bucket"),
        sum(col("n")).as("n_rows"))

  /** [[minhashLshPairs]] body over an already-signed (cached) frame —
    * shared so the estimate audit can't drift from the pairs path.
    * The bucket-size window shares the (band_idx, band_key) exchange
    * the self-join needs anyway, so the guard costs a per-partition
    * count, not an extra shuffle. */
  private def minhashLshPairsFrom(withSig: DataFrame, threshold: Double,
      bucketCap: Int): DataFrame = {
    val exploded = withSig.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    // hot-bucket guard as a tiny over-cap set + anti-join (r9 rework:
    // the first formulation was a count window over the band buckets,
    // but WindowExec sorts every partition and the un-cached windowed
    // subtree ran once per self-join branch — measured ~2x on
    // q_dedup_minhash at gate SF. The over-cap set is empty on a
    // healthy corpus, AQE broadcasts it, and the explode stays a
    // narrow pass off the caller's cached signed frame.)
    val hot = exploded
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > bucketCap)
      .select(col("band_idx"), col("band_key"))
    val buckets = exploded
      .join(hot, Seq("band_idx", "band_key"), "left_anti")
    val cand = buckets.alias("x")
      .join(buckets.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    cand
      .join(withSig.select(col("doc_id"), col("sv")).alias("sa"), col("da") === col("sa.doc_id"))
      .join(withSig.select(col("doc_id"), col("sv")).alias("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        size(array_intersect(col("sa.sv"), col("sb.sv"))).cast("long").as("common"),
        size(col("sa.sv")).cast("long").as("na"),
        size(col("sb.sv")).cast("long").as("nb"))
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= threshold)
  }

  /** Near-duplicate CLUSTERS: the operator a corpus dedup actually
    * ends in. [[minhashLshPairs]] emits the verified near-dup PAIR
    * graph; its transitive closure (connected components over the
    * pairs, min-doc_id labels via [[graft.graph.Algorithms
    * .connectedComponents]]' delta iteration) groups chained
    * duplicates a~b~c into ONE cluster even when a and c themselves
    * fall under the threshold — so "keep one doc per cluster" drops
    * every transitive copy exactly once. Returns one row per cluster
    * of size >= 2 (singletons never enter the pair graph):
    * (cluster_id = min doc_id, n_docs, max_doc, sum_doc — the latter
    * two pin full membership for the oracle hash).
    *
    * 100 TB posture: pairs are O(true matches) (LSH bucketing), the
    * component iteration shuffles only the pair graph — corpus size
    * never appears past the signature scan. The pair frame is
    * materialized once (localCheckpoint) so the iteration's
    * supersteps never re-run the LSH pipeline. */
  /** Shared clustering core: min-id component labels (vertex,
    * component) over the verified LSH pair graph — ONE definition so
    * the reporting view ([[nearDupClusters]]) and the terminal
    * ([[dedupKeep]]) can never drift apart. */
  private def nearDupComponents(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = minhashLshPairs(docs, threshold, materialize = true)
    graft.graph.Algorithms.connectedComponents(
      pairs.select(col("da").as("src"), col("db").as("dst")))
  }

  def nearDupClusters(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    nearDupComponents(docs, threshold)
      .groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("vertex")).as("max_doc"),
        sum(col("vertex")).as("sum_doc"))

  /** The dedup TERMINAL: `docs` with every non-representative
    * transitive near-duplicate REMOVED — each cluster (connected
    * component of the verified LSH pair graph) keeps exactly its
    * min-doc_id representative; docs in no cluster pass through
    * untouched. This is the operator a training pipeline actually
    * ends in ([[nearDupClusters]] is the reporting view of the same
    * clustering).
    *
    * 100 TB posture: the drop-set is match-sized (non-representative
    * cluster members only), so the final filter is one anti join
    * keyed on doc_id; corpus size appears only in the signature scan
    * and that join. */
  def dedupKeep(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val drop = nearDupComponents(docs, threshold)
      .filter(col("vertex") =!= col("component"))
      .select(col("vertex").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  // ---- embedding-cosine near-dup --------------------------------------

  /** Embedding near-duplicate pairs: same-block (label) vectors with
    * exact-quantized cosine >= threshold. Blocking keeps the pairing
    * subquadratic in corpus size (pairs within blocks only — the
    * standard blocked-dedup contract). Both sides are the FULL corpus,
    * so the join is a shuffle hash join on the block key — never a
    * broadcast (a corpus-wide broadcast OOMs the executors at scale);
    * per-block pair volume is bounded by the blocking, and the
    * similarity runs in the codegen'd CosineSim expression. */
  def embeddingCosinePairs(emb: DataFrame, threshold: Double,
      blockCol: String = "label"): DataFrame = {
    import graft.sim.Similarity.simRounded
    val a = emb.select(col("vec_id").as("va"), col(blockCol).as("blk"),
      col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col(blockCol).as("blk"),
      col("embedding").as("eb"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("blk"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"), simRounded(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding-space near-dup CLUSTERS: connected components over the
    * verified same-block cosine pair graph ([[embeddingCosinePairs]]),
    * reported per cluster — the semantic-dedup terminal view (text
    * LSH catches near-verbatim copies; embedding clusters catch
    * paraphrases that share a representation). Same shape and scale
    * posture as [[nearDupClusters]]: the iteration runs over the
    * match-sized pair graph, never the corpus, and blocking keeps the
    * pairing subquadratic. Vectors with no qualifying pair are absent
    * (singleton = not a cluster), matching the LSH clusters
    * contract. */
  def embeddingClusters(emb: DataFrame, threshold: Double,
      blockCol: String = "label"): DataFrame =
    graft.graph.Algorithms.connectedComponents(
      embeddingCosinePairs(emb, threshold, blockCol)
        .select(col("va").as("src"), col("vb").as("dst")))
      .groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        max(col("vertex")).as("max_vec"),
        sum(col("vertex")).as("sum_vec"))

  // ---- SimHash --------------------------------------------------------

  val SimHashBits = 16

  /** 16-bit SimHash over token wordVals: bit b is set iff the sum of
    * (+1 / -1) votes from each token's hash bit b is positive.
    * Runs as the one-pass codegen'd SimHashExpr; the HOF reference
    * formulation below re-walks the token-hash array once per bit
    * (16 interpreted passes/row) and exists for the bit-for-bit
    * parity test (VERDICT r4 item 6). */
  def simhash(text: Column): Column =
    graft.functions.TextExprs.simhashFast(text, SimHashBits)

  /** HOF reference form of [[simhash]] — parity-tested, not the
    * production path. */
  def simhashRef(text: Column): Column = {
    val hv = transform(tokens(text), w => (wordVal(w) * 2654435761L) % HashMod)
    (0 until SimHashBits).map { b =>
      when(aggregate(hv, lit(0L),
        (acc, v) => acc + (shiftright(v, b).bitwiseAND(1) * 2 - 1)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduceLeft(_ + _)
  }

  /** SQL twin of [[simhash]] for the DuckDB oracle. */
  def sqlSimhash(textExpr: String, bits: Int = SimHashBits): String = {
    val hv = s"""list_transform(string_split($textExpr, ' '),
      w -> (${sqlWordVal("w")}
            * 2654435761) % $HashMod)"""
    (0 until bits).map { b =>
      s"""(CASE WHEN list_sum(list_transform($hv,
            v -> ((v >> $b) & 1) * 2 - 1)) > 0
          THEN ${1L << b} ELSE 0 END)"""
    }.mkString("(", " + ", ")")
  }

  /** Fingerprint width for the banded Hamming pair join: the token
    * hash family is mod-(1e9+7), so only the low ~30 fingerprint bits
    * ever carry votes — 28 divides evenly into the pigeonhole band
    * counts for radius 1/3/6. (The production shape is identical with
    * a 64-bit hash family and 64-bit fingerprints.) */
  val HammingBits = 28

  /** All document pairs whose [[HammingBits]]-bit SimHash fingerprints
    * differ in at most `maxHamming` bits — the multi-index fingerprint
    * dedup of Manku et al., "Detecting Near-Duplicates for Web
    * Crawling" (WWW 2007): split the fingerprint into maxHamming+1
    * bit-bands; any pair within the radius must agree EXACTLY on at
    * least one band (pigeonhole), so an equality bucket-join per band
    * generates a candidate superset with NO false negatives, and the
    * popcount-of-XOR filter leaves exactly the within-radius pairs.
    * Output (da, db, hamming) is therefore set-exact — brute-forceable
    * by the oracle at gate scale.
    *
    * 100 TB posture: fingerprints are one long per doc (the cheapest
    * signature in the dedup family — one codegen'd text pass, no
    * shingle arrays); the band join shuffles (id, long) pairs only.
    * Candidate volume per band is Σ_bucket C(n_bucket, 2) — governed
    * by the band's value space (2^(bits/bands)); production deploys
    * widen the fingerprint (64-bit) to deepen the band space, same
    * plan shape. */
  def simhashHammingPairs(docs: DataFrame, maxHamming: Int = 3,
      materialize: Boolean = false): DataFrame = {
    val sh = docs.select(col("doc_id"),
        graft.functions.TextExprs.simhashFast(col("text"), HammingBits).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = bandedHammingPairs(sh, "doc_id", "sh", HammingBits, maxHamming)
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(sh))
    else pairs
  }

  /** The Manku banded-Hamming pair join over an ARBITRARY fingerprint
    * frame — the machinery of [[simhashHammingPairs]] factored out so
    * every fingerprint family (text SimHash, image dHash
    * [[graft.multimodal.Multimodal.imageNearDupPairs]], any future
    * audio/video perceptual hash) shares one implementation: split the
    * `bits`-wide fingerprint into maxHamming+1 bands, bucket-join per
    * band (pigeonhole — lossless within the radius), popcount-filter.
    * Returns (da, db, hamming), da < db, exact within the radius.
    *
    * `fps` must expose `idCol` (long) and `fpCol` (long, the low
    * `bits` bits significant, NON-NEGATIVE — i.e. bits <= 63; wider
    * fingerprints become multiple longs, each banded the same way).
    * Caller owns caching of `fps` (it feeds both self-join sides).
    * shiftrightunsigned on principle (fp is non-negative by contract,
    * but a sign-extending shift on a future 64-bit caller would
    * silently corrupt the top band). */
  /** `bucketCap`: the fingerprint-family twin of the LSH hot-bucket
    * guard ([[DefaultBandBucketCap]] rationale) — a band bucket of B
    * fingerprints emits B*(B-1)/2 candidates, so ONE boilerplate
    * flood (the same logo/jingle re-encoded a million times) turns
    * the candidate bound quadratic. Capped buckets are excluded from
    * candidate generation; members still pair through their other
    * bands when those stay healthy, and an exact-duplicate flood
    * (identical fp => ALL bands hot) is exact-dedup territory by
    * definition. Capping trades the pigeonhole losslessness on
    * capped buckets for bounded cost — declared oracle queries run
    * uncapped (set-exact; the gate fixture's max bucket is far below
    * any sane cap), production runs cap + monitor via
    * [[hammingBandOccupancy]]. */
  def bandedHammingPairs(fps: DataFrame, idCol: String, fpCol: String,
      bits: Int, maxHamming: Int, bucketCap: Option[Int] = None): DataFrame = {
    val bands = maxHamming + 1
    require(bits % bands == 0,
      s"bands=$bands (maxHamming+1) must divide $bits")
    val sh = fps.select(col(idCol).as("id"), col(fpCol).as("fp"))
    val bk0 = sh.select(col("id"), col("fp"),
      posexplode(bandKeyArray(col("fp"), bits, bands))
        .as(Seq("band_idx", "band_key")))
    // over-cap set + anti-join, not a count window: same plan
    // rationale as minhashLshPairsFrom (empty on a healthy corpus,
    // AQE broadcasts it; the explode stays a narrow pass)
    val bk = bucketCap.fold(bk0) { cap =>
      val hot = bk0.groupBy(col("band_idx"), col("band_key"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > cap)
        .select(col("band_idx"), col("band_key"))
      bk0.join(hot, Seq("band_idx", "band_key"), "left_anti")
    }
    bk.alias("x")
      .join(bk.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Band keys of a `bits`-wide non-negative fingerprint split into
    * `bands` equal slices — THE banding arithmetic, shared by the
    * pair join, the occupancy monitor and [[FingerprintIndex]]'s
    * stored band rows so no two consumers can disagree on
    * bucketing. */
  private[dedup] def bandKeyArray(fp: Column, bits: Int, bands: Int): Column = {
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    array((0 until bands).map(b =>
      shiftrightunsigned(fp, b * bandBits).bitwiseAND(lit(mask))): _*)
  }

  /** Per-band occupancy of a fingerprint frame under the
    * [[bandedHammingPairs]] banding — the monitoring view that sizes
    * `bucketCap` for a fingerprint family (the [[bandOccupancy]]
    * twin): bucket count, hottest bucket, and row volume per band.
    * Σ_bucket C(n,2) over a band is its candidate volume; watch
    * max_bucket to spot a boilerplate flood before it goes
    * quadratic. */
  def hammingBandOccupancy(fps: DataFrame, fpCol: String,
      bits: Int, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    require(bits % bands == 0,
      s"bands=$bands (maxHamming+1) must divide $bits")
    fps.select(
        posexplode(bandKeyArray(col(fpCol), bits, bands))
          .as(Seq("band_idx", "band_key")))
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_bucket"),
        sum(col("n")).as("n_rows"))
  }

  /** Sorted-neighborhood near-dup pairs (Hernandez/Stolfo SNM): sort
    * each block (lang) by a content key — here the token-SORTED text,
    * so word-order-perturbed near-dups land adjacent — and emit each
    * doc paired with its next `window - 1` neighbors in that order,
    * then verify candidates with the exact 3-gram Jaccard. A third
    * candidate-generation family alongside the prefix-filtered
    * similarity join (exact, heavier) and MinHash/SimHash banding
    * (probabilistic): SNM is cheapest — ONE keyed window pass, zero
    * candidate joins — but only finds pairs the sort key puts within
    * the window; its recall is a function of key quality, which is
    * why production runs multi-pass with different keys.
    *
    * Neighbors come from `window - 1` lead() calls inside the same
    * window pass (NOT a rank-range self-join, which would shuffle the
    * corpus twice and risk a per-block product). 100 TB: one
    * (block)-keyed shuffle + per-block sort, same cost class as
    * sessionization; block key choice bounds skew (lang alone is too
    * coarse at production scale — compose with a key prefix, same as
    * any SNM deployment).
    */
  /** Default SNM sort key: the token-SORTED text, so word-order-
    * perturbed near-dups land adjacent. */
  def snmKeyTokenSorted: Column =
    array_join(array_sort(tokens(col("text"))), " ")

  /** Alternate pass key: the REVERSED token-sorted text — adjacency by
    * the rare-suffix end of the vocabulary, a different neighborhood
    * than [[snmKeyTokenSorted]]'s common-prefix end. */
  def snmKeyTokenReversed: Column =
    array_join(reverse(array_sort(tokens(col("text")))), " ")

  def sortedNeighborhoodPairs(docs: DataFrame, window: Int = 4,
      threshold: Double = 0.8, materialize: Boolean = false,
      key: Column = snmKeyTokenSorted): DataFrame = {
    val sets = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = verifyPairs(sets, snmCandidates(docs, window, key))
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= threshold)
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(sets))
    else pairs
  }

  /** Multi-pass SNM: one window pass per key, candidates unioned
    * before the single shared verify — the standard recall remedy for
    * single-key SNM (each pass is the same one-shuffle shape; recall
    * grows with passes, cost is additive, the verify join runs once
    * over the distinct union). */
  def sortedNeighborhoodMultiPass(docs: DataFrame, keys: Seq[Column],
      window: Int = 4, threshold: Double = 0.8,
      materialize: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one sort key")
    val sets = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = keys.map(k => snmCandidates(docs, window, k))
      .reduce(_ union _).distinct()
    val pairs = verifyPairs(sets, cand)
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= threshold)
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(sets))
    else pairs
  }

  /** EXACT SUBSTRING deduplication (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" operator, span
    * granularity): find every k-token window that appears VERBATIM in
    * at least `minDocs` distinct documents, merge each doc's
    * duplicated window starts into maximal covered spans (two windows
    * merge when their [s, s+k) intervals overlap or touch), and
    * report per doc (doc_id, n_dup_windows, n_spans, covered_tokens).
    * This is the sub-document complement of the doc-level dedup
    * family above: boilerplate headers, licence blocks and quoted
    * passages that repeat inside otherwise-distinct documents.
    *
    * Semantics are defined by the STRING (exact substring match);
    * the 8-byte window hash (xxhash64 over the token-array slice —
    * no window string is ever built pre-filter, r13) is only a
    * shuffle-thinning prefilter — windows whose hash isn't
    * duplicated across `minDocs` docs drop before any string exists,
    * and the surviving candidates are re-grouped BY THE STRING, so a
    * hash collision can never create a false duplicate.
    *
    * 100 TB posture: pass 1 shuffles (fp, doc_id) — 16 bytes per
    * window, map-side combined; only the duplicated fraction (a few
    * percent of a real crawl) builds and carries its k-token string
    * into pass 2's exact group (candidate strings are sliced from
    * the cached token side by one doc_id join — the duplicated
    * fraction of DOCS, not the corpus). The span merge is one
    * per-doc window over that duplicated fraction
    * (gaps-and-islands: island starts where the interval clears the
    * predecessor, island id = running sum) — never a corpus-wide
    * sort. All arithmetic integer, all grouping by strings/longs:
    * the DuckDB oracle (prefilter-free — the prefilter is
    * semantics-free by construction) replays it bit-for-bit. */
  /** Duplicated k-token windows of the corpus: (doc_id, start, kg)
    * for every window whose STRING appears in ≥ minDocs distinct
    * docs. Returns the frame plus the cached projection the caller
    * must release (the Materialize.releasing contract).
    *
    * Restructured r13 so NO window string exists before the
    * prefilter: pass 1 hashes the token-array slice directly
    * (xxhash64 — 64-bit, collision false-positives only ever ADD a
    * candidate, never a result; the hash is semantics-free exactly
    * like the old string fingerprint), shuffling (doc_id, start, fp)
    * triples only; the k-token `kg` string is then built ONLY for
    * candidate windows, by slicing the token arrays of candidate
    * DOCS (one doc_id join against the cached token side — the
    * duplicated fraction of docs, not the corpus). At the published
    * k≈50 operating point this removes an O(corpus_tokens · k)
    * string-construction pass that dominated the old layout
    * (measured in DevScaleSubstring: see SCALE.md). Pass 2 still
    * re-groups candidates BY THE STRING, so a hash collision can
    * never create a false duplicate. */
  private def substringDupWindows(docs: DataFrame, k: Int,
      minDocs: Int): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val winsFp = toks
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("t")) - k),
        i => xxhash64(slice(col("t"), i + 1, lit(k)))))
        .as(Seq("start", "fp")))
    // r17 optimization (guide §2.4 — two ops keyed the same way share
    // one exchange): at the production minDocs = 2, "≥ 2 distinct
    // docs" ⟺ min(doc_id) ≠ max(doc_id) (the Scrub.spanScrub trick),
    // and both the dup test AND the first-occurrence owner are
    // key-partitioned aggregates — so each prefilter stage runs as
    // ONE window pass over its key instead of a groupBy + join-back
    // pair (count_distinct Expand + an extra exchange per stage).
    // Same candidate sets, same shuffled byte mass, half the
    // exchanges per pass; on THIS branch winsFp has a single
    // consumer, so its r13 cache is gone. The generic minDocs branch
    // keeps the groupBy + semi-join shape — there winsFp feeds BOTH
    // the count_distinct aggregate and the semi-join probe, so the
    // r13 cache stays (ADVICE r17 #1: without it the O(corpus-window)
    // explode + per-window xxhash64 recomputes per consumer),
    // released with toks below.
    var genericCaches: Seq[DataFrame] = Nil
    val candPos =
      if (minDocs == 2) {
        val wfp = Window.partitionBy(col("fp"))
        winsFp
          .withColumn("mn", min(col("doc_id")).over(wfp))
          .withColumn("mx", max(col("doc_id")).over(wfp))
          .filter(col("mn") =!= col("mx"))
          .select(col("doc_id"), col("start").cast("long").as("start"))
      } else {
        val winsFpC = winsFp
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        genericCaches = Seq(winsFpC)
        val dupFp = winsFpC.groupBy(col("fp"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= minDocs).select(col("fp"))
        winsFpC.join(dupFp, Seq("fp"), "left_semi")
          .select(col("doc_id"), col("start").cast("long").as("start"))
      }
    val cand = candPos.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("start"),
        array_join(slice(col("t"), (col("start") + 1).cast("int"), lit(k)), " ")
          .as("kg"))
    val dupWins =
      if (minDocs == 2) {
        val wkg = Window.partitionBy(col("kg"))
        cand
          .withColumn("mn", min(col("doc_id")).over(wkg))
          .withColumn("mx", max(col("doc_id")).over(wkg))
          .withColumn("o", min(struct(col("doc_id"), col("start"))).over(wkg))
          .filter(col("mn") =!= col("mx"))
          .select(col("doc_id"), col("start"), col("kg"), col("o"))
      } else {
        val dupKg = cand.groupBy(col("kg"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= minDocs).select(col("kg"))
        val owner = cand.groupBy(col("kg"))
          .agg(min(struct(col("doc_id"), col("start"))).as("o"))
        cand.join(dupKg, Seq("kg"), "left_semi")
          .join(owner, Seq("kg"))
          .select(col("doc_id"), col("start"), col("kg"), col("o"))
      }
    (dupWins, Seq(toks) ++ genericCaches)
  }

  /** Gaps-and-islands merge of window starts into maximal covered
    * [s0, s1) spans (two [s, s+k) intervals merge when they overlap
    * or touch): (doc_id, island, n_w, s0, s1). */
  private def mergeSpans(dupWins: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    dupWins
      .withColumn("newIsland",
        when(lag(col("start"), 1).over(w).isNull ||
          col("start") > lag(col("start"), 1).over(w) + k, 1L).otherwise(0L))
      .withColumn("island", sum(col("newIsland")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("n_w"), min(col("start")).as("s0"),
        (max(col("start")) + k).as("s1"))
  }

  def exactSubstringSpans(docs: DataFrame, k: Int,
      minDocs: Int = 2): DataFrame = {
    val (dupWins, cached) = substringDupWindows(docs, k, minDocs)
    graft.api.Materialize.releasing(
      mergeSpans(dupWins.select(col("doc_id"), col("start")), k)
        .groupBy(col("doc_id"))
        .agg(sum(col("n_w")).as("n_dup_windows"),
          count(lit(1)).as("n_spans"),
          sum(col("s1") - col("s0")).as("covered_tokens")),
      cached)
  }

  /** EXACT SUBSTRING SCRUB — the REMOVAL half of the Lee et al.
    * operator: of every duplicated k-token window string, the
    * globally-FIRST occurrence (minimal (doc_id, start)) is kept and
    * every other occurrence's window is cut; cut windows merge into
    * spans ([[mergeSpans]]) and the covered token positions leave the
    * text. Output per doc (ALL docs — unscrubbed docs pin their
    * original content too): (doc_id, n_before, n_after, fp_after)
    * with fp_after the rolling-hash fingerprint of the scrubbed,
    * order-preserved text (0 for a fully-scrubbed doc) — a single
    * wrong cut boundary anywhere breaks the hash.
    *
    * Single-pass by design (like the original): cutting can create
    * new adjacencies whose windows were not duplicated before; a
    * fixpoint iteration would re-run this operator.
    *
    * 100 TB posture: the candidate discipline of
    * [[exactSubstringSpans]] (fingerprints shuffle, strings only for
    * the duplicated fraction); the owner pick is one groupBy(kg) min
    * over that fraction; the final cut joins the corpus token stream
    * against the tiny per-doc span set on doc_id. The ordered rejoin
    * groups each doc's surviving tokens once — O(corpus) but narrow,
    * and the output is corpus-ROW-sized, not corpus-token-sized. */
  def exactSubstringScrub(docs: DataFrame, k: Int,
      minDocs: Int = 2): DataFrame = {
    val (dupWins, cached) = substringDupWindows(docs, k, minDocs)
    val spans = scrubSpans(dupWins, k)
    // Apply the cut per ROW, not per token (r17 optimization, guide
    // §2.3/§2.4 + the Scrub.spanScrub precedent): fold each doc's few
    // spans into one array and drop covered positions with a
    // positional-filter HOF. The previous shape exploded the WHOLE
    // corpus to (pos, tok) rows, range-anti-joined them against the
    // span set and re-grouped with sort_array(collect_list(...)) —
    // an O(corpus tokens) exchange carrying every token string, per
    // pass. Now only the span frame (duplicated docs only) shuffles;
    // the token walk stays inside the scan projection. Plan: 2
    // Exchanges (spans agg + result) replace 4, and the widest
    // exchange is span-rows, not corpus-token-rows.
    val kept = filter(tokens(col("text")),
      (_, i) => !exists(col("cut"), s =>
        s.getField("s0") <= i && i < s.getField("s1")))
    graft.api.Materialize.releasing(
      docs.join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("cut"),
            array().cast("array<struct<s0:bigint,s1:bigint>>")).as("cut"))
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_before"),
          size(kept).cast("long").as("n_after"),
          when(size(kept) === 0, lit(0L))
            .otherwise(graft.text.TextFunctions.fingerprint(
              array_join(kept, " ")))
            .as("fp_after")),
      cached)
  }

  /** The non-first duplicated windows of `dupWins`, merged into
    * per-doc span ARRAYS: (doc_id, cut: array<struct<s0, s1>>), one
    * row per doc that loses at least one window. Shared by the two
    * scrub applications; span count per doc is bounded by doc
    * length, so the array fold is the cheap side of the pipeline. */
  private def scrubSpans(dupWins: DataFrame, k: Int): DataFrame = {
    // the globally-first occurrence rides dupWins as `o` (computed in
    // the same window pass as the dup test — substringDupWindows), so
    // the owner pick is a row-local filter, not an agg + join-back
    val cut = dupWins
      .filter(!(col("doc_id") === col("o.doc_id") &&
        col("start") === col("o.start")))
      .select(col("doc_id"), col("start"))
    mergeSpans(cut, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s0"), col("s1"))).as("cut"))
  }

  /** One text-to-text scrub pass (the [[exactSubstringScrub]] cut
    * applied to the text itself): (doc_id, text) → (doc_id, text)
    * with every non-first duplicated window's tokens removed, ""
    * for a fully-cut doc. Returns the frame plus the cached
    * projection to release. */
  private def scrubPassText(docs: DataFrame, k: Int,
      minDocs: Int): (DataFrame, Seq[DataFrame]) = {
    val (dupWins, cached) = substringDupWindows(docs, k, minDocs)
    // same row-local cut application as [[exactSubstringScrub]] (r17
    // optimization): the span arrays join back to the corpus and the
    // covered positions drop inside one projection — no corpus-token
    // explode, range join or collect_list regroup per pass. A doc
    // with no spans keeps all tokens, so its text re-joins to the
    // identical single-spaced form the old all-tokens regroup built.
    val kept = filter(tokens(col("text")),
      (_, i) => !exists(col("cut"), s =>
        s.getField("s0") <= i && i < s.getField("s1")))
    (docs.join(scrubSpans(dupWins, k), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("cut"),
          array().cast("array<struct<s0:bigint,s1:bigint>>")).as("cut"))
      .select(col("doc_id"), array_join(kept, " ").as("text")),
      cached)
  }

  /** FIXPOINT exact substring scrub (VERDICT r12 #5 — the
    * completeness complement of the single-pass operator): cutting a
    * span can create NEW adjacencies whose k-windows were not
    * duplicated before, so the published single-pass operator can
    * leave second-order duplication behind; this variant re-runs the
    * scrub until a pass removes nothing or `maxPasses` is reached.
    * Convergence check is EXACT and cheap: a pass only ever REMOVES
    * tokens, so text changed ⟺ total token count decreased — one
    * tiny aggregate per pass, never a corpus diff. Output shape ≡
    * [[exactSubstringScrub]]; the oracle is the pass UNROLLED
    * `maxPasses` times (an extra pass on a fixed point is the
    * identity, so early exit never diverges from the unrolled twin).
    *
    * 100 TB posture: each pass is the single-pass operator's plan
    * (fingerprint-prefiltered candidates, per-doc islands, narrow
    * rejoin), and the pass count is a small constant — in practice
    * pass 2's candidate mass is the second-order duplication only,
    * a tiny fraction of pass 1's (measured in DevScaleSubstring).
    * Assumes the corpus normalization contract (non-empty,
    * single-spaced text), like the single-pass operator. */
  def exactSubstringScrubFixpoint(docs: DataFrame, k: Int,
      minDocs: Int = 2, maxPasses: Int = 3): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val base = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_before"))
    var cur = docs.select(col("doc_id"), col("text"))
    var curPersisted: Option[DataFrame] = None
    var curToks = -1L // unknown yet; first pass always runs
    var pass = 0
    var converged = false
    while (pass < maxPasses && !converged) {
      val (next, cached) = scrubPassText(cur, k, minDocs)
      val nextP = next.persist(StorageLevel.MEMORY_AND_DISK)
      val nextToks = nextP
        .agg(coalesce(sum(when(length(col("text")) === 0, 0L)
          .otherwise(size(tokens(col("text"))).cast("long"))), lit(0L)))
        .head().getLong(0)
      // synchronous: a rerun loop (bench warm repeats, a serving
      // process invoking the scrub per batch) must not accumulate
      // the previous pass's blocks while the next pass runs
      // (VERDICT r13 what's-wrong #3)
      cached.foreach(_.unpersist(blocking = true))
      curPersisted.foreach(_.unpersist(blocking = true))
      curPersisted = Some(nextP)
      converged = nextToks == curToks
      curToks = nextToks
      cur = nextP
      pass += 1
    }
    val out = base.join(cur, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_before"),
        when(length(col("text")) === 0, 0L)
          .otherwise(size(tokens(col("text"))).cast("long")).as("n_after"),
        when(length(col("text")) === 0, 0L)
          .otherwise(graft.text.TextFunctions.fingerprint(col("text")))
          .as("fp_after"))
    graft.api.Materialize.releasing(out, curPersisted.toSeq)
  }

  /** Oracle twin of [[exactSubstringScrubFixpoint]]: the scrub pass
    * unrolled `passes` times over token LISTS (a fully-cut doc is the
    * empty list, which the next pass ignores — mirroring the Spark
    * side's "" text). Ends in (doc_id, n_before, n_after, fp_after). */
  def sqlExactSubstringScrubFixpoint(table: String, k: Int,
      minDocs: Int = 2, passes: Int = 3): String = {
    def passCtes(i: Int, in: String, out: String): String =
      s"""wins$i AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS start,
           list_aggr(t[i:i+${k - 1}], 'string_agg', ' ') AS kg
         FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t) - ${k - 1})) AS i
               FROM $in WHERE len(t) >= $k)),
       dup$i AS (SELECT kg FROM wins$i
         GROUP BY kg HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       dw$i AS (SELECT doc_id, start, kg FROM wins$i JOIN dup$i USING (kg)),
       own$i AS (SELECT kg, doc_id AS od, start AS os FROM (
           SELECT kg, doc_id, start, row_number()
               OVER (PARTITION BY kg ORDER BY doc_id, start) AS rn
           FROM dw$i) WHERE rn = 1),
       cut$i AS (SELECT d.doc_id, d.start FROM dw$i d JOIN own$i o ON d.kg = o.kg
         WHERE NOT (d.doc_id = o.od AND d.start = o.os)),
       isl$i AS (SELECT doc_id, start,
           SUM(CASE WHEN prev IS NULL OR start > prev + $k
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS UNBOUNDED PRECEDING) AS island
         FROM (SELECT doc_id, start,
                 lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
               FROM cut$i)),
       sp$i AS (SELECT doc_id, MIN(start) AS s0, MAX(start) + $k AS s1
         FROM isl$i GROUP BY doc_id, island),
       tp$i AS (SELECT doc_id, tok, CAST(i - 1 AS BIGINT) AS pos
         FROM (SELECT doc_id, unnest(t) AS tok,
                 unnest(generate_series(1, len(t))) AS i FROM $in)),
       surv$i AS (SELECT tp.doc_id, tp.tok, tp.pos FROM tp$i tp
         WHERE NOT EXISTS (SELECT 1 FROM sp$i sp
           WHERE sp.doc_id = tp.doc_id
             AND tp.pos >= sp.s0 AND tp.pos < sp.s1)),
       $out AS (SELECT t0.doc_id, COALESCE(ag.t, []) AS t FROM $in t0
         LEFT JOIN (SELECT doc_id, list(tok ORDER BY pos) AS t
                    FROM surv$i GROUP BY 1) ag USING (doc_id))"""
    val chain = (1 to passes)
      .map(i => passCtes(i, s"pass${i - 1}", s"pass$i")).mkString(",\n       ")
    s"""WITH pass0 AS (SELECT doc_id, string_split(text, ' ') AS t
           FROM $table),
       $chain
       SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_before,
         CAST(len(f.t) AS BIGINT) AS n_after,
         CASE WHEN len(f.t) = 0 THEN 0
           ELSE ${graft.text.TextFunctions.sqlFingerprint(
             s"list_aggr(f.t, 'string_agg', ' ')")}
         END AS fp_after
       FROM pass0 b JOIN pass$passes f USING (doc_id)"""
  }

  /** Oracle twin of [[exactSubstringScrub]]: ends in
    * (doc_id, n_before, n_after, fp_after). */
  def sqlExactSubstringScrub(table: String, k: Int,
      minDocs: Int = 2): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
           FROM $table),
       wins AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS start,
           list_aggr(t[i:i+${k - 1}], 'string_agg', ' ') AS kg
         FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t) - ${k - 1})) AS i
               FROM toks WHERE len(t) >= $k)),
       dup AS (SELECT kg FROM wins
         GROUP BY kg HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       dw AS (SELECT doc_id, start, kg FROM wins JOIN dup USING (kg)),
       own AS (SELECT kg, doc_id AS od, start AS os FROM (
           SELECT kg, doc_id, start, row_number()
               OVER (PARTITION BY kg ORDER BY doc_id, start) AS rn
           FROM dw) WHERE rn = 1),
       cut AS (SELECT d.doc_id, d.start FROM dw d JOIN own o ON d.kg = o.kg
         WHERE NOT (d.doc_id = o.od AND d.start = o.os)),
       isl AS (SELECT doc_id, start,
           SUM(CASE WHEN prev IS NULL OR start > prev + $k
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS UNBOUNDED PRECEDING) AS island
         FROM (SELECT doc_id, start,
                 lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
               FROM cut)),
       sp AS (SELECT doc_id, MIN(start) AS s0, MAX(start) + $k AS s1
         FROM isl GROUP BY doc_id, island),
       tp AS (SELECT doc_id, tok, CAST(i - 1 AS BIGINT) AS pos
         FROM (SELECT doc_id, unnest(t) AS tok,
                 unnest(generate_series(1, len(t))) AS i FROM toks)),
       surv AS (SELECT tp.doc_id, tp.tok, tp.pos FROM tp
         WHERE NOT EXISTS (SELECT 1 FROM sp
           WHERE sp.doc_id = tp.doc_id
             AND tp.pos >= sp.s0 AND tp.pos < sp.s1)),
       ag AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_after,
           string_agg(tok, ' ' ORDER BY pos) AS scrubbed
         FROM surv GROUP BY 1)
       SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_before,
         COALESCE(ag.n_after, 0) AS n_after,
         CASE WHEN COALESCE(ag.n_after, 0) = 0 THEN 0
           ELSE ${graft.text.TextFunctions.sqlFingerprint("ag.scrubbed")}
         END AS fp_after
       FROM toks d LEFT JOIN ag USING (doc_id)"""

  /** Oracle twin of [[exactSubstringSpans]] (no prefilter — it is
    * semantics-free): ends in (doc_id, n_dup_windows, n_spans,
    * covered_tokens). */
  def sqlExactSubstringSpans(table: String, k: Int,
      minDocs: Int = 2): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
           FROM $table),
       wins AS (SELECT doc_id, i - 1 AS start,
           list_aggr(t[i:i+${k - 1}], 'string_agg', ' ') AS kg
         FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t) - ${k - 1})) AS i
               FROM toks WHERE len(t) >= $k)),
       dup AS (SELECT kg FROM wins
         GROUP BY kg HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       dw AS (SELECT doc_id, CAST(start AS BIGINT) AS start
         FROM wins JOIN dup USING (kg)),
       isl AS (SELECT doc_id, start,
           SUM(CASE WHEN prev IS NULL OR start > prev + $k
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY start
                   ROWS UNBOUNDED PRECEDING) AS island
         FROM (SELECT doc_id, start,
                 lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
               FROM dw)),
       sp AS (SELECT doc_id, island, COUNT(1) AS n_w,
           MIN(start) AS s0, MAX(start) + $k AS s1
         FROM isl GROUP BY 1, 2)
       SELECT doc_id, CAST(SUM(n_w) AS BIGINT) AS n_dup_windows,
         COUNT(1) AS n_spans,
         CAST(SUM(s1 - s0) AS BIGINT) AS covered_tokens
       FROM sp GROUP BY 1"""

  /** One SNM candidate pass: (lang, key)-sorted window, lead()
    * neighbors, normalized (da < db) pairs. */
  private def snmCandidates(docs: DataFrame, window: Int,
      key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("k"), col("doc_id"))
    val nbrs = array((1 until window).map(d => lead(col("doc_id"), d).over(w)): _*)
    docs
      .select(col("doc_id"), col("lang"), key.as("k"))
      .withColumn("nbrs", nbrs) // window exprs resolve before the generator
      .select(col("doc_id"), explode(col("nbrs")).as("nb"))
      .filter(col("nb").isNotNull)
      .select(least(col("doc_id"), col("nb")).as("da"),
        greatest(col("doc_id"), col("nb")).as("db"))
  }
}
