package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Benchmark decontamination for training corpora: flag every corpus
  * document sharing at least `minCommon` word-shingles with any
  * document of a (small) probe/benchmark set — the standard n-gram
  * overlap check run before training to keep eval data out of the
  * training set.
  *
  * 100 TB posture: the probe side is bounded (a benchmark suite, not
  * a corpus), so its exploded shingle set is broadcast and the corpus
  * streams through one narrow explode + broadcast hash join + keyed
  * aggregation — no shuffle of corpus text, no driver state beyond
  * the broadcast. Shingle hashing is the portable TextFunctions
  * arithmetic, so the DuckDB oracle replicates the check exactly.
  */
object Decontaminate {

  /** Per contaminated corpus doc: how many probe docs it overlaps and
    * the largest shingle overlap. Output: (doc_id, n_probes_hit,
    * max_common), only rows with max_common >= minCommon. */
  def flagOverlap(corpus: DataFrame, probes: DataFrame,
      minCommon: Int = 3): DataFrame = {
    val corpusSh = corpus
      .select(col("doc_id"), explode(shingleVals(col("text"))).as("s"))
    val probeSh = probes
      .select(col("doc_id").as("pid"), explode(shingleVals(col("text"))).as("s"))
      .distinct()
    corpusSh.join(broadcast(probeSh), "s")
      .groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_probes_hit"), max(col("common")).as("max_common"))
  }

  /** Bits per probe shingle for [[flagOverlapBloom]]'s filter: k=2
    * hash functions at 16 bits/key → ~1.4% false-positive rate. FPs
    * only cost verify-join work, never correctness. */
  val BloomBitsPerKey = 16

  /** [[flagOverlap]] for probe sets too big to broadcast RAW: a
    * 1e8-shingle eval suite is gigabytes as a broadcast hash set
    * (8-byte hashes + table overhead) but ~200 MB as Bloom BITS at 16
    * bits/key — so the corpus is pre-filtered against a broadcast
    * Bloom bitset and only the surviving shingles (true hits + ~1.4%
    * FPs) enter a KEYED SHUFFLE join against the distributed probe
    * set for exact verification. Same output as [[flagOverlap]] by
    * construction: Bloom filters have no false negatives, and the
    * verify join removes every false positive — which probes land in
    * the FP set cannot affect the result, so the oracle stays the
    * plain [[sqlFlagOverlap]].
    *
    * Plan shape (asserted in DecontaminateSpec): the bitset is built
    * as ≤ m/64 (word, bits) rows via one grouped bit_or — the
    * trailing `.limit(m/64)` is a no-op (word = pos div 64 < m/64 by
    * construction) that makes the bound PLAN-VISIBLE to the
    * suite-wide broadcast audit, the knnQueries discipline. The
    * corpus streams through one explode + two broadcast word-lookup
    * joins + bit tests (all codegen'd), and the only shuffles are
    * survivor-sized. */
  def flagOverlapBloom(corpus: DataFrame, probes: DataFrame,
      minCommon: Int = 3, bitsPerKey: Int = BloomBitsPerKey,
      materialize: Boolean = true): DataFrame = {
    val probeSh = probes
      .select(col("doc_id").as("pid"), explode(shingleVals(col("text"))).as("s"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nKeys = probeSh.select(col("s")).distinct().count().max(1L)
    // next power of two >= nKeys*bitsPerKey so pos % 64 / div 64 are
    // bit ops after codegen; floor at 1024 bits
    val m = java.lang.Long.highestOneBit(
      (nKeys * bitsPerKey).max(1024L) * 2 - 1)
    val maxWords = (m / 64).toInt
    def positions(s: org.apache.spark.sql.Column) = Seq(
      pmod(xxhash64(s), lit(m)), pmod(xxhash64(s, lit(0x9E3779B9L)), lit(m)))
    val bits = probeSh
      .select(explode(array(positions(col("s")): _*)).as("p"))
      .select(expr("p div 64").as("w"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bb"))
      .limit(maxWords)
    val Seq(p1, p2) = positions(col("s"))
    val survivors = corpus
      .select(col("doc_id"), explode(shingleVals(col("text"))).as("s"))
      .withColumn("p1v", p1).withColumn("p2v", p2)
      .withColumn("w1", expr("p1v div 64"))
      .withColumn("b1", expr("shiftleft(1L, cast(p1v % 64 as int))"))
      .withColumn("w2", expr("p2v div 64"))
      .withColumn("b2", expr("shiftleft(1L, cast(p2v % 64 as int))"))
      .join(broadcast(bits.withColumnRenamed("w", "w1")
        .withColumnRenamed("bb", "bb1")), Seq("w1"))
      .filter(expr("(bb1 & b1) != 0"))
      .join(broadcast(bits.withColumnRenamed("w", "w2")
        .withColumnRenamed("bb", "bb2")), Seq("w2"))
      .filter(expr("(bb2 & b2) != 0"))
      .select(col("doc_id"), col("s"))
    // exact verify: keyed shuffle join, survivor-sized on both sides
    // (the probe frame is NOT broadcast — that's the premise)
    val out = survivors.join(probeSh, "s")
      .groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_probes_hit"), max(col("common")).as("max_common"))
    if (materialize) graft.api.Materialize.releasing(out, Seq(probeSh))
    else out
  }

  /** Train/eval split LEAKAGE audit: verified near-duplicate pairs
    * that CROSS the split boundary — the self-contamination a
    * hash-based split cannot prevent (a doc's near-duplicates hash
    * independently, so ~2·p·(1−p) of near-dup pairs straddle an
    * 80/10/10 split's boundaries). This is decontamination turned
    * inward: [[flagOverlap]] guards against eval benchmarks in the
    * training set; this guards against the eval SPLIT seeing
    * paraphrases of training rows. Output: the MinHash-LSH verified
    * pair columns (da, db, common, na, nb) plus both split labels,
    * only for boundary-crossing pairs — the input to a move-or-drop
    * remediation pass.
    *
    * 100 TB posture: the pair frame is the dedup pipeline's own
    * output (O(near-dups), not corpus-sized) and the split labels are
    * per-row hash expressions over the pair's id columns — zero
    * additional scans, joins, or shuffles beyond what the dedup pass
    * already pays. */
  def splitLeakage(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    graft.dedup.Dedup.minhashLshPairs(docs, threshold, materialize = true)
      .withColumn("split_a", graft.pipeline.Sampling.splitLabel(col("da")))
      .withColumn("split_b", graft.pipeline.Sampling.splitLabel(col("db")))
      .filter(col("split_a") =!= col("split_b"))

  /** The REMEDIATION for [[splitLeakage]]: a near-dup-aware split that
    * assigns every near-dup CLUSTER atomically. Clusters come from
    * connected components over the verified MinHash pair graph; each
    * doc's split key is its cluster label (the cluster's min doc_id),
    * falling back to its own id for singletons — so singleton docs
    * keep EXACTLY the plain [[graft.pipeline.Sampling.splitLabel]]
    * assignment (only clustered docs can move), and by construction
    * no verified near-dup pair can cross a split boundary
    * (DecontaminateSpec asserts both).
    *
    * 100 TB posture: the CC runs over the pair graph (O(near-dups)),
    * never the corpus; the corpus-side work is one left join against
    * the (small) vertex-component map plus per-row hash exprs. */
  def leakageSafeSplit(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs, threshold,
      materialize = true)
    val cc = graft.graph.Algorithms.connectedComponents(
      pairs.select(col("da").as("src"), col("db").as("dst")))
    docs.select(col("doc_id"))
      .join(cc.select(col("vertex").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.pipeline.Sampling.splitLabel(
          coalesce(col("component"), col("doc_id"))).as("split"))
  }

  /** SQL twin of [[flagOverlap]] for the DuckDB oracle.
    * `probePred` selects the probe rows out of the documents table. */
  def sqlFlagOverlap(probePred: String, minCommon: Int = 3): String =
    s"""WITH csh AS (
         SELECT doc_id, unnest(${sqlShingleVals3("text")}) AS s
         FROM documents WHERE NOT ($probePred)),
       psh AS (
         SELECT DISTINCT doc_id AS pid, unnest(${sqlShingleVals3("text")}) AS s
         FROM documents WHERE $probePred),
       hits AS (
         SELECT csh.doc_id, psh.pid, COUNT(1) AS common
         FROM csh JOIN psh ON csh.s = psh.s
         GROUP BY csh.doc_id, psh.pid
         HAVING COUNT(1) >= $minCommon)
       SELECT doc_id, COUNT(1) AS n_probes_hit, MAX(common) AS max_common
       FROM hits GROUP BY doc_id"""
}
