package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NearestCell
import graft.graph.Algorithms

/** Persistable IVF index — the ANN *serving* shape: train the coarse
  * quantizer once, write the cell-assigned corpus as a catalog table
  * bucketed on the cell id, and serve top-k queries against it
  * without re-clustering or re-shuffling the corpus.
  *
  * 100 TB posture: the corpus is written bucketed by `cell`, so a
  * probe query's candidate join clusters on the bucket layout instead
  * of exchanging the corpus, and cell-equality predicates prune
  * buckets at scan time. Centroids are k x dim scalars stored as a
  * tiny parquet side table and re-embedded into the codegen'd
  * NearestCell expressions at load. Parquet round-trips doubles
  * bit-exactly, so a loaded index answers queries identically to the
  * just-trained one (asserted in IvfIndexSpec).
  */
object IvfIndex {

  /** Train on `corpus` (vec_id, embedding, metadata...) and persist
    * under `table` (+ `table_centroids`): corpus bucketed by cell.
    * Metadata columns beyond (vec_id, embedding) ride along into the
    * stored table — the vector-store serving shape, where every
    * vector carries filterable attributes (label, source, license,
    * timestamp) and filtered search prunes on them AT THE SCAN
    * (see [[searchGrown]]'s `pred`). */
  def write(corpus: DataFrame, table: String, nlist: Int = 16,
      iterations: Int = 3, buckets: Int = 16): Unit = {
    val spark = corpus.sparkSession
    Seq(table, s"${table}_centroids")
      .foreach(n => graft.api.Bucketing.resetManaged(spark, n))
    val pts = corpus.select(col("vec_id").as("id"), col("embedding").as("features"))
    val cells = Algorithms.kMeansCentroids(pts, nlist, iterations)
    import spark.implicits._
    // centroid sidecar and bucketed corpus are independent consumers
    // of the trained (driver-local) centroids — overlapped (guide
    // §2.6, r18)
    graft.api.Overlap.run(
      () => cells.zipWithIndex
        .map { case (cent, cid) => (cid, cent.toSeq) }.toSeq
        .toDF("cid", "cent")
        .coalesce(1)
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_centroids"),
      () => graft.api.Bucketing.writeBucketed(
        corpus.select(col("*"),
          NearestCell.nearestCell(col("embedding"), cells).as("cell")),
        table, Seq("cell"), buckets))
  }


  /** Bounded-by-contract query frames collect ONCE and feed the
    * broadcast side as a local relation (r17, the
    * PostingsIndex.searchParts treatment): the broadcast was already
    * a driver collect of these rows — this just stops the query
    * frame's SOURCE plan (a filtered corpus scan) from re-executing
    * as the broadcast build. */
  private def localQueries(queries: DataFrame): DataFrame = {
    val qProj = queries.select(col("vec_id"), col("embedding"))
    // bounded-contract guard (ADVICE r17 #4): post-collect row-count
    // assertion — see Similarity.localized for why the guard is NOT a
    // limit pushed into the collect (measured 2-4 sequential take
    // jobs) and how spark.driver.maxResultSize covers the far end
    val rows = qProj.collect()
    require(rows.length <= Similarity.MaxLocalRows,
      s"bounded-query contract violated: ${rows.length} query rows " +
        s"collected to the driver (cap ${Similarity.MaxLocalRows} — " +
        "queries are a bounded suite, never a corpus)")
    queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), qProj.schema)
  }

  /** Load the centroid matrix back (row index = cell id). */
  def loadCentroids(spark: SparkSession, table: String): Array[Array[Double]] =
    spark.table(s"${table}_centroids")
      .orderBy(col("cid"))
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Top-k cosine search against a persisted index: queries probe
    * their `nprobe` nearest cells; the cell-equality join reads only
    * matching buckets of the corpus table. Same ranking contract as
    * Similarity.ivfTopK (sim desc, cid tiebreak).
    *
    * `excludeSelf` (default true — the kNN-graph contract, where qid
    * IS a corpus vec_id) drops qid == cid candidates; SERVING paths
    * whose qids come from a separate id space must pass false, or a
    * corpus vector whose vec_id collides with a query id silently
    * vanishes from that query's candidates (ADVICE r12). */
  def search(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, nprobe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    import graft.sim.Similarity.simRounded
    val cells = loadCentroids(spark, table)
    val cb = spark.table(table)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("cell"))
    val qb = broadcast(
      localQueries(queries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .withColumn("cell", explode(NearestCell.nearestCells(col("qv"), cells, nprobe))))
    val cand = qb.join(cb, Seq("cell"))
      .filter(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .select(col("qid"), col("cid"), simRounded(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rk"))
  }

  // ---- growing index: LSM-style extents (r9) --------------------------
  //
  // The ANN twin of [[graft.dedup.DedupIndex]]'s growth shape: a
  // corpus that grows with the crawl must admit new vectors without
  // re-clustering or re-shuffling the stored corpus. The coarse
  // quantizer is FROZEN between retrains (the standard IVF serving
  // contract — cell geometry drifts only as fast as the data
  // distribution), so admission is one narrow assignment pass over
  // the batch, landed in the batch's own extent partition (replay
  // overwrites itself: idempotent). Search probes base + extents as
  // SEPARATE parts (never unioned before the join — that would erase
  // the base bucketing, the exact O(index) trap measured on the dedup
  // index, docs/SCALE.md) and merges candidates in the one per-query
  // ranking window it already pays. [[compact]] folds extents into
  // the bucketed base.

  /** Extent directory of a growing index. */
  def extentPath(growPath: String): String = growPath + "/cells"

  /** Tombstone directory of a growing index (deleted vec_ids). */
  def tombstonePath(growPath: String): String = growPath + "/tombstones"

  /** Delete vectors from a growing index WITHOUT rewriting anything:
    * the ids land as the batch's own tombstone partition (idempotent
    * replay, the extent contract) and [[searchGrown]] anti-joins them
    * off the candidate set; [[compact]] applies them physically and
    * clears the directory. Between compactions the tombstone set is
    * delete-rate bounded — the same LSM argument as the extents
    * (never corpus-sized), so the anti-join side stays small and AQE
    * broadcasts it from runtime stats; no hard hint. */
  def delete(spark: SparkSession, growPath: String, ids: DataFrame,
      batchId: Long): Unit = {
    // finish any interrupted tiered swap FIRST (review r13) — see
    // the admit-side comment
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode("overwrite")
      .parquet(s"${tombstonePath(growPath)}/batch_id=$batchId")
  }

  private def tombstones(spark: SparkSession, growPath: String): Option[DataFrame] =
    if (dirExists(spark, tombstonePath(growPath)))
      Some(spark.read.schema("vec_id LONG, batch_id LONG")
        .parquet(tombstonePath(growPath)).select(col("vec_id")))
    else None

  /** Extent read schema = the base table's columns + the batch_id
    * partition column: explicit (not inferred) so an empty extent
    * partition can't break inference, and derived from the base so
    * metadata columns survive the round-trip. */
  private def extSchema(spark: SparkSession, table: String) =
    org.apache.spark.sql.types.StructType(
      spark.table(table).schema.fields :+
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType))

  /** Admit one batch of new vectors: assign each to its nearest
    * TRAINED cell and append as the batch's own extent partition.
    * Batch columns must match the base corpus (vec_id, embedding,
    * metadata...); the cell column is computed here. */
  def admit(spark: SparkSession, table: String, growPath: String,
      batch: DataFrame, batchId: Long): Unit = {
    // finish any interrupted tiered swap FIRST (review r13): a
    // mutation landing between a crash and its recovery must not be
    // built on half-swapped state, and — with the plan's recorded
    // partition sets — can never be deleted by a later replay
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    val cells = loadCentroids(spark, table)
    batch.select(col("*"),
        NearestCell.nearestCell(col("embedding"), cells).as("cell"))
      .withColumn("vec_id", col("vec_id").cast("long"))
      .write.mode("overwrite")
      .parquet(s"${extentPath(growPath)}/batch_id=$batchId")
  }

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** MERGE independently-built IVF shards into one served index
    * (VERDICT r12 #6 — build shards in parallel, serve one). The
    * merged index adopts the FIRST shard's trained quantizer: cell
    * geometry is serving state and two geometries cannot both
    * survive — this is the frozen-quantizer admission contract
    * extended across shards. Every other shard's LIVE vectors
    * (base + extents, tombstone-masked) re-assign to the primary
    * cells — the same narrow pass [[admit]] runs per batch — and the
    * union re-buckets once; the primary's centroid table copies
    * over. Grow state is CONSUMED (applied physically, like
    * [[compact]]); [[retrain]] on the merged index re-learns
    * geometry from the union when drift warrants it.
    *
    * Equivalence contract (IvfIndexSpec): search(merged) ≡
    * searchGrown(primary shard with every other shard's live vectors
    * admitted as extents) — identical candidates and ranking,
    * because both sides quantize with the primary geometry.
    *
    * 100 TB posture: one narrow assignment projection over the
    * non-primary shards + one bucketed shuffle over the union — the
    * cost of [[write]] minus the k-means training pass, which is
    * what sharding parallelized. */
  def merge(spark: SparkSession, shards: Seq[(String, Option[String])],
      outTable: String, buckets: Int = 16): Unit = {
    require(shards.nonEmpty, "merge needs at least one shard")
    require(!shards.exists(_._1 == outTable),
      "merge target must not be one of the shards")
    // Finish any interrupted tiered swap before consuming a shard's
    // grow state — same hardening as admit/forget/compactTiered
    // (ADVICE r13; see PostingsIndex.merge).
    shards.foreach { case (_, grow) =>
      grow.foreach(g => graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(g)))
    }
    val cells = loadCentroids(spark, shards.head._1)
    def live(tbl: String, grow: Option[String]): DataFrame = {
      val ts = grow.flatMap(g => tombstones(spark, g))
      val parts = Seq(spark.table(tbl)) ++ grow.toSeq.collect {
        case g if dirExists(spark, extentPath(g)) =>
          spark.read.schema(extSchema(spark, tbl))
            .parquet(extentPath(g)).drop("batch_id")
      }
      val all = parts.reduce(_ unionByName _)
      ts.fold(all)(t => all.join(t, Seq("vec_id"), "left_anti"))
    }
    val primary = live(shards.head._1, shards.head._2)
    val reassigned = shards.tail.map { case (tbl, grow) =>
      live(tbl, grow).drop("cell")
        .select(col("*"), NearestCell.nearestCell(col("embedding"), cells).as("cell"))
    }
    Seq(outTable, s"${outTable}_centroids")
      .foreach(n => graft.api.Bucketing.resetManaged(spark, n))
    // centroid copy and merged bucketed write are independent —
    // overlapped (guide §2.6, r18)
    graft.api.Overlap.run(
      () => spark.table(s"${shards.head._1}_centroids")
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(s"${outTable}_centroids"),
      () => graft.api.Bucketing.writeBucketed(
        (Seq(primary) ++ reassigned).reduce(_ unionByName _),
        outTable, Seq("cell"), buckets))
  }

  /** Top-k cosine search against base + every admitted extent. Same
    * ranking contract as [[search]]; with no extents the two are
    * plan-identical.
    *
    * `pred` is the filtered-ANN serving primitive (VERDICT r9 #6): a
    * metadata predicate over the index's stored columns (e.g.
    * `col("label").isin(1, 4, 7)`), applied to EACH index part's scan
    * BEFORE the candidate join — Catalyst pushes it into the parquet
    * scan (PushedFilters; asserted in PlanAuditSpec), so filtered
    * search reads strictly less than unfiltered instead of filtering
    * candidates post-join. Ranks are computed over the filtered
    * corpus only, which is the contract a vector store's
    * metadata-filtered query needs (top-k OF THE ALLOWED SET, not
    * allowed-members of the global top-k). */
  def searchGrown(spark: SparkSession, table: String, growPath: String,
      queries: DataFrame, k: Int, nprobe: Int = 4,
      pred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import graft.sim.Similarity.simRounded
    val cells = loadCentroids(spark, table)
    val qb = broadcast(
      localQueries(queries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .withColumn("cell", explode(NearestCell.nearestCells(col("qv"), cells, nprobe))))
    val parts: Seq[DataFrame] =
      spark.table(table) +:
        (if (dirExists(spark, extentPath(growPath)))
          Seq(spark.read.schema(extSchema(spark, table))
            .parquet(extentPath(growPath)))
        else Nil)
    val cand = parts
      .map { p =>
        val cb = pred.map(p.filter).getOrElse(p)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"),
            col("cell"))
        qb.join(cb, Seq("cell")).filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"), simRounded(col("qv"), col("cv")).as("sim"))
      }
      .reduce(_ unionByName _)
    // tombstoned vectors drop out of the candidate set BEFORE the rank
    // window, so ranks are over live vectors only (a deleted vector
    // must not eat a top-k slot)
    val live = tombstones(spark, growPath).fold(cand)(ts =>
      cand.join(ts.select(col("vec_id").as("cid")), Seq("cid"), "left_anti"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    live.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rk"))
  }

  /** Fold every extent into the bucketed base table, APPLY tombstones
    * physically, and delete both directories — cell assignments are
    * already final (frozen quantizer), so compaction is a straight
    * rewrite, no retrain. Callers must not run it while admissions or
    * deletes are active. */
  def compact(spark: SparkSession, table: String, growPath: String,
      buckets: Int = 16): Unit = {
    val hasExtents = dirExists(spark, extentPath(growPath))
    val hasTombs = dirExists(spark, tombstonePath(growPath))
    if (!hasExtents && !hasTombs) return
    val staging = growPath + "/_compact_staging"
    val unioned =
      if (hasExtents)
        spark.table(table)
          .unionByName(spark.read.schema(extSchema(spark, table))
            .parquet(extentPath(growPath)).drop("batch_id"))
      else spark.table(table)
    tombstones(spark, growPath).fold(unioned)(ts =>
        unioned.join(ts, Seq("vec_id"), "left_anti"))
      .write.mode("overwrite").parquet(staging)
    graft.api.Bucketing.resetManaged(spark, table)
    graft.api.Bucketing.writeBucketed(spark.read.parquet(staging),
      table, Seq("cell"), buckets)
    val root = new org.apache.hadoop.fs.Path(growPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(extentPath(growPath), tombstonePath(growPath), staging)
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }

  /** Size-tiered compaction (the [[graft.text.PostingsIndex
    * .compactTiered]] discipline applied to the vector index —
    * VERDICT r11 #4 extended to all LSM families): below
    * `maxExtentFraction` of the base's row mass, the extents fold
    * into ONE consolidated extent partition (batch_id =
    * [[graft.text.PostingsIndex.ConsolidatedBatchId]]) with
    * extent-hitting tombstones applied physically; base-hitting
    * tombstones survive (still masked by [[searchGrown]]'s
    * anti-join) and the bucketed base + centroids are untouched —
    * O(extent) instead of O(index) write amplification. Above the
    * threshold, delegates to the full [[compact]]. Cell assignments
    * are final (frozen quantizer), so consolidation is a straight
    * rewrite. Same caller contract as compact. Spec-pinned in
    * IvfIndexSpec: base files byte-identical below threshold, search
    * ≡ pre-compaction ≡ live brute force.
    *
    * Threshold sizing: the base-side `count()` is a parquet
    * metadata/footer pass (vectorized count, no row data) — cheap but
    * O(file count); an index that compacts at high frequency should
    * maintain a 1-row stats sidecar instead (the PostingsIndex stats
    * table is the template; documented trade, review r12 #9). */
  def compactTiered(spark: SparkSession, table: String, growPath: String,
      buckets: Int = 16, maxExtentFraction: Double = 0.2): Unit = {
    // AUTO-RECOVER first (r13): re-running compactTiered is the
    // natural operator response to a crash, but staging over a
    // HALF-SWAPPED index would consolidate inconsistent state — an
    // interrupted generation must finish before a new one stages
    // (no-op when there is nothing to recover)
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    val hasExt = dirExists(spark, extentPath(growPath))
    if (!hasExt) return compact(spark, table, growPath, buckets)
    val ext = spark.read.schema(extSchema(spark, table))
      .parquet(extentPath(growPath)).drop("batch_id")
    // two independent metadata-count jobs — overlapped (guide §2.6)
    val counts = graft.api.Overlap.all(Seq(
      () => spark.table(table).count(),
      () => ext.count()))
    val (baseN, extN) = (counts(0), counts(1))
    if (baseN <= 0 || extN.toDouble / baseN >= maxExtentFraction)
      return compact(spark, table, growPath, buckets)
    val staging = graft.api.Lsm.stagingRoot(growPath)
    val ts = tombstones(spark, growPath)
    // staged consolidated extent and surviving-tombstone writes are
    // independent — overlapped; the survivor count rides the write as
    // an observed metric instead of a read-back count job (the
    // PostingsIndex.writeStatsRow pattern and deployment note)
    val remainingCnt = new java.util.concurrent.atomic.AtomicLong(0L)
    graft.api.Overlap.run(Seq(
      () => ts.fold(ext)(t => ext.join(t, Seq("vec_id"), "left_anti"))
        .write.mode("overwrite").parquet(staging + "/cells")) ++
      ts.toSeq.map { t => () =>
        val obs = org.apache.spark.sql.Observation()
        t.distinct()
          .join(ext.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(staging + "/tombstones")
        remainingCnt.set(obs.get("n").asInstanceOf[Long])
      }: _*)
    graft.api.Lsm.swapConsolidated(spark, staging,
      Seq(staging + "/cells" -> extentPath(growPath)),
      if (remainingCnt.get > 0) Some(staging + "/tombstones") else None,
      tombstonePath(growPath))
  }

  /** Retrain the coarse quantizer on the LIVE corpus (base + extents
    * − tombstones) and rebuild the index around the NEW cell geometry
    * — the lifecycle stage [[compact]] cannot provide (VERDICT r10
    * #3 closes the write → admit → delete → filtered-search → compact
    * → RETRAIN loop): compact folds extents but keeps the frozen
    * cells, and a corpus whose distribution drifts far enough from
    * the training snapshot degrades probe recall (queries probe the
    * nprobe nearest CELLS; cells that no longer tile the data well
    * make the true neighbors land outside them). Retrain is by
    * definition a fresh [[write]] of the live corpus — new centroids,
    * full reassignment, rewritten bucketed base — which is exactly
    * the oracle contract (search-after-retrain ≡ search against a
    * fresh write; pinned in IvfIndexSpec and q_knn_retrain). Extents
    * and tombstones are consumed and cleared; the staging step exists
    * because the base table cannot be overwritten while being read.
    *
    * 100 TB posture: one full-corpus pass (assignment) + k-means on a
    * dim-bounded centroid state — the same O(corpus) cost class as
    * compact, run at the same cadence (rare, scheduled, stream
    * paused). Admission stays O(delta) between retrains; this is the
    * planned periodic rebuild, not a per-batch cost. */
  def retrain(spark: SparkSession, table: String, growPath: String,
      nlist: Int = 0, iterations: Int = 3, buckets: Int = 16): Unit = {
    // nlist <= 0 (the default) derives the cell count from the STORED
    // centroids: an index written with a non-default nlist must not
    // silently change geometry class on a bare retrain() call (the
    // cell COUNT is preserved; the cells themselves retrain — that is
    // the point). Pass nlist explicitly to re-size on purpose.
    val k = if (nlist > 0) nlist else loadCentroids(spark, table).length
    val staging = growPath + "/_retrain_staging"
    val unioned =
      if (dirExists(spark, extentPath(growPath)))
        spark.table(table)
          .unionByName(spark.read.schema(extSchema(spark, table))
            .parquet(extentPath(growPath)).drop("batch_id"))
      else spark.table(table)
    val live = tombstones(spark, growPath).fold(unioned)(ts =>
      unioned.join(ts, Seq("vec_id"), "left_anti"))
    live.drop("cell").write.mode("overwrite").parquet(staging)
    write(spark.read.parquet(staging), table, k, iterations, buckets)
    val root = new org.apache.hadoop.fs.Path(growPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(extentPath(growPath), tombstonePath(growPath), staging)
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }

  // ---- int8-quantized variant (VERDICT r7 #3) -------------------------

  /** Float-vector side table of the int8 index: (vec_id, embedding)
    * bucketed on vec_id — floats stored ONCE, fetched by id only for
    * re-rank survivors (the [[graft.dedup.DedupIndex]] `_sv`
    * normalization applied to ANN). */
  def vecsTable(table: String): String = table + "_vecs"

  /** Train + persist the int8-quantized IVF index: the scan table
    * `<table>` carries (vec_id, cell, codes array<tinyint>, scale_q,
    * normq) bucketed on cell — 1 byte/element through the candidate
    * scan instead of 4 (the memory-bandwidth win the quantizer exists
    * for) — plus `<table>_vecs` (floats by id, re-rank side) and
    * `<table>_centroids`. `normq` = Σ codes² is precomputed once at
    * write time so the scan's approximate-cosine needs only the
    * int8 dot against the query codes. */
  def writeInt8(corpus: DataFrame, table: String, nlist: Int = 16,
      iterations: Int = 3, buckets: Int = 16): Unit = {
    val spark = corpus.sparkSession
    Seq(table, vecsTable(table), s"${table}_centroids")
      .foreach(n => graft.api.Bucketing.resetManaged(spark, n))
    val pts = corpus.select(col("vec_id").as("id"), col("embedding").as("features"))
    val cells = Algorithms.kMeansCentroids(pts, nlist, iterations)
    import spark.implicits._
    val coded = graft.sim.Quantize.withInt8Codes(corpus)
      .withColumn("normq",
        graft.functions.Int8Dot.int8Dot(col("codes"), col("codes")))
    // metadata columns (label, source, ...) ride into the SCAN table —
    // the float embedding stays excluded (the bandwidth win), but a
    // filtered search must prune on metadata at the codes scan
    val meta = corpus.columns.toSeq
      .filterNot(Set("vec_id", "embedding")).map(col)
    // the three writes (centroid sidecar, codes table, float side
    // table) are independent — overlapped (guide §2.6, r18)
    graft.api.Overlap.run(
      () => cells.zipWithIndex
        .map { case (cent, cid) => (cid, cent.toSeq) }.toSeq
        .toDF("cid", "cent")
        .coalesce(1)
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${table}_centroids"),
      () => graft.api.Bucketing.writeBucketed(
        coded.select(Seq(col("vec_id"),
          NearestCell.nearestCell(col("embedding"), cells).as("cell"),
          col("codes"), col("scale_q"), col("normq")) ++ meta: _*),
        table, Seq("cell"), buckets),
      () => graft.api.Bucketing.writeBucketed(
        corpus.select(col("vec_id"), col("embedding")),
        vecsTable(table), Seq("vec_id"), buckets))
  }

  /** Top-k cosine search against a persisted int8 index, two-stage:
    *
    * 1. int8 scan — candidates from the `nprobe` probed cells are
    *    ranked by the EXACT-integer approximate cosine
    *    `dotq / sqrt(normq)` (query/corpus scales cancel out of
    *    cosine, so neither is needed for ranking; dotq and normq are
    *    exact longs, the divide+sqrt is one fixed IEEE expression —
    *    deterministic and SQL-replayable) and cut to the top
    *    `rerankC` per query. The scan reads codes+normq only — the
    *    float column never rides the candidate join.
    * 2. float re-rank — the surviving (qid, cid) pairs fetch exact
    *    floats BY ID from the vec_id-bucketed side table and are
    *    re-ranked by the exact [[Similarity.simRounded]] cosine.
    *
    * Zero-vector guard: all-zero codes give normq = 0 and sort last
    * (score -1e9, below any cosine). Same ranking contract as
    * [[search]] (sim desc, cid tiebreak).
    *
    * `pred` (VERDICT r9 #6, int8 leg): metadata predicate applied to
    * the CODES scan before the candidate join — pushed into the
    * bucketed parquet scan, so both the int8 stage and the float
    * re-rank only ever see allowed vectors, and ranks (incl. the
    * rerankC cut) are over the allowed set only. */
  def searchInt8(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, nprobe: Int = 4, rerankC: Int = 25,
      pred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import graft.sim.Similarity.simRounded
    import graft.functions.Int8Dot.int8Dot
    val cells = loadCentroids(spark, table)
    val cb = pred.map(spark.table(table).filter).getOrElse(spark.table(table))
      .select(col("vec_id").as("cid"), col("codes").as("ccodes"),
        col("normq"), col("cell"))
    val qb = broadcast(
      graft.sim.Quantize.withInt8Codes(
          localQueries(queries).select(col("vec_id").as("qid"), col("embedding")))
        .select(col("qid"), col("embedding").as("qv"), col("codes").as("qcodes"))
        .withColumn("cell", explode(NearestCell.nearestCells(col("qv"), cells, nprobe))))
    val scoreq = when(col("normq") === 0, lit(-1e9)).otherwise(
      int8Dot(col("qcodes"), col("ccodes")).cast("double") /
        sqrt(col("normq").cast("double")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("scoreq").desc, col("cid"))
    val topC = qb.join(cb, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qv"), col("cid"), scoreq.as("scoreq"))
      .withColumn("rkq", row_number().over(wq)).filter(col("rkq") <= rerankC)
    val vecs = spark.table(vecsTable(table))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    topC.join(vecs, Seq("cid"))
      .select(col("qid"), col("cid"), simRounded(col("qv"), col("cv")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rk"))
  }

  /** Drop all tables of an int8 index. */
  def dropInt8(spark: SparkSession, table: String): Unit =
    Seq(table, vecsTable(table), s"${table}_centroids")
      .foreach(n => graft.api.Bucketing.resetManaged(spark, n))

  // ---- growing int8 index (r11: lifecycle parity with the float path)
  //
  // The quantized serving index must grow with the crawl too: the
  // same LSM extent shape as the float path, except each admission
  // writes TWO extent families — the codes rows (the scan side) and
  // the float rows (the re-rank side) — mirroring the base index's
  // two-table normalization. Quantization is per-vector (scale from
  // the vector itself), so admitting against the FROZEN quantizer is
  // bit-identical to having had the vector at write time — which is
  // exactly the oracle/spec contract.

  /** Codes-extent directory of a growing int8 index. */
  def int8CodesPath(growPath: String): String = growPath + "/codes"

  /** Float-vector extent directory of a growing int8 index. */
  def int8VecsPath(growPath: String): String = growPath + "/vecs"

  /** Admit one batch of new vectors to a persisted int8 index:
    * quantize, assign to the frozen quantizer's nearest cell, land
    * codes + floats as the batch's own extent partitions (idempotent
    * replay). Metadata columns ride into the codes extent like the
    * base write. [[delete]] works unchanged on a growing int8 index
    * (the tombstone dir is shared across both index kinds). */
  def admitInt8(spark: SparkSession, table: String, growPath: String,
      batch: DataFrame, batchId: Long): Unit = {
    // finish any interrupted tiered swap FIRST (review r13): a
    // mutation landing between a crash and its recovery must not be
    // built on half-swapped state, and — with the plan's recorded
    // partition sets — can never be deleted by a later replay
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    val cells = loadCentroids(spark, table)
    val coded = graft.sim.Quantize.withInt8Codes(batch)
      .withColumn("normq",
        graft.functions.Int8Dot.int8Dot(col("codes"), col("codes")))
    val meta = batch.columns.toSeq
      .filterNot(Set("vec_id", "embedding")).map(col)
    // codes extent and float extent are independent — overlapped
    // (guide §2.6, r18); both are idempotent per-partition overwrites,
    // so crash/replay semantics are unchanged
    graft.api.Overlap.run(
      () => coded.select(Seq(col("vec_id").cast("long").as("vec_id"),
          NearestCell.nearestCell(col("embedding"), cells).as("cell"),
          col("codes"), col("scale_q"), col("normq")) ++ meta: _*)
        .write.mode("overwrite")
        .parquet(s"${int8CodesPath(growPath)}/batch_id=$batchId"),
      () => batch.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
        .write.mode("overwrite")
        .parquet(s"${int8VecsPath(growPath)}/batch_id=$batchId"))
  }

  private def int8ExtSchema(spark: SparkSession, table: String) =
    org.apache.spark.sql.types.StructType(
      spark.table(table).schema.fields :+
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType))

  private def int8VecsExtSchema(spark: SparkSession, table: String) =
    org.apache.spark.sql.types.StructType(
      spark.table(vecsTable(table)).schema.fields :+
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType))

  /** [[searchInt8]] against base + every admitted extent: the int8
    * candidate stage scans base codes (bucketed) and codes extents as
    * SEPARATE parts (the union-erases-bucketing trap, as searchGrown);
    * tombstoned ids drop out of the candidate set BEFORE the rerank
    * cut (a deleted vector must not eat a rerank slot either); the
    * float re-rank fetches by id from base vecs + vecs extents. Same
    * ranking contract as [[searchInt8]]; `pred` prunes each codes
    * part's scan. */
  def searchInt8Grown(spark: SparkSession, table: String, growPath: String,
      queries: DataFrame, k: Int, nprobe: Int = 4, rerankC: Int = 25,
      pred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import graft.sim.Similarity.simRounded
    import graft.functions.Int8Dot.int8Dot
    val cells = loadCentroids(spark, table)
    val qb = broadcast(
      graft.sim.Quantize.withInt8Codes(
          localQueries(queries).select(col("vec_id").as("qid"), col("embedding")))
        .select(col("qid"), col("embedding").as("qv"), col("codes").as("qcodes"))
        .withColumn("cell", explode(NearestCell.nearestCells(col("qv"), cells, nprobe))))
    val codesParts: Seq[DataFrame] =
      spark.table(table) +:
        (if (dirExists(spark, int8CodesPath(growPath)))
          Seq(spark.read.schema(int8ExtSchema(spark, table))
            .parquet(int8CodesPath(growPath)))
        else Nil)
    val scoreq = when(col("normq") === 0, lit(-1e9)).otherwise(
      int8Dot(col("qcodes"), col("ccodes")).cast("double") /
        sqrt(col("normq").cast("double")))
    val cand = codesParts
      .map { p =>
        val cb = pred.map(p.filter).getOrElse(p)
          .select(col("vec_id").as("cid"), col("codes").as("ccodes"),
            col("normq"), col("cell"))
        qb.join(cb, Seq("cell")).filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("qv"), col("qcodes"), col("cid"),
            col("ccodes"), col("normq"))
      }
      .reduce(_ unionByName _)
      .select(col("qid"), col("qv"), col("cid"), scoreq.as("scoreq"))
    val live = tombstones(spark, growPath).fold(cand)(ts =>
      cand.join(ts.select(col("vec_id").as("cid")), Seq("cid"), "left_anti"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("scoreq").desc, col("cid"))
    val topC = live.withColumn("rkq", row_number().over(wq))
      .filter(col("rkq") <= rerankC)
    val vecsBase = spark.table(vecsTable(table))
      .select(col("vec_id"), col("embedding"))
    val vecs = (if (dirExists(spark, int8VecsPath(growPath)))
        vecsBase.unionByName(
          spark.read.schema(int8VecsExtSchema(spark, table))
            .parquet(int8VecsPath(growPath)).drop("batch_id"))
      else vecsBase)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    topC.join(vecs, Seq("cid"))
      .select(col("qid"), col("cid"), simRounded(col("qv"), col("cv")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rk"))
  }

  /** Retrain the int8 index's coarse quantizer on the LIVE corpus and
    * rebuild both tables — the quantized twin of [[retrain]], closing
    * the int8 lifecycle (write → admit → delete → filtered search →
    * compact → retrain). The live FLOAT vectors (base vecs + vecs
    * extents − tombstones) are the training and re-quantization
    * input; codes are per-vector, so [[writeInt8]] on the staged live
    * corpus is definitionally the fresh-write contract. Same O(corpus)
    * cost class and cadence as [[compactInt8]]. */
  def retrainInt8(spark: SparkSession, table: String, growPath: String,
      nlist: Int = 0, iterations: Int = 3, buckets: Int = 16): Unit = {
    // nlist <= 0 derives the stored cell count, as [[retrain]]
    val k = if (nlist > 0) nlist else loadCentroids(spark, table).length
    val staging = growPath + "/_retrain_staging"
    val vecsBase = spark.table(vecsTable(table))
      .select(col("vec_id"), col("embedding"))
    val unioned =
      if (dirExists(spark, int8VecsPath(growPath)))
        vecsBase.unionByName(
          spark.read.schema(int8VecsExtSchema(spark, table))
            .parquet(int8VecsPath(growPath)).drop("batch_id"))
      else vecsBase
    // metadata columns live on the CODES side — carry them through
    // the rebuild by joining codes metadata onto the live floats
    val metaCols = spark.table(table).columns.toSeq
      .filterNot(Set("vec_id", "cell", "codes", "scale_q", "normq"))
    val codesBase = spark.table(table)
    val codesAll =
      if (dirExists(spark, int8CodesPath(growPath)))
        codesBase.unionByName(
          spark.read.schema(int8ExtSchema(spark, table))
            .parquet(int8CodesPath(growPath)).drop("batch_id"))
      else codesBase
    val withMeta =
      if (metaCols.isEmpty) unioned
      else unioned.join(
        codesAll.select((Seq(col("vec_id")) ++ metaCols.map(col)): _*),
        Seq("vec_id"))
    val live = tombstones(spark, growPath).fold(withMeta)(ts =>
      withMeta.join(ts, Seq("vec_id"), "left_anti"))
    live.write.mode("overwrite").parquet(staging)
    writeInt8(spark.read.parquet(staging), table, k, iterations, buckets)
    val root = new org.apache.hadoop.fs.Path(growPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(int8CodesPath(growPath), int8VecsPath(growPath),
        tombstonePath(growPath), staging)
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }

  /** Fold int8 extents into the bucketed base tables, apply
    * tombstones physically to BOTH sides, clear the directories —
    * cell/code assignments are final (frozen quantizer + per-vector
    * quantization), so compaction is a straight rewrite. */
  def compactInt8(spark: SparkSession, table: String, growPath: String,
      buckets: Int = 16): Unit = {
    val hasExt = dirExists(spark, int8CodesPath(growPath))
    val hasTombs = dirExists(spark, tombstonePath(growPath))
    if (!hasExt && !hasTombs) return
    val staging = growPath + "/_compact_staging"
    def live(df: DataFrame) = tombstones(spark, growPath).fold(df)(ts =>
      df.join(ts, Seq("vec_id"), "left_anti"))
    val codes =
      if (hasExt) spark.table(table).unionByName(
        spark.read.schema(int8ExtSchema(spark, table))
          .parquet(int8CodesPath(growPath)).drop("batch_id"))
      else spark.table(table)
    val vecs =
      if (hasExt) spark.table(vecsTable(table)).unionByName(
        spark.read.schema(int8VecsExtSchema(spark, table))
          .parquet(int8VecsPath(growPath)).drop("batch_id"))
      else spark.table(vecsTable(table))
    // staged folds, then bucketed rewrites: each pair's two sides are
    // independent — overlapped (guide §2.6, r18)
    graft.api.Overlap.run(
      () => live(codes).write.mode("overwrite").parquet(staging + "/codes"),
      () => live(vecs).write.mode("overwrite").parquet(staging + "/vecs"))
    graft.api.Bucketing.resetManaged(spark, table)
    graft.api.Bucketing.resetManaged(spark, vecsTable(table))
    graft.api.Overlap.run(
      () => graft.api.Bucketing.writeBucketed(
        spark.read.parquet(staging + "/codes"), table, Seq("cell"), buckets),
      () => graft.api.Bucketing.writeBucketed(
        spark.read.parquet(staging + "/vecs"),
        vecsTable(table), Seq("vec_id"), buckets))
    val root = new org.apache.hadoop.fs.Path(growPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(int8CodesPath(growPath), int8VecsPath(growPath),
        tombstonePath(growPath), staging)
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }
}
