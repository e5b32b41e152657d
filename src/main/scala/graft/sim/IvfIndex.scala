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

  /** Train on `corpus` (vec_id, embedding) and persist under
    * `table` (+ `table_centroids`): corpus bucketed by cell. */
  def write(corpus: DataFrame, table: String, nlist: Int = 16,
      iterations: Int = 3, buckets: Int = 16): Unit = {
    val spark = corpus.sparkSession
    val pts = corpus.select(col("vec_id").as("id"), col("embedding").as("features"))
    val cells = Algorithms.kMeansCentroids(pts, nlist, iterations)
    import spark.implicits._
    cells.zipWithIndex
      .map { case (cent, cid) => (cid, cent.toSeq) }.toSeq
      .toDF("cid", "cent")
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_centroids")
    graft.api.Bucketing.writeBucketed(
      corpus.select(col("vec_id"), col("embedding"),
        NearestCell.nearestCell(col("embedding"), cells).as("cell")),
      table, Seq("cell"), buckets)
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
    * Similarity.ivfTopK (sim desc, cid tiebreak). */
  def search(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, nprobe: Int = 4): DataFrame = {
    import graft.sim.Similarity.simRounded
    val cells = loadCentroids(spark, table)
    val cb = spark.table(table)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("cell"))
    val qb = broadcast(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .withColumn("cell", explode(NearestCell.nearestCells(col("qv"), cells, nprobe))))
    val cand = qb.join(cb, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), simRounded(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rk"))
  }
}
