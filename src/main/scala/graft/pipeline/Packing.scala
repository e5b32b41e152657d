package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: concatenate documents
  * in a deterministic order and cut the stream every `budget` tokens —
  * the standard "concat-and-chunk" batching used to fill fixed-length
  * training contexts (each pack holds consecutive whole documents;
  * a document longer than the budget gets a pack of its own).
  *
  * Spark-first shape: documents are sharded by a stable id hash
  * ([[Sampling.idBucket]]) so packing runs as an embarrassingly
  * parallel window-cumsum per shard — no global sort, no driver
  * state; shard count scales with the cluster. Assignment is a pure
  * function of (id, token count, budget, shards), so the same corpus
  * always packs identically (and the DuckDB oracle replicates it
  * with the same window arithmetic).
  */
object Packing {

  /** Assign each row a (shard, pack) id: within each of `shards`
    * id-hash shards, rows are ordered by id, the token counts are
    * prefix-summed, and a document joins the budget-aligned chunk its
    * start offset falls in (pack = floor(tokens-before-this-row /
    * budget)). Packs therefore hold consecutive whole documents and
    * target `budget` tokens, overshooting by at most the length of
    * their straddling last document (exact whole-doc first-fit needs
    * a stateful scan that neither window functions nor the oracle
    * can express). Adds columns: shard, pack, pack_offset. */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 64): DataFrame = {
    val shard = Sampling.idBucket(col(idCol), shards)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.withColumn("shard", shard)
      .withColumn("cum",
        sum(col(tokensCol).cast("long")).over(w) - col(tokensCol).cast("long"))
      .withColumn("pack", floor(col("cum") / lit(budget)).cast("long"))
      .withColumnRenamed("cum", "pack_offset")
  }

  /** Packing WITHIN caller-supplied groups (semantic packing): the
    * same budget-aligned cumsum cut, but the partition key is a
    * topical group (e.g. an embedding cluster) instead of the id
    * hash — so every pack holds docs from ONE group and training
    * contexts are topically coherent (the in-context-pretraining
    * data layout). Same scale shape: embarrassingly parallel window
    * cumsum per group, no global sort. */
  def packWithin(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.withColumn("cum",
        sum(col(tokensCol).cast("long")).over(w) - col(tokensCol).cast("long"))
      .withColumn("pack", floor(col("cum") / lit(budget)).cast("long"))
      .withColumnRenamed("cum", "pack_offset")
  }

  /** SQL twin of [[packWithin]]'s assignment. */
  def sqlPackWithinCte(table: String, groupExpr: String, idExpr: String,
      tokensExpr: String, budget: Long): String =
    s"""SELECT *,
         CAST(((SUM(CAST($tokensExpr AS BIGINT)) OVER
             (PARTITION BY $groupExpr ORDER BY $idExpr))
           - CAST($tokensExpr AS BIGINT)) // $budget AS BIGINT) AS pack
       FROM $table"""

  /** SQL twin of [[packGreedy]]'s assignment for the DuckDB oracle:
    * emits shard/pack expressions given the same columns. */
  def sqlPackCte(table: String, idExpr: String, tokensExpr: String,
      budget: Long, shards: Int = 64): String =
    s"""SELECT *,
         CAST(((SUM(CAST($tokensExpr AS BIGINT)) OVER
             (PARTITION BY ${Sampling.sqlIdBucket(idExpr, shards)}
              ORDER BY $idExpr)) - CAST($tokensExpr AS BIGINT)) // $budget
           AS BIGINT) AS pack,
         ${Sampling.sqlIdBucket(idExpr, shards)} AS shard
       FROM $table"""
}
