package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression pins for the r9 superstep-barrier fixes (SCALE.md
  * "iteration headroom"): checkpoint statistics must be MEASURED, not
  * inherited — the stock localCheckpoint keeps the origin plan's
  * size estimate, which the size-only stats visitor multiplies
  * through every join until BigInteger arithmetic itself becomes the
  * driver bottleneck — and superseded checkpoints must be freeable
  * without waiting for a GC-triggered ContextCleaner pass. */
class CheckpointSpec extends SparkSpec {

  private def selfJoin(df: org.apache.spark.sql.DataFrame) =
    df.alias("a").join(df.alias("b"), col("a.id") === col("b.id"))
      .select(col("a.id").as("id"))

  test("stock checkpoint stats explode multiplicatively; measured checkpoint resets them") {
    var stock = spark.range(1000).toDF("id").localCheckpoint()
    var measured = graft.api.Iterations.checkpoint(spark.range(1000).toDF("id"))
    for (_ <- 1 to 6) {
      stock = selfJoin(stock).localCheckpoint()
      measured = graft.api.Iterations.checkpoint(selfJoin(measured))
    }
    val stockBits =
      stock.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    val measuredBits =
      measured.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    // 6 supersteps of a single self-join roughly SQUARE the stock
    // estimate each step: ~2^6 x the starting digit count. The
    // measured stamp must stay at a real byte size (< 2^63).
    assert(stockBits > 200,
      s"expected the stock estimate to blow up, got $stockBits bits " +
        "(if Spark now resets checkpoint stats, this pin is obsolete)")
    assert(measuredBits < 64,
      s"measured checkpoint stats must be a real size, got $measuredBits bits")
  }

  test("measured checkpoint returns the materialized rows and real size") {
    val df = graft.api.Iterations.checkpoint(
      spark.range(500).toDF("id").filter(col("id") % 5 === 0))
    assert(df.count() == 100)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size > 0 && size < BigInt(Long.MaxValue), s"size=$size")
  }

  test("freeCheckpoint drops the superseded checkpoint's blocks eagerly") {
    val sc = spark.sparkContext
    val ck = graft.api.Iterations.checkpoint(spark.range(10000).toDF("id"))
    val rdd = org.apache.spark.sql.graftbridge.Bridge.checkpointRdd(ck)
    assert(rdd.isDefined, "checkpointRdd must see the LogicalRDD")
    val id = rdd.get.id
    assert(sc.getPersistentRDDs.contains(id), "checkpoint must be persisted")
    graft.api.Iterations.freeCheckpoint(ck)
    // unpersist(blocking = false) unregisters immediately; block
    // removal proceeds async — registration is what the ContextCleaner
    // would otherwise only reach after a driver GC
    assert(!sc.getPersistentRDDs.contains(id),
      "freed checkpoint must leave the persistent-RDD registry")
  }
}
