package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported bridge (classic.ExpressionUtils) is private[sql], so this
  * shim lives inside the org.apache.spark.sql package namespace —
  * the standard extension-library technique for custom Expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The materialized block-backed RDD behind a `localCheckpoint()`ed
    * frame (None for any other plan). Exposed so iteration loops can
    * eagerly `unpersist` a superseded superstep checkpoint instead of
    * waiting for the ContextCleaner: dead checkpoint blocks otherwise
    * pile up on-heap until a driver GC finally queues their cleanup
    * (docs/SCALE.md, r9). */
  def checkpointRdd(df: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[_]] =
    df match {
      case c: org.apache.spark.sql.classic.Dataset[_] =>
        c.queryExecution.analyzed match {
          case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
          case _ => None
        }
      case _ => None
    }

  /** `localCheckpoint()` that re-stamps the checkpoint's statistics
    * with the MEASURED materialized size instead of the origin plan's
    * estimate.
    *
    * Why this exists (r9 forensics, docs/SCALE.md "iteration
    * headroom"): Spark's checkpoint keeps the un-truncated plan's
    * `Statistics` on the LogicalRDD, and the size-only estimator
    * MULTIPLIES child sizes through every join — so a driver loop
    * whose superstep both consumes and twice self-joins the previous
    * checkpoint roughly CUBES `sizeInBytes` each superstep. The
    * BigInt reaches millions of digits within ~14 supersteps and
    * every subsequent `canBroadcastBySize` probe pays
    * Karatsuba/Toom-Cook multiplication on it: jstack shows the
    * driver pinned in `java.math.BigInteger.multiply` for 60-110 s in
    * the late supersteps of a 10M-vertex CC run — the real cause of
    * what r8 measured as the "convergence-tail skew". Stamping each
    * barrier's TRUE block size (BlockManager memSize + diskSize)
    * resets the estimate chain AND hands the planner an accurate
    * build-side size for the next superstep's join selection. */
  def measuredLocalCheckpoint[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = ds match {
    case c: org.apache.spark.sql.classic.Dataset[T] =>
      val ck = c.localCheckpoint()
      ck.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          val sc = c.sparkSession.sparkContext
          val measured = sc.getRDDStorageInfo
            .find(_.id == l.rdd.id)
            .map(i => BigInt(i.memSize + i.diskSize))
            .filter(_ > 0)
          // fallback Long.MaxValue (= "huge, never broadcast"): never
          // the origin estimate, whose digits are the failure mode
          val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = measured.getOrElse(BigInt(Long.MaxValue)))
          // originStats sits in LogicalRDD's SECOND parameter list
          // (no copy() named access) — rebuild the node around the
          // same checkpointed RDD with the measured statistics
          val truncated = new org.apache.spark.sql.execution.LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(
            c.sparkSession, Some(stats), None)
          new org.apache.spark.sql.classic.Dataset[T](
            c.sparkSession, truncated, c.encoder)
        case _ => ck
      }
    case other => other.localCheckpoint()
  }
}
