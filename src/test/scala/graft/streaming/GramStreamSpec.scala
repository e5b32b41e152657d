package graft.streaming

import graft.SparkSpec
import graft.sim.Pca
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Gram accumulation: per-batch integer Gram extents must
  * sum to the batch Gram of the union (exact), and the eigen solve on
  * the accumulated matrix must equal the batch PCA's. */
class GramStreamSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("accumulated streaming Gram equals the batch Gram of all rows, bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-gram")
    val b1 = Seq((1L, Array(1.0f, 0.25f), 0), (2L, Array(0.5f, -0.5f), 0))
    val b2 = Seq((3L, Array(-0.75f, 1.0f), 1))
    val in = MemoryStream[(Long, Array[Float], Int)]
    val q = StreamOps.gramStream(
      in.toDS().toDF("vec_id", "embedding", "label"),
      s"$dir/gram", s"$dir/ckpt")
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = StreamOps.readGram(spark, s"$dir/gram")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Pca.gram(vecs((b1 ++ b2): _*))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)

    // and the eigen solve over the accumulated matrix matches batch PCA
    val gramRows = streamed.toArray.map { case (i, j, g) => (i.toInt, j.toInt, g) }
    val vStream = Pca.topEigenFixedPoint(gramRows, dim = 2, iters = 12).toSeq
    val gramBatch = batch.toArray.map { case (i, j, g) => (i.toInt, j.toInt, g) }
    val vBatch = Pca.topEigenFixedPoint(gramBatch, dim = 2, iters = 12).toSeq
    assert(vStream == vBatch)
  }

  test("a replayed batch extent cannot double-count (idempotent overwrite)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-gram2")
    val rows = Seq((1L, Array(1.0f, 0.0f), 0))
    // simulate a replay: write the SAME batch id twice directly
    Pca.gram(vecs(rows: _*)).write.mode("overwrite")
      .parquet(s"$dir/gram/batch_id=0")
    Pca.gram(vecs(rows: _*)).write.mode("overwrite")
      .parquet(s"$dir/gram/batch_id=0")
    val acc = StreamOps.readGram(spark, s"$dir/gram")
      .as[(Long, Long, Long)].collect().toSet
    val once = Pca.gram(vecs(rows: _*)).as[(Long, Long, Long)].collect().toSet
    assert(acc == once)
  }
}
