package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** Dev-only stage-wise profile of the MinHash-LSH pipeline. */
object DevMinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = Tables.t(spark, sfDir, "documents")
    // warm
    docs.count()
    val sv = docs.select(col("doc_id"), shingleVals(col("text")).as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sv persist+count")(sv.count())
    val withSig = sv.select(col("doc_id"), col("sv"),
        Dedup.minhashSignature_(col("sv")).as("sig"))
      .withColumn("bands", Dedup.bandKeys(col("sig")))
    time("sig+bands count")(withSig.count())
    val buckets = withSig.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    time("buckets count")(buckets.count())
    val cand = buckets.alias("x").join(buckets.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).distinct()
    time("cand join+distinct")(cand.count())
    sv.unpersist()
    time("full pipeline")(Dedup.minhashLshPairs(docs, 0.5).count())
    time("full pipeline again")(Dedup.minhashLshPairs(docs, 0.5).count())
    spark.stop()
  }
}
