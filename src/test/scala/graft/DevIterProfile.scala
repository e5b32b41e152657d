package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profile of the pagerank dataflow. */
object DevIterProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"phase $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val e = phase("edges-def") {
      Tables.t(spark, sfDir, "lineitem")
        .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    }
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = phase("vertices-count")(vertices.count())
    val eCount = phase("e-count")(e.count())
    val parts = api.Iterations.statePartitions(spark, eCount)
    println(s"n=$n e=$eCount parts=$parts")
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(outDeg, e("src") === outDeg("id")).select(col("src"), col("dst"), col("outdeg"))
      .repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("withDeg-materialize")(withDeg.count())
    val init = vertices.withColumn("rank", lit(1.0 / n))
    val damping = 0.85
    val result = phase("bulk-3-supersteps") {
      api.Iterations.bulk(init, 3, checkpointEvery = 3, shufflePartitions = parts) { ranks =>
        val contribs = ranks.alias("r")
          .join(withDeg.alias("e"), col("r.id") === col("e.src"))
          .select(col("e.dst").as("id"),
            round(col("r.rank") / col("e.outdeg") * lit(1e12)).cast("long").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("csum"))
        ranks.alias("v").join(contribs.alias("m"), col("v.id") === col("m.id"), "left")
          .select(col("v.id").as("id"),
            (round((lit((1 - damping) / n) +
              lit(damping) * (coalesce(col("m.csum"), lit(0L)) / lit(1e12))) * lit(1e12))
              .cast("long") / lit(1e12)).as("rank"))
      }
    }
    phase("top20")(result.orderBy(col("rank").desc, col("id")).limit(20).count())
    spark.stop()
  }
}
