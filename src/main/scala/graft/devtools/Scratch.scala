package graft.devtools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only scratch main for timing investigations. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def now() = System.nanoTime()
    val t0 = now()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
    val und = li.union(li.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    println(s"edges=${und.count()} t=${(now() - t0) / 1e9}")

    var solution = und.select(col("src").as("vertex")).distinct()
      .withColumn("component", col("vertex"))
      .repartition(col("vertex")).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"vertices=${solution.count()} t=${(now() - t0) / 1e9}")
    var workset = solution
    var i = 0
    var done = false
    while (i < 50 && !done) {
      val ti = now()
      val msgs = workset.alias("w").join(und.alias("g"), col("w.vertex") === col("g.src"))
        .groupBy(col("g.dst").as("vertex"))
        .agg(min(col("w.component")).as("cand"))
      val delta = msgs.alias("m").join(solution.alias("s"), col("m.vertex") === col("s.vertex"))
        .filter(col("m.cand") < col("s.component"))
        .select(col("m.vertex").as("vertex"), col("m.cand").as("component"))
        .localCheckpoint()
      val dc = delta.count()
      val nextSolution = solution.alias("s")
        .join(delta.select(col("vertex")), Seq("vertex"), "left_anti")
        .unionByName(delta)
        .localCheckpoint()
      val sc = nextSolution.count()
      solution.unpersist(); if (i > 0) workset.unpersist()
      solution = nextSolution
      workset = delta
      done = dc == 0
      i += 1
      println(s"iter=$i delta=$dc sol=$sc t=${(now() - ti) / 1e9}")
    }
    println(s"TOTAL t=${(now() - t0) / 1e9}")
    spark.stop()
  }
}
