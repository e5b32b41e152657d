package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-job dump: run a query warm and print EVERY Spark job's
  * start offset, duration and description — the drill-down sibling of
  * [[DevJobTrace]] for finding where a high-job-count query's wall
  * time actually sits (gaps between rows = driver-side time).
  *
  *   sbt "Test/runMain graft.DevJobList q_knn_clusters"
  */
object DevJobList {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    case class J(id: Int, start: Long, var end: Long, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(s.jobId, J(s.jobId, s.time, -1L,
          Option(s.properties.getProperty("spark.job.description"))
            .getOrElse("")))
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      jobs.clear()
      val t0 = System.currentTimeMillis()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = System.currentTimeMillis() - t0
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val iv = jobs.values.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
      println(s"== $name wall=${wall / 1000.0}s jobs=${iv.size}")
      iv.foreach { j =>
        println(f"  +${(j.start - t0) / 1000.0}%7.2fs ${(j.end - j.start) / 1000.0}%6.2fs  ${j.desc.take(100)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
