package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of named queries (AQE-finalized).
  *   sbt "Test/runMain graft.DevExplain q19_disjunctive"
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
