package graft
import org.apache.spark.sql.SparkSession
object DevTimeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- sys.env.getOrElse("SPARK_GRAFT_QUERIES", "q_span_scrub,q_pii_redact,q_token_budget,q_pca_power").split(",").toSeq; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
