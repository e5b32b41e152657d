package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage bisect for the r17 link-frame OOM. */
object DevLinkBisect {
  def main(args: Array[String]): Unit = {
    import graft.text.{Links, Url}
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val upTo = if (args.length > 1) args(1).toInt else 99
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def stage(n: Int, name: String)(f: => Long): Unit =
      if (n <= upTo) {
        val t0 = System.nanoTime()
        val c = f
        println(f"STAGE $n $name%-12s rows=$c%-8d ${(System.nanoTime()-t0)/1e9}%.1fs")
      }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select(col("doc_id"), Url.urlize(col("doc_id")).as("u"),
      Links.linkify(col("doc_id")).as("raw"))
    stage(1, "base")(base.count())
    val pc = Url.withCanonical(base, col("u"), "page")
    stage(2, "canon")(pc.count())
    val pages = pc.select(col("doc_id"), col("page"),
      explode(Links.extractHrefs(col("raw"))).as("href"))
    stage(3, "explode")(pages.count())
    val resolved = Links.withResolved(pages, col("page"), col("href"), "abs")
      .filter(col("abs").isNotNull)
    stage(4, "resolve")(resolved.count())
    if (upTo >= 4) resolved.select("doc_id", "href", "abs").show(8, false)
    val tc = Url.withCanonical(resolved, col("abs"), "target")
      .select(col("doc_id"), col("page"), col("target"))
    stage(5, "target")(tc.count())
    val hosts = tc
      .select(col("doc_id"), Url.hostOf(col("page")).as("src_host"),
        col("target"), Url.hostOf(col("target")).as("dst_host"))
    stage(6, "hosts")(hosts.count())
    val sites = hosts.select(col("doc_id"),
      Url.registrableDomain(col("src_host")).as("src_site"),
      col("target"),
      Url.registrableDomain(col("dst_host")).as("dst_site"))
    stage(7, "sites")(sites.count())
    if (upTo >= 7) sites.show(8, false)
    spark.stop()
  }
}
