package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join proof: same-bucketed fact tables join without any
  * shuffle exchange (the SURVEY §4.1 "property reuse" story in
  * Spark's physical-layout form). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-to-fact join plans with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    // self-clean: a crashed prior run can leave the managed location
    // behind even after the table metadata is gone
    Seq("li_bkt", "ord_bkt").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "li_bkt", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(ord, "ord_bkt", Seq("o_orderkey"), 4)

    // the test tables are tiny enough to auto-broadcast, which would
    // bypass the bucket layout; at real fact-to-fact scale broadcast
    // is impossible and the bucketed path is what executes
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "li_bkt")
        .join(Bucketing.readTable(spark, "ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == li.join(ord,
        col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
