package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("asof join: latest right at-or-before each left row, per key") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
      (2L, 15L, "t3")).toDF("sym", "ts", "trade")
    val quotes = Seq(
      (1L, 5L, 100.0), (1L, 10L, 110.0), (1L, 19L, 120.0),
      (2L, 99L, 990.0)).toDF("sym", "qts", "px")
    val got = AsOf.join(trades, quotes, Seq("sym"),
        leftTs = "ts", rightTs = "qts", payload = Seq("px"))
      .select(col("trade"), col("asof_px"))
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "t0" -> Some(100.0),  // equal ts matches (>= semantics)
      "t1" -> Some(110.0),  // latest of 5,10
      "t2" -> Some(120.0),  // 19 < 20
      "t3" -> None))        // key 2 has no quote at/before 15
  }

  test("asof join: equal-timestamp right ties resolve by tieBreak order") {
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 10L, "a"), (1L, 10L, "c"), (1L, 10L, "b"))
      .toDF("k", "rts", "v")
    val got = AsOf.join(l, r, Seq("k"), "ts", "rts",
        payload = Seq("v"), tieBreak = Seq("v"))
      .select("asof_v").as[String].collect()
    assert(got.toSeq == Seq("c")) // last in tieBreak (v asc) order
  }

  test("asof join: NULL payload on the matched right row surfaces as NULL") {
    // the matched (latest at-or-before) quote has px = NULL: ASOF returns
    // that row's NULL, not the older non-null 100.0 — and multi-column
    // payloads must come from the SAME matched row, never mixed
    val l = Seq((1L, 20L, "t1")).toDF("sym", "ts", "trade")
    val r = Seq(
      (1L, 5L, Option(100.0), Option("src_a")),
      (1L, 10L, Option.empty[Double], Option("src_b")))
      .toDF("sym", "qts", "px", "src")
    val got = AsOf.join(l, r, Seq("sym"), "ts", "qts", Seq("px", "src"))
      .select("asof_px", "asof_src")
      .as[(Option[Double], Option[String])].collect().toSeq
    assert(got == Seq((None, Some("src_b"))))
  }

  test("asof join rejects inputs using its reserved column names") {
    val l = Seq((1L, 10L, 0L)).toDF("k", "ts", "__ts")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "rts", "px")
    val ex = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), "ts", "rts", Seq("px"))
    }
    assert(ex.getMessage.contains("__ts"))
  }

  test("asof join plans as one shuffle + window — no join operator") {
    val l = spark.range(100).select(col("id").as("k"),
      (col("id") * 7 % 50).as("ts"))
    val r = spark.range(100).select(col("id").as("k"),
      (col("id") * 3 % 50).as("rts"), col("id").as("v"))
    val plan = AsOf.join(l, r, Seq("k"), "ts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
