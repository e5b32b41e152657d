package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.fingerprint

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "lang", "source", "text")

  test("spanScrub removes exactly the cross-doc duplicated span positions") {
    val d = docs(
      (1L, "en", "s1", "alpha beta gamma delta epsilon"),
      (2L, "en", "s1", "zeta alpha beta gamma eta theta"),
      (3L, "en", "s1", "iota kappa lambda mu"))
    val out = Scrub.spanScrub(d, k = 3, minDocs = 2)
      .orderBy("doc_id").collect()
    // "alpha beta gamma" appears in docs 1 (pos 0) and 2 (pos 1):
    // doc 1 loses tokens 0-2, doc 2 loses tokens 1-3, doc 3 untouched
    assert(out(0).getAs[Long]("n_covered") == 3)
    assert(out(1).getAs[Long]("n_covered") == 3)
    assert(out(2).getAs[Long]("n_covered") == 0)
    val fpOf = (s: String) => Seq(s).toDF("t")
      .select(fingerprint(col("t"))).head.getLong(0)
    assert(out(0).getAs[Long]("scrubbed_fp") == fpOf("delta epsilon"))
    assert(out(1).getAs[Long]("scrubbed_fp") == fpOf("zeta eta theta"))
    assert(out(2).getAs[Long]("scrubbed_fp") == fpOf("iota kappa lambda mu"))
  }

  test("spanScrub: overlapping duplicated spans merge their coverage") {
    // "a b c d" shared between two docs => spans "a b c" and "b c d"
    // both duplicated; coverage is the union (4 tokens), not 6
    val d = docs(
      (1L, "en", "s1", "a b c d x"),
      (2L, "en", "s1", "y a b c d"))
    val out = Scrub.spanScrub(d, k = 3, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_covered") == 4)
    assert(out(1).getAs[Long]("n_covered") == 4)
  }

  test("spanScrub: fully-covered doc yields fp 0, short docs pass through") {
    val d = docs(
      (1L, "en", "s1", "a b c"),
      (2L, "en", "s1", "a b c"),
      (3L, "en", "s1", "xy zz")) // < k tokens: no spans at all
    val out = Scrub.spanScrub(d, k = 3, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_covered") == 3 &&
      out(0).getAs[Long]("scrubbed_fp") == 0L)
    assert(out(2).getAs[Long]("n_covered") == 0)
  }

  test("selfScrub removes repeated spans within a doc, keeps the first occurrence") {
    val d = docs(
      // "a b c" repeats at positions 0 and 5: tokens 5-7 are scrubbed
      (1L, "en", "s1", "a b c x y a b c z"),
      // no intra-doc repeats: untouched (cross-doc repeats are
      // spanScrub's job, NOT selfScrub's)
      (2L, "en", "s1", "a b c x y"),
      (3L, "en", "s1", "a b c x y"))
    val out = Scrub.selfScrub(d, k = 3).orderBy("doc_id").collect()
    val fpOf = (s: String) => Seq(s).toDF("t")
      .select(fingerprint(col("t"))).head.getLong(0)
    assert(out(0).getAs[Long]("n_covered") == 3)
    assert(out(0).getAs[Long]("scrubbed_fp") == fpOf("a b c x y z"))
    assert(out(1).getAs[Long]("n_covered") == 0)
    assert(out(2).getAs[Long]("n_covered") == 0)
  }

  test("selfScrub: an entirely-repetitive doc collapses to its first span") {
    val d = docs((1L, "en", "s1", "a b c a b c a b c"))
    val out = Scrub.selfScrub(d, k = 3).head
    // spans at 3 and 6 repeat span 0; spans 1,2,4,5 ("b c a" etc.)
    // also repeat their own earlier occurrences -> tokens 3..8 covered
    assert(out.getAs[Long]("n_covered") == 6)
  }

  test("redactPii masks emails before digit runs and counts don't overlap") {
    val d = Seq("reach user42@host.example or 12345678 ok 123 x@y.z")
      .toDF("text")
      .select(Scrub.redactPii(col("text")).as("r"),
        Scrub.piiCounts(col("text"))._1.as("e"),
        Scrub.piiCounts(col("text"))._2.as("m"))
    val row = d.head
    // the email's own digits (42) must not surface as a number match;
    // "123" is under the 6-digit floor; "x@y.z" is a second email
    assert(row.getAs[String]("r") == "reach <email> or <num> ok 123 <email>")
    assert(row.getAs[Int]("e") == 2)
    assert(row.getAs[Int]("m") == 1)
  }

  test("PII families: phone/IPv4/card shapes match, Luhn gates card redaction, negatives stay intact") {
    def run(s: String): (String, Int, Int, Int, Int) = {
      val d = Seq(s).toDF("text")
      val (p, i, cs, cv) = Scrub.piiFamilyCounts(col("text"))
      val row = d.select(Scrub.redactPiiFamilies(col("text")).as("r"),
        p.as("p"), i.as("i"), cs.as("cs"), cv.as("cv")).head
      (row.getAs[String]("r"), row.getAs[Int]("p"), row.getAs[Int]("i"),
        row.getAs[Int]("cs"), row.getAs[Int]("cv"))
    }
    // each family redacts its shape
    assert(run("call +1 415 555 0134 now") == ("call <phone> now", 1, 0, 0, 0))
    assert(run("or (415) 555-0134 x") == ("or <phone> x", 1, 0, 0, 0))
    assert(run("host 192.168.10.1 up") == ("host <ip> up", 0, 1, 0, 0))
    // Luhn-valid cards redact, in both grouped and bare layouts
    assert(run("pay 4111111111111111 ok") == ("pay <card> ok", 0, 0, 1, 1))
    assert(run("pay 4539 1488 0343 6467 ok") == ("pay <card> ok", 0, 0, 1, 1))
    // shaped but Luhn-INVALID: counted as shaped, NOT redacted
    assert(run("acct 4111111111111112 ok") ==
      ("acct 4111111111111112 ok", 0, 0, 1, 0))
    // multi-candidate fold: two valid cards + one invalid in ONE text
    assert(run("a 4111111111111111 b 6011111111111117 c 4111111111111112 d") ==
      ("a <card> b <card> c 4111111111111112 d", 0, 0, 3, 2))
    // negatives: dates, versions, short ids, 5-digit zips, sub-13
    // digit runs — no family may touch them
    val neg = "on 2026-08-15 v1.2.3 build 12345 zip 94110 id 123456789012"
    assert(run(neg) == (neg, 0, 0, 0, 0))
    // review r13: a valid candidate appearing as a SUBSTRING of a
    // longer Luhn-invalid run elsewhere must not corrupt that run —
    // the boundary-guarded replace leaves the 17-digit run intact
    assert(run("ref 74111111111111111 pay 4111111111111111") ==
      ("ref 74111111111111111 pay <card>", 0, 0, 2, 1))
    // back-to-back identical valid cards (the consumed-boundary
    // hazard): the two-pass fold replaces ALL of them
    assert(run("4111111111111111 4111111111111111 4111111111111111") ==
      ("<card> <card> <card>", 0, 0, 3, 3))
  }

  test("selfScrub and redactPii run unchanged on an unbounded frame") {
    // both are pure per-row expressions; the scaladoc claims they
    // stream — prove it end-to-end on a MemoryStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val stream = in.toDS().toDF("doc_id", "lang", "text")
    assert(stream.isStreaming)
    val scrubbed = Scrub.selfScrub(stream, k = 3)
      .withColumn("redacted_probe",
        Scrub.redactPii(concat_ws(" ", col("doc_id").cast("string"),
          lit("user@host.example"))))
    val q = scrubbed.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("scrubstream").start()
    in.addData((1L, "en", "a b c x y a b c z"), (2L, "en", "p q r s"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("scrubstream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_covered"), r.getAs[String]("redacted_probe"))).toMap
    assert(rows(1L)._1 == 3 && rows(2L)._1 == 0)
    assert(rows(1L)._2 == "1 <email>")
  }

  test("tokenBudget admits a greedy hash-ordered prefix per group") {
    val d = docs(
      (1L, "en", "s1", "a b c d"), // 4 tokens each
      (2L, "en", "s1", "e f g h"),
      (3L, "en", "s1", "i j k l"),
      (4L, "en", "s2", "m n o p"))
    val out = Scrub.tokenBudget(d, budgetTokens = 8L).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("admitted")).toMap
    // s2's only doc starts under budget
    assert(byId(4L))
    // s1: exactly the first two docs in hash order are admitted (the
    // third starts at cum=8 which is not < 8)
    assert(out.count(r => r.getAs[String]("source") == "s1" && r.getAs[Boolean]("admitted")) == 2)
    // admission order follows the deterministic hash bucket, so the
    // admitted set is stable across runs
    val again = Scrub.tokenBudget(d, budgetTokens = 8L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("admitted")).toMap
    assert(again == byId)
  }

  test("tokenBudget crosses the budget by at most one document per group") {
    val d = docs((1 to 20).map(i =>
      (i.toLong, "en", "s1", Seq.fill(7)("w").mkString(" "))): _*)
    val out = Scrub.tokenBudget(d, budgetTokens = 50L)
      .filter(col("admitted")).agg(sum(col("nt"))).head.getLong(0)
    // 7 tokens/doc: admitted while cum < 50 => 8 docs, 56 tokens —
    // over budget by strictly less than one extra doc's tokens
    assert(out == 56L)
  }
}
