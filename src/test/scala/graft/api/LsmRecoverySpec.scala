package graft.api

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-injection coverage for [[Lsm.recover]] (VERDICT r12 #4): a
  * compaction killed inside the swap window — including the
  * previously-documented-only residual, "between one extent dir's
  * delete and its rename" — must be mechanically finishable, with
  * results identical to a never-crashed twin, on at least two LSM
  * families (PostingsIndex + DedupIndex). */
class LsmRecoverySpec extends SparkSpec {

  import graft.text.{PostingsIndex, TextFunctions}
  import graft.dedup.DedupIndex

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def queries(src: DataFrame) =
    src.filter(col("doc_id") < 20).limit(20)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(
          slice(TextFunctions.tokens(col("text")), 1, 5))).as("tok"))

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Int)] = {
    import spark.implicits._
    df.select(col("qid"), col("doc_id"), col("score"), col("rk"))
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
  }

  private class InjectedCrash extends RuntimeException("injected crash")

  /** Arm the failpoint to throw at the n-th occurrence of labels
    * starting with `prefix`. */
  private def armCrash(prefix: String, nth: Int = 1): Unit = {
    var n = 0
    Lsm.failpoint = l =>
      if (l.startsWith(prefix)) { n += 1; if (n == nth) throw new InjectedCrash }
  }
  private def disarm(): Unit = Lsm.failpoint = _ => ()

  test("PostingsIndex: crash between an extent's delete and rename; recover() finishes, results == untouched twin") {
    // the r12 VERDICT's named residual window: postings extent already
    // swapped, docs extent DELETED but the consolidated partition not
    // yet renamed in — the index is internally inconsistent
    def setup(table: String): String = {
      PostingsIndex.write(docs.filter(col("doc_id") % 10 < 8), table)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 8), 0L)
      PostingsIndex.forget(spark, root,
        docs.filter(col("doc_id") % 10 < 9 && col("doc_id") % 4 === 0)
          .select(col("doc_id")), 100L)
      root
    }
    val q = queries(docs)
    val rootA = setup("lsmrec_pidx_a") // never-crashed twin
    PostingsIndex.compactTiered(spark, "lsmrec_pidx_a", rootA)
    val rootB = setup("lsmrec_pidx_b") // crash + recover
    armCrash("extent_deleted:", nth = 2)
    try {
      intercept[InjectedCrash] {
        PostingsIndex.compactTiered(spark, "lsmrec_pidx_b", rootB)
      }
    } finally disarm()
    // the interrupted generation is fully described on disk
    val staging = rootB + "/_tiered_staging"
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(staging, Lsm.PlanFile)),
      "swap plan must be persisted before the first move")
    // mechanical finisher
    assert(Lsm.recover(spark, staging), "recover must find and replay the plan")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)),
      "staging root must be gone after a completed recovery")
    assert(!Lsm.recover(spark, staging), "second recover must be a no-op")
    // results identical to the never-crashed twin, and the lifecycle
    // continues: a later admission composes on the recovered index
    assert(rows(PostingsIndex.searchGrown(spark, "lsmrec_pidx_b", rootB, q, 3)) ==
      rows(PostingsIndex.searchGrown(spark, "lsmrec_pidx_a", rootA, q, 3)))
    Seq(rootA -> "lsmrec_pidx_a", rootB -> "lsmrec_pidx_b").foreach {
      case (root, table) => PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 9), 1L)
    }
    assert(rows(PostingsIndex.searchGrown(spark, "lsmrec_pidx_b", rootB, q, 3)) ==
      rows(PostingsIndex.searchGrown(spark, "lsmrec_pidx_a", rootA, q, 3)))
    PostingsIndex.drop(spark, "lsmrec_pidx_a")
    PostingsIndex.drop(spark, "lsmrec_pidx_b")
  }

  test("DedupIndex: crash after the survivor mask lands; a crash DURING recovery is also survivable") {
    import spark.implicits._
    def setup(table: String): String = {
      DedupIndex.write(docs.filter(col("doc_id") % 8 < 7), table, buckets = 4)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      DedupIndex.flagAndAdmit(spark, table, s"$root/ext",
        docs.filter(col("doc_id") % 8 === 7), 0L, s"$root/sink")
      DedupIndex.forget(spark, s"$root/ext",
        docs.filter(col("doc_id") % 8 < 7 && col("doc_id") % 9 === 0)
          .select(col("doc_id")), 100L)
      root
    }
    val rootA = setup("lsmrec_dedup_a")
    DedupIndex.compactTiered(spark, "lsmrec_dedup_a", s"$rootA/ext", buckets = 4)
    val rootB = setup("lsmrec_dedup_b")
    // crash window: survivors moved in (mask superset holds), no
    // extent swapped yet
    armCrash("survivors_moved")
    try {
      intercept[InjectedCrash] {
        DedupIndex.compactTiered(spark, "lsmrec_dedup_b", s"$rootB/ext", buckets = 4)
      }
    } finally disarm()
    val staging = s"$rootB/ext/_tiered_staging"
    // double crash: the RECOVERY itself dies mid-extent-swap...
    armCrash("extent_deleted:", nth = 1)
    try {
      intercept[InjectedCrash] { Lsm.recover(spark, staging) }
    } finally disarm()
    // ...and a second recover still finishes idempotently
    assert(Lsm.recover(spark, staging))
    // flags on the next batch are identical to the untouched twin
    // (forgotten witnesses stay masked, consolidated extents witness)
    def flagsOf(table: String, root: String): Set[(Long, Long)] = {
      DedupIndex.flagAndAdmit(spark, table, s"$root/ext",
        docs.filter(col("doc_id") % 8 === 3 && col("doc_id") % 2 === 1)
          .select(col("doc_id") + 100000L as "doc_id", col("text")),
        7L, s"$root/sink")
      spark.read
        .schema("doc_id LONG, dup_of LONG, common LONG, na LONG, nb LONG, batch_id LONG")
        .parquet(s"$root/sink").filter(col("batch_id") === 7L)
        .select(col("doc_id"), col("dup_of"))
        .as[(Long, Long)].collect().toSet
    }
    assert(flagsOf("lsmrec_dedup_b", rootB) == flagsOf("lsmrec_dedup_a", rootA))
    Seq("lsmrec_dedup_a", "lsmrec_dedup_b").foreach(t => DedupIndex.drop(spark, t))
  }

  test("recover on a root that never reached the swap (or already finished) is a safe no-op") {
    assert(!Lsm.recover(spark,
      java.nio.file.Files.createTempDirectory("lsmrec_empty").toString + "/nope"))
  }

  test("replay precision: a tombstone batch landing between crash and recovery survives the replay (recorded-set deletion)") {
    // review r13: the plan records WHICH partitions the generation
    // consumed; replay deletes exactly those — a forget that lands
    // after the crash (here written directly, bypassing the mutators'
    // own auto-recover) must stay masked after recovery
    def setup(table: String): String = {
      PostingsIndex.write(docs.filter(col("doc_id") % 10 < 8), table)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 8), 0L)
      PostingsIndex.forget(spark, root,
        docs.filter(col("doc_id") % 10 < 9 && col("doc_id") % 4 === 0)
          .select(col("doc_id")), 100L)
      root
    }
    val q = queries(docs)
    val lateForget = docs
      .filter(col("doc_id") % 10 < 9 && col("doc_id") % 4 =!= 0 &&
        col("doc_id") % 7 === 1)
      .select(col("doc_id"))
    // twin A: clean compaction, then the same late forget via the API
    val rootA = setup("lsmrec_prec_a")
    PostingsIndex.compactTiered(spark, "lsmrec_prec_a", rootA)
    PostingsIndex.forget(spark, rootA, lateForget, 999L)
    // twin B: crash mid-swap, tombstone batch lands RAW (no recover),
    // then mechanical recovery
    val rootB = setup("lsmrec_prec_b")
    armCrash("extent_deleted:", nth = 2)
    try {
      intercept[InjectedCrash] {
        PostingsIndex.compactTiered(spark, "lsmrec_prec_b", rootB)
      }
    } finally disarm()
    lateForget.write.mode("overwrite")
      .parquet(s"${PostingsIndex.tombstonePath(rootB)}/batch_id=999")
    assert(Lsm.recover(spark, Lsm.stagingRoot(rootB)))
    val a = rows(PostingsIndex.searchGrown(spark, "lsmrec_prec_a", rootA, q, 3))
    val b = rows(PostingsIndex.searchGrown(spark, "lsmrec_prec_b", rootB, q, 3))
    assert(b == a, "post-crash tombstones must survive the replay")
    // and the late-forgotten ids really are masked (non-vacuous)
    import spark.implicits._
    val lateIds = lateForget.as[Long].collect().toSet
    assert(lateIds.nonEmpty && b.forall(r => !lateIds.contains(r._2)))
    PostingsIndex.drop(spark, "lsmrec_prec_a")
    PostingsIndex.drop(spark, "lsmrec_prec_b")
  }

  test("re-running compactTiered after a crash AUTO-recovers before staging (the natural operator response is safe)") {
    // without the entry-point recover, a re-run would stage a new
    // generation from HALF-SWAPPED state (e.g. postings already
    // consolidated, docs extents still per-batch) and consolidate
    // inconsistent stats
    def setup(table: String): String = {
      PostingsIndex.write(docs.filter(col("doc_id") % 10 < 8), table)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 8), 0L)
      PostingsIndex.forget(spark, root,
        docs.filter(col("doc_id") % 10 < 9 && col("doc_id") % 4 === 0)
          .select(col("doc_id")), 100L)
      root
    }
    val q = queries(docs)
    val rootA = setup("lsmrec_auto_a")
    PostingsIndex.compactTiered(spark, "lsmrec_auto_a", rootA)
    val rootB = setup("lsmrec_auto_b")
    armCrash("extent_deleted:", nth = 2)
    try {
      intercept[InjectedCrash] {
        PostingsIndex.compactTiered(spark, "lsmrec_auto_b", rootB)
      }
    } finally disarm()
    // no explicit recover: just run the compaction again
    PostingsIndex.compactTiered(spark, "lsmrec_auto_b", rootB)
    assert(rows(PostingsIndex.searchGrown(spark, "lsmrec_auto_b", rootB, q, 3)) ==
      rows(PostingsIndex.searchGrown(spark, "lsmrec_auto_a", rootA, q, 3)))
    PostingsIndex.drop(spark, "lsmrec_auto_a")
    PostingsIndex.drop(spark, "lsmrec_auto_b")
  }

  test("merge AUTO-recovers a shard that crashed mid-swap before consuming its grow state (ADVICE r13)") {
    // without the entry-point recover, merging a half-swapped shard
    // (postings consolidated, docs extents deleted-not-renamed) bakes
    // the inconsistency permanently into the output index
    def shard(table: String, residue: Int): String = {
      PostingsIndex.write(
        docs.filter(col("doc_id") % 2 === residue && col("doc_id") % 10 < 8), table)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 2 === residue && col("doc_id") % 10 === 8), 0L)
      PostingsIndex.forget(spark, root,
        docs.filter(col("doc_id") % 2 === residue && col("doc_id") % 4 === 0)
          .select(col("doc_id")), 100L)
      root
    }
    val q = queries(docs)
    val rootA0 = shard("lsmrec_mrg_a0", 0); val rootA1 = shard("lsmrec_mrg_a1", 1)
    val rootB0 = shard("lsmrec_mrg_b0", 0); val rootB1 = shard("lsmrec_mrg_b1", 1)
    // twin A: crash shard a1 mid-swap, recover EXPLICITLY, then merge
    armCrash("extent_deleted:", nth = 2)
    try {
      intercept[InjectedCrash] {
        PostingsIndex.compactTiered(spark, "lsmrec_mrg_a1", rootA1)
      }
    } finally disarm()
    assert(Lsm.recover(spark, Lsm.stagingRoot(rootA1)))
    PostingsIndex.merge(spark,
      Seq("lsmrec_mrg_a0" -> Some(rootA0), "lsmrec_mrg_a1" -> Some(rootA1)),
      "lsmrec_mrg_a", buckets = 4)
    // twin B: identical crash on shard b1, NO explicit recover — merge
    // itself must replay the interrupted swap before reading the shard
    armCrash("extent_deleted:", nth = 2)
    try {
      intercept[InjectedCrash] {
        PostingsIndex.compactTiered(spark, "lsmrec_mrg_b1", rootB1)
      }
    } finally disarm()
    PostingsIndex.merge(spark,
      Seq("lsmrec_mrg_b0" -> Some(rootB0), "lsmrec_mrg_b1" -> Some(rootB1)),
      "lsmrec_mrg_b", buckets = 4)
    assert(rows(PostingsIndex.search(spark, "lsmrec_mrg_b", q, 3)) ==
      rows(PostingsIndex.search(spark, "lsmrec_mrg_a", q, 3)))
    Seq("lsmrec_mrg_a0", "lsmrec_mrg_a1", "lsmrec_mrg_b0", "lsmrec_mrg_b1",
      "lsmrec_mrg_a", "lsmrec_mrg_b").foreach(t => PostingsIndex.drop(spark, t))
  }

  test("writePlan refuses to destroy an unreplayed committed plan (ADVICE r13)") {
    // a direct swapConsolidated on a root whose previous swap crashed
    // must fail loudly instead of silently deleting the only replay
    // record of the interrupted generation
    def setup(table: String): String = {
      PostingsIndex.write(docs.filter(col("doc_id") % 10 < 8), table)
      val root = java.nio.file.Files.createTempDirectory(table).toString
      PostingsIndex.admit(spark, table, root,
        docs.filter(col("doc_id") % 10 === 8), 0L)
      root
    }
    val root = setup("lsmrec_guard")
    armCrash("extent_deleted:", nth = 1)
    try {
      intercept[InjectedCrash] {
        PostingsIndex.compactTiered(spark, "lsmrec_guard", root)
      }
    } finally disarm()
    val staging = Lsm.stagingRoot(root)
    val ex = intercept[IllegalArgumentException] {
      Lsm.swapConsolidated(spark, staging, Seq.empty, None, root + "/nope")
    }
    assert(ex.getMessage.contains("unreplayed swap plan"))
    // the plan survived the refusal and is still mechanically finishable
    assert(Lsm.recover(spark, staging))
    PostingsIndex.drop(spark, "lsmrec_guard")
  }
}
