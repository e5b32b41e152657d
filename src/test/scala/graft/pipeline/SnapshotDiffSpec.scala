package graft.pipeline

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("diff classifies added/removed/changed/same by key + fingerprint") {
    val prev = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "fp")
    val next = Seq((1L, 10L), (2L, 21L), (4L, 40L)).toDF("id", "fp")
    val got = SnapshotDiff.diff(prev, next, "id", "fp")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "same", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("diff shuffles fingerprints, not payloads (no text column in the plan)") {
    val prev = Seq((1L, "big payload a", 10L)).toDF("id", "text", "fp")
    val next = Seq((1L, "big payload b", 11L)).toDF("id", "text", "fp")
    val plan = SnapshotDiff.diff(prev, next, "id", "fp")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("text"), plan) // column pruned before the join
  }

  test("upsert: delta replaces same-key rows, inserts new keys, keeps the rest") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val delta = Seq((2L, "B2"), (9L, "new")).toDF("k", "v")
    val got = SnapshotDiff.upsert(prev, delta, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("upsert with an empty delta is the identity") {
    val prev = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val delta = Seq.empty[(Long, String)].toDF("k", "v")
    val got = SnapshotDiff.upsert(prev, delta, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
