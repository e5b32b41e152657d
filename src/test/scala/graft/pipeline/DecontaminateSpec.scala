package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  test("flagOverlap finds planted contamination and nothing else") {
    val probe = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains probe 100's full text -> 4 shared 3-gram shingles
      (1L, "xx alpha beta gamma delta epsilon zeta yy"),
      // shares exactly two shingles ("beta gamma delta", "gamma delta epsilon") -> below minCommon=3
      (2L, "beta gamma delta epsilon unrelated words here"),
      // no overlap
      (3L, "totally different content with no shared trigrams at all"),
    ).toDF("doc_id", "text")
    val got = Decontaminate.flagOverlap(corpus, probe, minCommon = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 4L)), got.toString)
  }

  test("flagOverlap plan broadcasts the probe side, never the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isProbe = Sampling.sampleFilter(col("doc_id"), 20)
    val plan = Decontaminate
      .flagOverlap(docs.filter(!isProbe), docs.filter(isProbe))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("flagOverlapBloom result is identical to the exact path") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isProbe = Sampling.sampleFilter(col("doc_id"), 150)
    val exact = Decontaminate
      .flagOverlap(docs.filter(!isProbe), docs.filter(isProbe))
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Decontaminate
      .flagOverlapBloom(docs.filter(!isProbe), docs.filter(isProbe))
      .as[(Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain contamination")
    assert(bloom == exact)
  }

  test("flagOverlapBloom stays exact under a saturated (1 bit/key) filter") {
    // force heavy false positives: correctness must come from the
    // verify join, never from the Bloom FP rate
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isProbe = Sampling.sampleFilter(col("doc_id"), 150)
    val exact = Decontaminate
      .flagOverlap(docs.filter(!isProbe), docs.filter(isProbe))
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Decontaminate
      .flagOverlapBloom(docs.filter(!isProbe), docs.filter(isProbe),
        bitsPerKey = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom == exact)
  }

  test("flagOverlapBloom broadcasts only plan-visibly-bounded frames") {
    // the SF-scaled probe set must never carry a raw broadcast hint:
    // every hinted frame has to show a Limit marker (the bitset's
    // no-op .limit(m/64)) — the suite-wide audit contract
    import org.apache.spark.sql.catalyst.plans.logical._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isProbe = Sampling.sampleFilter(col("doc_id"), 150)
    // materialize = false: localCheckpoint would erase the logical
    // plan under inspection
    val plan = Decontaminate
      .flagOverlapBloom(docs.filter(!isProbe), docs.filter(isProbe),
        materialize = false)
      .queryExecution.analyzed
    val hinted = plan.collect { case h: ResolvedHint => h.child }
    assert(hinted.nonEmpty, "bitset lookups must be broadcast joins")
    val unbounded = hinted.filterNot(_.collectFirst {
      case _: GlobalLimit => (); case _: LocalLimit => ()
    }.isDefined)
    assert(unbounded.isEmpty, s"unbounded broadcast frames: $unbounded")
    spark.catalog.clearCache()
  }

  test("leakageSafeSplit: zero cross-split near-dup pairs; singletons keep the plain split") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assigned = Decontaminate.leakageSafeSplit(docs, 0.5)
      .as[(Long, String)].collect().toMap
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs, 0.5, materialize = true)
      .select("da", "db").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    // the remediation guarantee: the q_split_leakage audit over THIS
    // assignment is empty by construction
    val crossing = pairs.filter { case (a, b) => assigned(a) != assigned(b) }
    assert(crossing.isEmpty, s"near-dup pairs crossing the split: $crossing")
    // stability: docs in no near-dup pair keep the plain hash split
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val plain = docs.select(col("doc_id"),
        Sampling.splitLabel(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(assigned.keySet == plain.keySet, "every doc must be assigned")
    val moved = assigned.collect {
      case (id, s) if !paired.contains(id) && s != plain(id) => id
    }
    assert(moved.isEmpty, s"singleton docs must not move: $moved")
  }
}
