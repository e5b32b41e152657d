package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), ((col("n_chars") + 3) / 4).cast("long").as("toks"))

  test("packGreedy assigns every doc to the budget-aligned chunk of its start offset") {
    val packed = Packing.packGreedy(docs, "doc_id", "toks", budget = 1000, shards = 8)
      .select("shard", "pack", "pack_offset", "toks")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.length == docs.count())
    // a doc's pack is exactly its start-offset chunk
    assert(packed.forall { case (_, p, off, _) => p == off / 1000 })
    // within a (shard, pack), total tokens overshoot the budget by
    // less than the straddling last document
    packed.groupBy(t => (t._1, t._2)).foreach { case ((_, p), rows) =>
      val maxEnd = rows.map(r => r._3 + r._4).max
      val maxDoc = rows.map(_._4).max
      assert(maxEnd < (p + 1) * 1000 + maxDoc)
    }
  }

  test("packWithin never mixes groups inside a pack and chunks each group by start offset") {
    val grouped = docs.withColumn("grp", pmod(col("doc_id"), lit(7)))
    val packed = Packing.packWithin(grouped, "grp", "doc_id", "toks", budget = 1000)
      .select("grp", "pack", "pack_offset", "toks", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(packed.length == docs.count())
    // pack id is exactly the start-offset chunk within the group
    assert(packed.forall { case (_, p, off, _, _) => p == off / 1000 })
    // offsets within a group are a contiguous cumsum in doc_id order
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._5)
      assert(ordered.head._3 == 0L)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _           =>
      }
    }
  }

  test("packGreedy is deterministic across partitionings") {
    val a = Packing.packGreedy(docs, "doc_id", "toks", 1000, 8)
      .select("doc_id", "shard", "pack").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Packing.packGreedy(docs.repartition(11), "doc_id", "toks", 1000, 8)
      .select("doc_id", "shard", "pack").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
