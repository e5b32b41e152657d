package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k: k rows per query, self excluded, sims descending") {
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(emb, queries, 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length == 25)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.forall(_._2 != qid), "self must be excluded")
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "descending")
    }
  }

  test("cosine agrees with a local computation") {
    val rows = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    def localCos(a: Seq[Float], b: Seq[Float]): Double = {
      def dotS(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => math.round(p * q * 1e12).toLong }.sum
      (dotS(a, b) / 1e12) / (math.sqrt(dotS(a, a) / 1e12) * math.sqrt(dotS(b, b) / 1e12))
    }
    val spark2 = emb.filter(col("vec_id") < 3)
    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), spark2, 2)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    val m = rows.toMap
    for (((q, c), sim) <- got) {
      val expect = math.round(localCos(m(q), m(c)) * 1e6) / 1e6
      assert(math.abs(sim - expect) < 1e-12, s"($q,$c): $sim vs $expect")
    }
  }

  test("LSH ANN: recall@5 vs brute force is usable, candidates shrink") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, queries, 5, planes = 4)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // multi-probe LSH on unclustered random embeddings: the probe set
    // covers (planes+1)/2^planes of the corpus per query
    assert(recall > 0.4, s"recall collapsed: $recall")
    assert(ann.size <= brute.size + 100)
  }

  test("codegen'd CosineSim matches the HOF formulation bit-for-bit") {
    val pairs = emb.alias("a").crossJoin(emb.limit(20).alias("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
    val diff = pairs.select(
        graft.functions.CosineSim.cosineSim(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(diff.count() == 0)
    // and it runs inside whole-stage codegen (not interpreted);
    // AQE finalizes the plan only after execution
    val proj = pairs.select(
      graft.functions.CosineSim.cosineSim(col("a.embedding"), col("b.embedding")))
    proj.collect()
    // "*(n)" prefixes mark WholeStageCodegen stages in plan strings
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("cosinesim"), plan)
  }

  test("IVF ANN: higher recall than single-shot LSH at similar candidate volume") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 6)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.5, s"IVF recall collapsed: $recall")
    // determinism
    val again = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 6)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(ivf == again)
  }

  test("kNN graph: per-vector neighbors match ivfTopK with the corpus as queries") {
    // knnGraph IS ivfTopK with probe side = corpus, minus the
    // bounded-query broadcast; the outputs must be identical
    val graph = Similarity.knnGraph(emb, 5, nlist = 16, nprobe = 4)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val viaTopK = Similarity.ivfTopK(emb, emb, 5, nlist = 16, nprobe = 4)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(graph == viaTopK)
    // every corpus vector gets neighbors (no probe starves at k=5
    // with ~16-vector cells on this fixture)
    assert(Similarity.knnGraph(emb, 5).select("qid").distinct().count() ==
      emb.count())
  }

  test("kNN graph: usable recall vs the brute-force graph") {
    val brute = Similarity.bruteForceTopK(emb, emb, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val graph = Similarity.knnGraph(emb, 5, nlist = 16, nprobe = 6)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & graph).size.toDouble / brute.size
    assert(recall > 0.5, s"kNN-graph recall collapsed: $recall")
  }

  test("kNN clusters: match a local union-find over the mutual pairs of the graph") {
    val edges = Similarity.knnGraph(emb, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val mutual = edges.filter { case (a, b) => a < b && edges.contains((b, a)) }
    // local union-find model
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val model = parent.keys.toSeq.groupBy(find)
      .map { case (root, members) =>
        // min-id labeling matches CC's component contract
        (members.min, members.size.toLong, members.max, members.sum) }
      .toSet
    val got = Similarity.knnClusters(emb, 5)
      .select("cluster_id", "n_vecs", "max_vec", "sum_vec")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == model, s"clusters diverge from the local model:\n$got\nvs\n$model")
  }

  test("semi-hard negatives: band and ranks match a local model over exact sims") {
    val queries = emb.filter(col("vec_id") < 10)
    val got = Similarity.semiHardNegatives(emb, queries, 5)
      .select("qid", "cid", "rk").as[(Long, Long, Int)].collect().toSet
    // independent pairwise sims via the same quantized expression,
    // model arithmetic in exact 1e-6-unit longs
    val sims = broadcast(queries.select(col("vec_id").as("qid"),
        col("embedding").as("qv"), col("label").as("qlabel")))
      .join(emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("label").as("clabel")), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qlabel"), col("clabel"),
        Similarity.simRounded(col("qv"), col("cv")).as("sim"))
      .as[(Long, Long, Long, Long, Double)].collect()
    val model = sims.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val posQ = rows.filter(r => r._3 == r._4).map(r => math.round(r._5 * 1e6)).max
      rows.filter(r => r._3 != r._4)
        .map(r => (r._2, math.round(r._5 * 1e6)))
        .filter { case (_, sq) => sq < posQ && sq >= posQ - 100000L }
        .sortBy { case (cid, sq) => (-sq, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, _), i) => (qid, cid, i + 1) }
    }.toSet
    assert(got == model, s"semi-hard set diverges:\n$got\nvs\n$model")
  }

  test("LshBucketExpr matches the Column hyperplane formulation") {
    val diff = emb.select(
        Similarity.lshBucket(col("embedding"), 8, 64).as("fast"),
        Similarity.lshBucketRef(col("embedding"), 8, 64).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("deterministic: two runs give identical top-k") {
    val q = emb.filter(col("vec_id") < 3)
    val a = Similarity.bruteForceTopK(emb, q, 5).collect().toSeq
    val b = Similarity.bruteForceTopK(emb, q, 5).collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
  }
}
