package graft.examples

import graft.SparkSpec
import graft.api.{GraftEnvironment, Iterations}
import graft.graph.Algorithms
import org.apache.spark.sql.functions._

/** The reference's remaining canonical example programs as golden
  * tests (SURVEY.md §5: WordCount/KMeans/CC are covered elsewhere;
  * here: TransitiveClosure, EnumTriangles, WebLogAnalysis-style
  * filter+join+anti-join — [U] stratosphere-examples/.../graph/
  * TransitiveClosureNaive.java, EnumTrianglesBasic.java,
  * relational/WebLogAnalysis.java). */
class ExampleWorkloadsSpec extends SparkSpec {

  import spark.implicits._
  lazy val env = new GraftEnvironment(spark)

  test("TransitiveClosure: bulk-iterated path expansion reaches fixpoint") {
    // 1->2->3->4, 5->6
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val closure = Iterations.bulk(edges, maxIterations = 10)(
      paths => paths.alias("p")
        .join(edges.alias("e"), col("p.dst") === col("e.src"))
        .select(col("p.src").as("src"), col("e.dst").as("dst"))
        .union(paths)
        .distinct(),
      terminate = (prev, next) => prev.count() == next.count())
    val got = closure.as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L)))
  }

  test("EnumTriangles: triangles found via edge-join-edge-join-edge") {
    // triangle 1-2-3 plus a dangling edge 3-4 and a second triangle 2-3-5
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 5L), (3L, 5L))
      .toDF("a", "b") // normalized a < b
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .join(e.alias("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val got = tri.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L, 3L), (2L, 3L, 5L)))
  }

  test("WebLogAnalysis shape: filter + join + anti-join over 3 relations") {
    // docs(url, rankable), ranks(url, rank), visits(url) ->
    // ranked docs matching filter with NO visit (anti join)
    val docs = Seq(("u1", true), ("u2", true), ("u3", false)).toDF("url", "ok")
    val ranks = Seq(("u1", 90), ("u2", 40), ("u3", 95)).toDF("url", "rank")
    val visits = Seq("u2").toDF("url")
    val got = docs.filter(col("ok"))
      .join(ranks, "url").filter(col("rank") > 50)
      .join(visits, Seq("url"), "left_anti")
      .select("url", "rank").as[(String, Int)].collect().toSeq
    assert(got == Seq(("u1", 90)))
  }

  test("EnumTriangles on the real bipartite graph yields none (sanity)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val e = li.select((col("l_orderkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
      .distinct().limit(500)
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .join(e.alias("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
    assert(tri.count() == 0) // bipartite graphs have no triangles
  }
}
