package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.sum

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def trained(texts: Seq[String], m: Int) =
    Wordpiece.train(spark,
        texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"), m)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("likelihood objective picks cohesion over frequency") {
    // "xy" always co-occur (c(xy)=2, c(x)=c(y)=2 -> score 2/(2*2));
    // "ta" is frequent but incidental (c(ta)=3, c(t)=6, c(a)=3 ->
    // 3/18). BPE would merge the most frequent pair first; WordPiece
    // must merge the most COHESIVE
    val texts = Seq("ta ta ta xy xy t t t")
    val got = trained(texts, 1)
    assert(got.head._2 == "x" && got.head._3 == "y",
      s"expected the cohesive (x,y) merge first, got $got")
  }

  test("distributed trainer matches the naive reference (deep trajectory)") {
    val texts = Seq.fill(5)("low").mkString(" ") ::
      Seq.fill(2)("lower").mkString(" ") ::
      Seq.fill(6)("newest").mkString(" ") ::
      Seq.fill(3)("widest").mkString(" ") :: Nil
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (k, xs) => (k, xs.size.toLong) }
    assert(trained(texts, 8) == NaiveWordpiece.merges(words, 8))
  }

  test("local trainer replays the distributed trajectory bit-identically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = Wordpiece.train(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val fast = Wordpiece.trainFast(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(fast == dist)
    val dt = Wordpiece.docTokenCounts(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    val dtF = Wordpiece.docTokenCountsFast(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    assert(dtF == dt)
  }

  test("local trainer matches naive on a deep synthetic trajectory (m=150)") {
    val words: Map[String, Long] = (0 until 600).map { i =>
      val len = 3 + (i % 6)
      val w = (0 until len)
        .map(j => ('a' + ((i * 31 + j * 7 + i / 5) % 5)).toChar).mkString
      (w, (i % 13).toLong + 1L)
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
    val (merges, dict) = Wordpiece.trainLocalMerges(words.toSeq, 150)
    assert(merges == NaiveWordpiece.merges(words, 150))
    // segmentation consistency: replaying the merges naively gives
    // the same final symbol histogram as the trainer's dictionary
    var w: Map[Vector[String], Long] =
      words.map { case (k, c) => (k.map(_.toString).toVector :+ "_", c) }
    merges.foreach { case (_, l, r, _) => w = NaiveBpe.apply(w, l, r) }
    val expected = w.toSeq.flatMap { case (syms, c) => syms.map((_, c)) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    val got = dict.toSeq.flatMap { case (_, syms, c) => syms.map((_, c)) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    assert(got == expected)
  }

  test("wordpiece and bpe trajectories genuinely differ on the real corpus") {
    // the two families must not silently be the same operator: the
    // merge SEQUENCES diverge on the fixture corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wp = Wordpiece.trainFast(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map(t => (t._2, t._3))
    val bpe = Bpe.trainFast(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map(t => (t._2, t._3))
    assert(wp != bpe, "wordpiece and bpe picked identical merges")
  }

  test("frozen-merge serving: Bpe.tokenCountWith replays the wordpiece table (OOV-safe)") {
    // wordpiece-by-merges shares BPE's artifact shape, so the
    // stateless replace-chain serving path works verbatim with the
    // wordpiece merge table — including on words never seen at
    // training (the dict join can't do that); batch parity pinned
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Wordpiece.trainFast(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map(t => (t._2, t._3))
    val viaChain = Bpe.tokenCountWith(docs, merges)
      .as[(Long, Long)].collect().toMap
    val viaDict = Wordpiece.docTokenCountsFast(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    assert(viaChain == viaDict)
  }

  test("subword mass conservation under the wordpiece dictionary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // every doc's subword count >= its whitespace token count (each
    // word is >= 1 piece), and total mass is stable across the two
    // training paths (checked bit-exact above) — here pin the frame
    // totals against the raw corpus shape
    val nDocs = docs.count()
    val perDoc = Wordpiece.docTokenCountsFast(spark, docs, 12)
    assert(perDoc.count() == nDocs)
    val toks = docs.selectExpr("sum(size(split(text, ' ')))").as[Long].head()
    val subs = perDoc.agg(sum("n_subwords")).as[Long].head()
    assert(subs >= nDocs && subs <= toks * 32,
      s"implausible subword mass $subs vs $toks whitespace tokens")
  }
}
