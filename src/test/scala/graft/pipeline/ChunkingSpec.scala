package graft.pipeline

import graft.SparkSpec
import graft.text.TextFunctions

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("chunk windows match a hand model: starts, sizes, overlap, tail") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9; sizes 4,4,4,1
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
    val docs = Seq((7L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, chunkSize = 4, stride = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq

    def wv(w: String): Long =
      w.head.toLong * 1024 + w.last.toLong * 32 + w.length
    def fp(ws: Seq[String]): Long =
      ws.foldLeft(0L)((acc, w) => (acc * 31 + wv(w)) % TextFunctions.HashMod)
    val expect = Seq(0, 3, 6, 9).zipWithIndex.map { case (s, i) =>
      val chunk = words.slice(s, s + 4)
      (7L, i.toLong, chunk.length.toLong, fp(chunk))
    }
    assert(got == expect)
    // overlap really repeats tokens: chunk 0 ends with dd, chunk 1 starts with dd
    assert(words.slice(0, 4).last == words.slice(3, 7).head)
  }

  test("invariants over varied doc lengths: full coverage, window count, sizes") {
    // for every n_tokens in 1..40 (deterministic texts), size 8 / stride 5:
    // - window count = ceil(n / stride)
    // - all windows but possibly the last have size 8 OR end at n
    // - every token index is covered by at least one window
    val docs = (1 to 40).map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Chunking.chunkTokens(docs, chunkSize = 8, stride = 5)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    (1 to 40).foreach { n =>
      val chunks = rows(n.toLong)
      assert(chunks.length == math.ceil(n / 5.0).toInt, s"n=$n count")
      chunks.foreach { case (_, idx, nTok, _) =>
        val start = idx * 5
        assert(nTok == math.min(8, n - start), s"n=$n idx=$idx size")
      }
      val covered = chunks.flatMap { case (_, idx, nTok, _) =>
        (idx * 5) until (idx * 5 + nTok) }.toSet
      assert(covered == (0L until n.toLong).toSet, s"n=$n coverage")
    }
  }

  test("rolling prefix-hash fps match the slice-and-fold HOF reference bit-for-bit") {
    // varied lengths (1..40 tokens), empty-ish and multi-space-free
    // texts, two window geometries incl. stride == chunkSize (disjoint)
    val docs = ((1 to 40).map(n =>
        (n.toLong, (1 to n).map(i => s"w$i").mkString(" "))) :+
        (99L, "") :+ (100L, "single"))
      .toDF("doc_id", "text")
    for ((size, stride) <- Seq((8, 5), (4, 4), (64, 48))) {
      val fast = Chunking.chunkTokens(docs, size, stride)
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val ref = Chunking.chunkTokensHof(docs, size, stride)
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(fast == ref, s"size=$size stride=$stride")
    }
  }

  test("an off-by-one window start would change the fingerprint (boundary pin)") {
    val words = Seq("aa", "bb", "cc", "dd", "ee")
    def wv(w: String): Long =
      w.head.toLong * 1024 + w.last.toLong * 32 + w.length
    def fp(ws: Seq[String]): Long =
      ws.foldLeft(0L)((acc, w) => (acc * 31 + wv(w)) % TextFunctions.HashMod)
    assert(fp(words.slice(0, 4)) != fp(words.slice(1, 5)))
  }
}
