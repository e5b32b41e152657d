package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.sum

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def naiveBpe(words: Map[String, Long], m: Int) =
    NaiveBpe.merges(words, m)

  private def trained(texts: Seq[String], m: Int) =
    Bpe.train(spark, texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"), m)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("merges apply left-to-right non-overlapping (the BPE order)") {
    // "aaa" -> (a)(a)(a)(_): pair (a,a) counts 2; applying it
    // left-to-right gives (aa)(a)(_), so merge 2 is (a,_) — an
    // overlapping or right-to-left replace would yield (a,aa) instead
    assert(trained(Seq("aaa"), 2) ==
      Seq((1, "a", "a", 2L), (2, "a", "_", 1L)))
  }

  test("training stops early when the dictionary is fully merged") {
    // "ab" merges (a,b) then (ab,_) and is then a single symbol
    assert(trained(Seq("ab"), 10) ==
      Seq((1, "a", "b", 1L), (2, "ab", "_", 1L)))
  }

  test("distributed trainer matches the naive reference (Sennrich fixture)") {
    val texts = Seq.fill(5)("low").mkString(" ") ::
      Seq.fill(2)("lower").mkString(" ") ::
      Seq.fill(6)("newest").mkString(" ") ::
      Seq.fill(3)("widest").mkString(" ") :: Nil
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (k, xs) => (k, xs.size.toLong) }
    assert(trained(texts, 8) == naiveBpe(words, 8))
  }

  test("encodeVocab matches the naive final segmentation histogram") {
    val texts = Seq.fill(5)("low").mkString(" ") ::
      Seq.fill(2)("lower").mkString(" ") ::
      Seq.fill(6)("newest").mkString(" ") ::
      Seq.fill(3)("widest").mkString(" ") :: Nil
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (k, xs) => (k, xs.size.toLong) }
    // replay the naive trainer's dictionary to a symbol histogram
    var w: Map[Vector[String], Long] =
      words.map { case (k, c) => (k.map(_.toString).toVector :+ "_", c) }
    naiveBpe(words, 8).foreach { case (_, l, r, _) =>
      w = NaiveBpe.apply(w, l, r)
    }
    val expected = w.toSeq.flatMap { case (syms, c) => syms.map((_, c)) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    val got = Bpe.encodeVocab(spark,
        texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"), 8)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("docTokenCounts: per-doc subword lengths under the learned merges") {
    val docs = Seq((0L, "ab ab"), (1L, "ab")).toDF("doc_id", "text")
    // m=1 learns (a,b) -> each "ab" is (ab)(_) = 2 subwords;
    // m=2 also learns (ab,_) -> 1 subword per word
    val m1 = Bpe.docTokenCounts(spark, docs, 1)
      .as[(Long, Long)].collect().toMap
    assert(m1 == Map(0L -> 4L, 1L -> 2L))
    val m2 = Bpe.docTokenCounts(spark, docs, 2)
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(0L -> 2L, 1L -> 1L))
  }

  test("subword mass conservation: doc counts sum to the vocab histogram") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val perDoc = Bpe.docTokenCounts(spark, docs, 12)
      .agg(sum("n_subwords")).as[Long].head()
    val hist = Bpe.encodeVocab(spark, docs, 12)
      .agg(sum("cnt")).as[Long].head()
    assert(perDoc == hist)
  }

  test("tokenCountWith serves a stream identically to the batch join path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.mergesOf(spark, docs, 12)
    val batch = Bpe.docTokenCounts(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    val in = MemoryStream[(Long, String)]
    val q = Bpe.tokenCountWith(in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_counts")
      .outputMode("append").start()
    in.addData(docs.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq)
    q.processAllAvailable(); q.stop()
    val got = spark.table("bpe_counts").as[(Long, Long)].collect().toMap
    assert(got == batch)
  }

  test("local heap trainer replays the distributed trajectory bit-identically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = Bpe.train(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val fast = Bpe.trainFast(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(fast == dist)
    val ev = Bpe.encodeVocab(spark, docs, 12)
      .as[(String, Long)].collect().toMap
    val evF = Bpe.encodeVocabFast(spark, docs, 12)
      .as[(String, Long)].collect().toMap
    assert(evF == ev)
    val dt = Bpe.docTokenCounts(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    val dtF = Bpe.docTokenCountsFast(spark, docs, 12)
      .as[(Long, Long)].collect().toMap
    assert(dtF == dt)
  }

  test("local heap trainer matches naive on a deep trajectory (m=200)") {
    // deterministic synthetic vocabulary with enough pair entropy to
    // sustain 200 merges — exercises the lazy-deletion heap's stale
    // and re-attained-count paths far beyond the oracle's m=12
    val words: Map[String, Long] = (0 until 800).map { i =>
      val len = 3 + (i % 6)
      val w = (0 until len)
        .map(j => ('a' + ((i * 31 + j * 7 + i / 5) % 5)).toChar).mkString
      (w, (i % 13).toLong + 1L)
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
    val (merges, dict) = Bpe.trainLocalMerges(words.toSeq, 200)
    assert(merges == naiveBpe(words, 200))
    // and the final segmentation agrees with a naive replay
    var w: Map[Vector[String], Long] =
      words.map { case (k, c) => (k.map(_.toString).toVector :+ "_", c) }
    merges.foreach { case (_, l, r, _) => w = NaiveBpe.apply(w, l, r) }
    val expected = w.toSeq.flatMap { case (syms, c) => syms.map((_, c)) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    val got = dict.toSeq.flatMap { case (_, syms, c) => syms.map((_, c)) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
    assert(got == expected)
  }

  test("supplementary-plane tie-break is code-point order, matching the distributed argmax") {
    // ADVICE r14 #2: String.compareTo is UTF-16 code-unit order, where
    // a surrogate (0xD800+) sorts BELOW U+E000..U+FFFF — the opposite
    // of the UTF-8-binary (code-point) collation the distributed twins
    // and DuckDB sort by. Fixture: every pair count ties at 5, so the
    // argmax is decided purely by the symbol order of U+FFFD vs
    // U+10000 — the two orders disagree on exactly this comparison.
    val repl = "�"              // U+FFFD, 3 UTF-8 bytes
    val supp = new String(Character.toChars(0x10000)) // U+10000, surrogate pair
    assert(repl.compareTo(supp) > 0, "UTF-16 order must misorder the fixture")
    assert(MergeMachine.cpCompare(repl, supp) < 0)
    val docs = Seq((1L, (s"a$repl a$supp " * 5).trim)).toDF("doc_id", "text")
    val dist = Bpe.train(spark, docs, 1)
      .as[(Int, String, String, Long)].collect().toSeq
    val local = Bpe.trainLocalMerges(
      Seq((s"a$repl", 5L), (s"a$supp", 5L)), 1)._1
    assert(dist == Seq((1, "a", repl, 5L)),
      "distributed argmax must pick the code-point-smaller right symbol")
    assert(local.map(t => (t._1, t._2, t._3, t._4)) == dist,
      "local heap trainer must agree beyond the ASCII plane")
    // and the WordPiece scan path (all four pairs tie on score too:
    // every candidate scores 5*Scale/50)
    val wpLocal = Wordpiece.trainLocalMerges(
      Seq((s"a$repl", 5L), (s"a$supp", 5L)), 1)._1
    val wpDist = Wordpiece.train(spark, docs, 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(wpDist.map(t => (t._2, t._3)) == Seq(("a", repl)))
    assert(wpLocal.map(t => (t._1, t._2, t._3, t._4)) == wpDist)
  }

  test("byte leg: local trainer replays the distributed byte trajectory (r16)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = Bpe.trainBytes(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val fast = Bpe.trainFastBytes(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(fast == dist)
    assert(dist.nonEmpty && dist.forall { case (_, l, r, _) =>
      (l + r).grouped(3).forall(s => s.startsWith("b") || s == "_")
    }, "byte symbols are b-hex triplets")
    // char and byte trajectories are genuinely different families:
    // the byte leg's merge elements live in the b-hex alphabet
    val char = Bpe.trainFast(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(char.map(t => (t._2, t._3)) != dist.map(t => (t._2, t._3)))
  }

  test("byte leg: no OOV on arbitrary Unicode incl. supplementary planes (r16)") {
    // train on a tiny ASCII corpus, then serve words the trainer
    // NEVER saw — emoji, CJK, reserved characters, raw controls: the
    // 256-symbol byte alphabet segments everything, and concatenating
    // the emitted symbols (modulo the _ marker) recovers the word's
    // exact UTF-8 bytes
    val merges = Bpe.trainLocalMerges(
      Seq(("the", 50L), ("then", 20L), ("than", 10L)), 6,
      MergeMachine.byteSegmenter)._1.map(t => (t._2, t._3))
    assert(merges.nonEmpty)
    Seq("日本語", "🙂🚀", "naïve", "a(b)_c", " ", "the", "theme", "kite")
      .foreach { w =>
        val toks = Bpe.encodeWordBytes(merges, w)
        assert(toks.last == "_" || toks.last.endsWith("_"), s"'$w' end marker")
        val hex = toks.mkString("").replace("_", "")
        val roundTrip = hex.grouped(3).map { sym =>
          // fixed-width b-hex triplets — splitting on 'b' would
          // misparse bytes like 0x6b whose hex contains it (r16 #7)
          assert(sym.length == 3 && sym.startsWith("b"),
            s"'$w' bad symbol '$sym'")
          Integer.parseInt(sym.drop(1), 16).toByte
        }.toArray
        assert(roundTrip.sameElements(w.getBytes("UTF-8")),
          s"'$w' byte round trip through served tokens")
      }
    // the trained merges actually apply: 'the' compresses below its
    // byte count + marker
    assert(Bpe.encodeWordBytes(merges, "the").length < 4)
  }

  test("local trainer rejects reserved characters loudly (module precondition)") {
    // review r14 #3: the local trainer could segment ( ) _ correctly
    // while the distributed paren encoding garbles them — it must
    // FAIL the documented contract instead of silently diverging
    Seq("a(b", "a)b", "a_b").foreach { tok =>
      intercept[IllegalArgumentException] {
        Bpe.trainLocalMerges(Seq((tok, 1L)), 2)
      }
    }
  }

  test("matches the naive reference on the real corpus (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select("text").as[String].collect()
      .flatMap(_.split(" ")).groupBy(identity)
      .map { case (k, xs) => (k, xs.size.toLong) }
    val got = Bpe.train(spark, docs, 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == naiveBpe(words, 12))
  }
}
