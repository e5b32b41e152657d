package graft.props

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.TextHash
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks (SURVEY.md §5: the reference has no
  * property-testing corpus; we add one). ScalaCheck generators with
  * fixed seeds feed both a local model and the distributed operator;
  * agreement is the property. (Plain ScalaTest driver — the
  * scalatest/scalacheck bridge artifact isn't a declared dep.) */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "agg", "scan", "join", "sort", "data", "key", "row", "col", "the", "a")
  private val doc: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: jaccard join equals the local brute-force model") {
    for (round <- 1 to 5) {
      val texts = sample(Gen.listOfN(12, doc), 42L + round)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.jaccardSimilarityJoin(docs, 0.5)
        .select("da", "db").as[(Long, Long)].collect().toSet
      val local = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, TextHash.shingles3(UTF8String.fromString(t)).map(_.toString).toSet)
      }
      val expected = (for {
        (a, sa) <- local; (b, sb) <- local
        if a < b && (sa.nonEmpty || sb.nonEmpty)
        common = (sa & sb).size
        if common.toDouble / (sa.size + sb.size - common) >= 0.5
      } yield (a, b)).toSet
      assert(got == expected, s"round $round: $texts")
    }
  }

  test("property: fingerprint matches a local rolling-hash model") {
    for (round <- 1 to 5) {
      val texts = sample(Gen.listOfN(8, doc), 1000L + round)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = df.select(col("id"), TextFunctions.fingerprint(col("text")))
        .as[(Long, Long)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val expected = t.split(" ", -1).foldLeft(0L) { (h, w) =>
          val first = if (w.isEmpty) 0 else w.charAt(0).toInt
          val last = if (w.isEmpty) 0 else w.charAt(w.length - 1).toInt
          (h * 31 + (first * 1024L + last * 32L + w.length)) % 1000000007L
        }
        assert(got(i.toLong) == expected, s"round $round doc '$t'")
      }
    }
  }

  test("property: exactSum is invariant under repartitioning") {
    for (round <- 1 to 5) {
      val cents = sample(Gen.listOfN(50, Gen.chooseNum(0, 100000)), 7L + round)
      val vals = cents.map(_ / 100.0)
      val a = vals.toDF("v").agg(graft.Tables.exactSum(col("v"), 2)).as[Double].head()
      val b = vals.toDF("v").repartition(7).agg(graft.Tables.exactSum(col("v"), 2))
        .as[Double].head()
      assert(a == b)
      assert(a == cents.map(_.toLong).sum / 100.0)
    }
  }

  test("property: enumTriangles equals the local brute-force model") {
    import graft.graph.Algorithms
    val edgeGen = Gen.listOfN(25,
      for { a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L) if a != b }
      yield (math.min(a, b), math.max(a, b)))
    for (round <- 1 to 5) {
      val edges = sample(edgeGen, 7L + round).distinct
      val got = Algorithms.enumTriangles(edges.toDF("a", "b"))
        .as[(Long, Long, Long)].collect().toSet
      val es = edges.toSet
      val expected = (for {
        (x, y) <- es; (y2, z) <- es
        if y2 == y && es.contains((x, z))
      } yield (x, y, z)).toSet
      assert(got == expected, s"round $round: $edges")
    }
  }

  test("property: idBucket matches a BigInt model for the FULL long range (overflow guard)") {
    import graft.pipeline.Sampling
    val ids = Gen.oneOf(
      Gen.chooseNum(0L, 1000000L),                   // the normal corpus range
      Gen.chooseNum(Long.MaxValue - 1000000L, Long.MaxValue), // would overflow pre-fix
      Gen.chooseNum(3400000000L, 4000000000L))       // the old ~3.5e9 cliff
    for (round <- 1 to 3) {
      val xs = sample(Gen.listOfN(40, ids), 17L + round)
      val got = xs.toDF("id")
        .select(col("id"), Sampling.idBucket(col("id"), 1000).as("b"))
        .as[(Long, Long)].collect().toMap
      xs.foreach { id =>
        val p = BigInt(1000000007L)
        val expected = ((((BigInt(id) mod p) * BigInt(2654435761L)) mod p)
          mod BigInt(1000)).toLong
        assert(got(id) == expected, s"id=$id got=${got(id)} want=$expected")
      }
    }
  }

  test("property: intersect/except equal the local set models") {
    val keyList = Gen.listOfN(30, Gen.chooseNum(0L, 14L))
    for (round <- 1 to 5) {
      val xs = sample(keyList, 11L + round)
      val ys = sample(keyList, 211L + round)
      val xd = xs.toDF("k"); val yd = ys.toDF("k")
      assert(xd.intersect(yd).as[Long].collect().toSet == (xs.toSet & ys.toSet))
      assert(xd.except(yd).as[Long].collect().toSet == (xs.toSet -- ys.toSet))
    }
  }

  test("property: rollup equals manually-unioned subtotal levels") {
    val rowGen = Gen.listOfN(40,
      for { f <- Gen.oneOf("A", "N", "R"); s <- Gen.oneOf("O", "F")
            q <- Gen.chooseNum(1, 50) } yield (f, s, q.toLong))
    for (round <- 1 to 3) {
      val rows = sample(rowGen, 5L + round)
      val df = rows.toDF("f", "s", "q")
      val got = df.rollup(col("f"), col("s"))
        .agg(sum(col("q")).as("sq")).as[(String, String, Long)]
        .collect().toSet
      val l2 = rows.groupBy(r => (r._1, r._2)).map { case ((f, s), g) =>
        (f, s, g.map(_._3).sum) }.toSet
      val l1 = rows.groupBy(_._1).map { case (f, g) =>
        (f, null.asInstanceOf[String], g.map(_._3).sum) }.toSet
      val l0 = Set((null.asInstanceOf[String], null.asInstanceOf[String],
        rows.map(_._3).sum))
      assert(got == (l2 ++ l1 ++ l0), s"round $round")
    }
  }

  test("property: quantized LSH bucket sign only flips within quantization error of zero") {
    // the 1e-6 quantization may only disagree with an exact-rational
    // dot product when the plane sum is within dim/2 quantization
    // units of zero — i.e. the bucket stays a faithful hyperplane hash
    import graft.sim.Similarity
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 997.0f))
    for (round <- 1 to 5) {
      val v = sample(vecGen, 31L + round).toArray
      val bucket = Seq(Tuple1(v)).toDF("embedding")
        .select(Similarity.lshBucket(col("embedding"), 4, dim).as("b"))
        .as[Int].head()
      (0 until 4).foreach { p =>
        // exact model: BigDecimal dot product of the float values
        val exact = (0 until dim).map { d =>
          BigDecimal(v(d).toDouble) * BigDecimal(Similarity.hyperplaneWeight(p, d))
        }.sum
        val gotSign = (bucket >> p) & 1
        val eps = BigDecimal(dim) / 2 / BigDecimal(1000000) // dim/2 quant units
        if ((exact.abs > eps))
          assert(gotSign == (if (exact >= 0) 1 else 0),
            s"round $round plane $p: exact=$exact bucket=$bucket")
      }
    }
  }

  test("property: path-doubling closure equals the local reachability model") {
    import graft.api.Iterations
    val edgeGen = Gen.listOfN(15,
      for { a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L) if a != b }
      yield (a, b))
    for (round <- 1 to 3) {
      val edges = sample(edgeGen, 99L + round).distinct
      // doubling: 4 supersteps cover paths of length <= 16 > 10 vertices
      val closure = Iterations.bulk(edges.toDF("src", "dst"), 4) { c =>
        c.alias("p").join(c.alias("q"), col("p.dst") === col("q.src"))
          .select(col("p.src").as("src"), col("q.dst").as("dst"))
          .union(c).distinct()
      }
      val got = closure.as[(Long, Long)].collect().toSet
      // local model: Floyd-Warshall-style reachability over 10 nodes
      var reach = edges.toSet
      var grew = true
      while (grew) {
        val next = reach ++ (for { (a, b) <- reach; (b2, c) <- reach if b2 == b }
          yield (a, c))
        grew = next.size > reach.size
        reach = next
      }
      assert(got == reach, s"round $round: $edges")
    }
  }

  test("property: codecs round-trip random rasters and sample streams byte-exactly") {
    import graft.multimodal.{AudioCodec, MediaCodec}
    val dimGen = Gen.chooseNum(1, 40)
    for (round <- 1 to 10) {
      val w = sample(dimGen, 300L + round)
      val h = sample(dimGen, 400L + round)
      val rgb = sample(Gen.listOfN(w * h * 3,
        Gen.chooseNum(-128, 127).map(_.toByte)), 500L + round).toArray
      val viaPpm = MediaCodec.decode(MediaCodec.encodePpm(w, h, rgb))
      assert(viaPpm.width == w && viaPpm.height == h && viaPpm.rgb.sameElements(rgb))
      val viaBmp = MediaCodec.decode(MediaCodec.encodeBmp(w, h, rgb))
      assert(viaBmp.width == w && viaBmp.height == h && viaBmp.rgb.sameElements(rgb),
        s"round $round bmp ${w}x$h")
      // PNG (r14): random rasters through deflate + all five row
      // filters and back — inflate/defilter must be bit-exact on
      // arbitrary bytes, not just the cycled-ASCII fixture content
      val viaPng = MediaCodec.decode(MediaCodec.encodePng(w, h, rgb))
      assert(viaPng.width == w && viaPng.height == h && viaPng.rgb.sameElements(rgb),
        s"round $round png ${w}x$h")
      val n = sample(Gen.chooseNum(1, 500), 600L + round)
      val rate = sample(Gen.oneOf(AudioCodec.Rates.toSeq), 650L + round)
      val pcm = sample(Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort)),
        700L + round).toArray
      val audio = AudioCodec.decodeWav(AudioCodec.encodeWav(rate, pcm))
      assert(audio.sampleRate == rate && audio.samples.sameElements(pcm),
        s"round $round wav n=$n rate=$rate")
    }
  }

  test("property: WARC framing round-trips arbitrary printable payloads") {
    import graft.text.Warc
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // payloads draw from printable ASCII *plus* CR/LF so bodies can
    // contain header-terminator look-alikes and HTTP-header-shaped
    // lines — only declared-length framing survives that
    val chGen = Gen.frequency(
      (20, Gen.chooseNum(32, 126).map(_.toChar)),
      (1, Gen.const('\r')), (1, Gen.const('\n')))
    for (round <- 1 to 10) {
      val n = sample(Gen.chooseNum(1, 400), 800L + round)
      val payload = sample(Gen.listOfN(n, chGen), 900L + round).mkString
      val id = sample(Gen.chooseNum(0L, 1000L), 1000L + round)
      val out = Seq((id, payload)).toDF("doc_id", "payload")
        .select(Warc.warcify(col("doc_id"), col("payload")).as("rec"))
        .select(Warc.bodyOf(col("rec")).as("b"),
          Warc.bodyOk(col("rec")).as("ok"),
          Warc.targetUri(col("rec")).as("u"))
        .as[(String, Boolean, String)].head()
      assert(out._1 == payload && out._2, s"round $round body diverged")
      assert(out._3 == s"http://src${id % 20}.example/doc/$id")
    }
  }

  test("property: HTTP envelope strip round-trips adversarial payloads (r15)") {
    import graft.text.Warc
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // payloads carry CR/LF (blank-line look-alikes) AND lines shaped
    // like HTTP headers — the strip must split at the envelope's
    // first blank line only, and status/charset must come from the
    // envelope, never the payload
    val chGen = Gen.frequency(
      (16, Gen.chooseNum(32, 126).map(_.toChar)),
      (1, Gen.const('\r')), (1, Gen.const('\n')))
    for (round <- 1 to 10) {
      val n = sample(Gen.chooseNum(1, 300), 1800L + round)
      val noise = sample(Gen.listOfN(n, chGen), 1900L + round).mkString
      val payload = s"HTTP/1.1 500 Fake\r\ncharset=ko-KR\r\n\r\n$noise"
      val id = sample(Gen.chooseNum(0L, 1000L), 2000L + round)
      val out = Seq((id, payload)).toDF("doc_id", "payload")
        .select(Warc.warcify(col("doc_id"),
          Warc.httpWrap(col("doc_id"), col("payload"))).as("rec"))
        .select(Warc.bodyOf(col("rec")).as("body"))
        .select(Warc.httpStatus(col("body")).as("s"),
          Warc.httpCharset(col("body")).as("cs"),
          Warc.httpPayload(col("body")).as("p"))
        .as[(Option[Int], Option[String], String)].head()
      (id % 3) match {
        case 0 =>
          assert(out._1.contains(200) && out._2.contains("utf-8"),
            s"round $round envelope fields")
          assert(out._3 == payload, s"round $round payload strip diverged")
        case 1 =>
          assert(out._1.contains(404) && out._2.isEmpty)
          assert(out._3 == payload)
        case _ =>
          // envelope-less band: the body IS the payload, which here
          // starts with "HTTP/" — the strip honestly treats it as an
          // envelope and splits at ITS first blank line (a real
          // resource record whose body is a raw HTTP capture looks
          // exactly like a response record; content-addressing cannot
          // distinguish them). Fields come from the payload's line.
          assert(out._1.contains(500) && out._3 == noise)
      }
    }
  }

  test("property: gz member writer/walker round-trip arbitrary binary records (r15)") {
    import graft.text.Warc
    // raw BYTE records (not just printable text): the writer/reader
    // pair must be byte-faithful for any content, any member sizes
    for (round <- 1 to 8) {
      val nRecs = sample(Gen.chooseNum(1, 30), 2100L + round)
      val recs = (0 until nRecs).map { i =>
        val len = sample(Gen.chooseNum(0, 4000), 2200L + round * 31 + i)
        sample(Gen.listOfN(len, Gen.chooseNum(-128, 127).map(_.toByte)),
          2300L + round * 31 + i).toArray
      }
      val bos = new java.io.ByteArrayOutputStream()
      Warc.writeGzMembers(bos, recs.iterator)
      val got = Warc.gzipMemberIterator(
        new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
      assert(got.length == nRecs, s"round $round member count")
      got.zip(recs).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.sameElements(e), s"round $round member $i diverged")
      }
    }
  }

  test("property: asof join equals the local latest-at-or-before model") {
    val rowGen = for {
      k <- Gen.chooseNum(0L, 4L)
      ts <- Gen.chooseNum(0L, 30L)
    } yield (k, ts)
    for (round <- 1 to 5) {
      val lRows = sample(Gen.listOfN(25, rowGen), 7L + round)
        .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      // distinct right (key, ts): ties are a documented tieBreak
      // concern, not as-of semantics — tested separately in AsOfSpec
      val rRows = sample(Gen.listOfN(25, rowGen), 77L + round)
        .distinct.map { case (k, ts) => (k, ts, k * 1000 + ts) }
      val got = graft.api.AsOf.join(
          lRows.toDF("k", "ts", "lid"), rRows.toDF("k", "rts", "v"),
          Seq("k"), "ts", "rts", payload = Seq("v"))
        .select("lid", "asof_v").as[(Long, Option[Long])].collect().toMap
      val expected = lRows.map { case (k, ts, lid) =>
        val cands = rRows.filter(r => r._1 == k && r._2 <= ts)
        lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got == expected, s"round $round")
    }
  }

  test("property: nearDupClusters equals min-union-find over the LSH pair graph") {
    // docs long enough to carry shingles, plus planted exact copies so
    // the pair graph is non-trivial every round
    val longDoc: Gen[String] =
      Gen.chooseNum(6, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (round <- 1 to 3) {
      val base = sample(Gen.listOfN(10, longDoc), 9000L + round)
      val texts = base ++ base.take(4)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, "en", t) }.toDF("doc_id", "lang", "text")
      val pairs = Dedup.minhashLshPairs(docs, 0.5)
        .select("da", "db").as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb // root = component min
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = members.groupBy(find).map { case (root, ms) =>
        (root, ms.length.toLong, ms.max, ms.sum)
      }.toSet
      val got = Dedup.nearDupClusters(docs, 0.5)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"round $round")
      assert(expected.nonEmpty, s"round $round planted dups produced no pairs")
    }
  }

  test("property: kCoreTrajectory equals the local peel model") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L) if a != b
    } yield (a, b)
    for (round <- 1 to 3) {
      val es = sample(Gen.listOfN(15, edgeGen), 4200L + round)
      val got = graft.graph.Algorithms
        .kCoreTrajectory(es.toDF("src", "dst"), k = 2, rounds = 3)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // local model: undirected multiset peel, exactly 3 synchronous rounds
      var und = es ++ es.map(_.swap)
      val expected = (1 to 3).map { r =>
        val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= 2).keySet
        und = und.filter(e => keep(e._1) && keep(e._2))
        val vs = und.map(_._1).distinct
        (r.toLong, vs.size.toLong, vs.sum, und.size.toLong)
      }
      assert(got == expected, s"round $round: $es")
    }
  }

  test("property: bigram backoff scores equal the local model") {
    import graft.text.CorpusScoring
    for (round <- 1 to 3) {
      val texts = sample(Gen.listOfN(12, doc), 7000L + round)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, "en", t) }.toDF("doc_id", "lang", "text")
      val got = CorpusScoring.bigramScores(docs)
        .select("doc_id", "score").as[(Long, Long)].collect().toMap
      def bucket(i: Long) = ((i % 1000000007L) * 2654435761L % 1000000007L) % 1000L
      val toks = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t.split(" ", -1).toSeq)
      }
      val train = toks.filter { case (i, _) => bucket(i) < CorpusScoring.TrainMills }
      val c1 = train.flatMap(_._2).groupBy(identity).map { case (w, l) => w -> l.size.toLong }
      val n = c1.values.sum
      def bgs(ts: Seq[String]) = ts.zip(ts.drop(1))
      val c2 = train.flatMap(t => bgs(t._2)).groupBy(identity)
        .map { case (p, l) => p -> l.size.toLong }
      val expected = toks.flatMap { case (i, ts) =>
        val bg = bgs(ts)
        if (bg.isEmpty) None
        else {
          val ws = bg.map { case (p, c) =>
            c2.get((p, c)).map(cc => cc * 1000000L / c1(p))
              .orElse(c1.get(c).map(c1c => (c1c * 1000000L / n) / CorpusScoring.BackoffDiv))
              .getOrElse(0L)
          }
          Some(i -> ws.sum / ws.size)
        }
      }.toMap
      assert(got == expected, s"round $round: $texts")
    }
  }

  test("property: spanScrub output is invariant under repartitioning") {
    import graft.pipeline.Scrub
    for (round <- 1 to 3) {
      val texts = sample(Gen.listOfN(14, doc), 93L + round)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, "en", t) }
        .toDF("doc_id", "lang", "text")
      val a = Scrub.spanScrub(docs)
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val b = Scrub.spanScrub(docs.repartition(7))
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(a == b, s"round $round")
      // scrub never grows a doc and never covers more than it has
      assert(a.forall { case (_, _, nt, cov, _) => cov >= 0 && cov <= nt })
    }
  }

  test("property: tokenBudget admissions are invariant under repartitioning") {
    import graft.pipeline.Scrub
    for (round <- 1 to 3) {
      val texts = sample(Gen.listOfN(30, doc), 55L + round)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, s"src${i % 3}", t) }
        .toDF("doc_id", "source", "text")
      def admitted(df: org.apache.spark.sql.DataFrame) =
        Scrub.tokenBudget(df, 40L).filter(col("admitted"))
          .select("doc_id").as[Long].collect().toSet
      assert(admitted(docs) == admitted(docs.repartition(5)), s"round $round")
    }
  }

  test("property: pii redaction round-trip — redacted text never matches either pattern") {
    import graft.pipeline.Scrub
    for (round <- 1 to 3) {
      val texts = sample(Gen.listOfN(20, doc), 77L + round)
      val planted = texts.zipWithIndex.map { case (t, i) =>
        s"$t user$i@host.example x ${1000000 + i * 7919}"
      }
      val out = planted.toDF("text")
        .select(Scrub.redactPii(col("text")).as("r")).as[String].collect()
      assert(out.forall(r =>
        !r.matches(s".*${Scrub.EmailPattern}.*") &&
          !r.matches(s".*${Scrub.NumberPattern}.*")))
    }
  }

  test("property: BPE trainer equals the naive reference on random corpora") {
    import graft.text.{Bpe, NaiveBpe}
    for (round <- 1 to 5) {
      val texts = sample(Gen.listOfN(15, doc), 91L + round)
        .filter(_.nonEmpty)
      val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Bpe.train(spark, docs, 6)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(got == NaiveBpe.merges(words, 6), s"round $round")
    }
  }
}
