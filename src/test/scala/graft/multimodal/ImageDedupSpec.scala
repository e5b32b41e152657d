package graft.multimodal

import graft.SparkSpec
import graft.functions.ImageHash
import org.apache.spark.sql.functions._

/** Golden + property coverage for the perceptual image dedup family
  * (VERDICT r10 #2): dHash kernel vs a straight-line reference, the
  * codegen'd expression vs the kernel, perturbed-copy robustness, and
  * the end-to-end pair operator on a planted fixture. */
class ImageDedupSpec extends SparkSpec {

  import spark.implicits._

  /** Independent reference formulation of the 56-bit dHash (sample
    * first, compare second — different loop shape than the kernel's
    * running-prev walk, same definition). */
  private def dhashRef(rgb: Array[Byte], w: Int, h: Int): Long = {
    def luma(x: Int, y: Int): Int = {
      val s = 3 * (y * w + x)
      (rgb(s) & 0xff) + (rgb(s + 1) & 0xff) + (rgb(s + 2) & 0xff)
    }
    (0 until 8).map { j =>
      val y = j * h / 8
      val ls = (0 until 8).map(i => luma(i * w / 8, y))
      (0 until 7).map(i => if (ls(i + 1) > ls(i)) 1L << (j * 7 + i) else 0L).sum
    }.sum
  }

  private def gradientRamp(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => (((i / 3) % w) * 4 % 251).toByte)

  test("dHash kernel: golden values, reference parity, 56-bit positivity") {
    // monotone horizontal ramp: every gradient is up where the ramp
    // rises -> alternating structure known from the ramp period
    val w = 16; val h = 16
    val ramp = gradientRamp(w, h)
    val fp = ImageHash.dhash56(ramp, w, h)
    assert(fp == dhashRef(ramp, w, h))
    assert(fp >= 0L && fp < (1L << 56), s"fp must use low 56 bits only: $fp")
    // constant image: no strict gradient anywhere -> fp 0
    assert(ImageHash.dhash56(Array.fill(w * h * 3)(77.toByte), w, h) == 0L)
    // reference parity on 50 pseudo-random rasters of varied dims
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val rw = 8 + rnd.nextInt(57); val rh = 8 + rnd.nextInt(43)
      val rgb = Array.fill(rw * rh * 3)(rnd.nextInt(256).toByte)
      assert(ImageHash.dhash56(rgb, rw, rh) == dhashRef(rgb, rw, rh))
    }
  }

  test("DHashExpr: codegen result equals the kernel on decoded media rasters") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(90)
    val viaExpr = Multimodal.imageFingerprints(Multimodal.asMediaTable(docs))
      .select("media_id", "fp").as[(Long, Long)].collect().toMap
    val direct = Multimodal.decodeRaster(Multimodal.asMediaTable(docs))
      .collect()
      .map(r => r.media_id -> ImageHash.dhash56(r.rgb, r.width, r.height))
      .toMap
    assert(viaExpr == direct && viaExpr.size == 90)
    assert(viaExpr.values.forall(fp => fp >= 0L && fp < (1L << 56)))
  }

  test("perceptual robustness: dither-perturbed copy is near, unrelated images are far") {
    val w = 32; val h = 24
    val rnd = new scala.util.Random(7)
    val base = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
    // the variant-leg perturbation: +8 on every 5th byte
    val dither = Array.tabulate(base.length)(i =>
      if (i % 5 == 0) ((base(i) + 8) & 0xff).toByte else base(i))
    val other = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val fb = ImageHash.dhash56(base, w, h)
    assert(hd(fb, ImageHash.dhash56(dither, w, h)) <= 7,
      "dither must stay within the radius")
    assert(hd(fb, ImageHash.dhash56(other, w, h)) > 7,
      "an unrelated raster must not pair")
  }

  test("imageNearDupPairs e2e: planted perturbed copy found, exact dup at 0, unrelated absent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val texts = docs.orderBy("doc_id").limit(3)
      .select("text").as[String].collect()
    // 1,2,3 distinct docs; 10 = exact re-encode of 1 (10 % 3 == 1 % 3,
    // so the SAME container format -> identical raster -> hamming 0);
    // ids 1,2,3 cover all three formats (id % 3)
    val media = Seq(
      (1L, texts(0)), (2L, texts(1)), (3L, texts(2)), (10L, texts(0)))
      .toDF("doc_id", "text")
    val mediaAll = Multimodal.asMediaTableWithVariants(media, every = 1,
      idOffset = 100L)
    val pairs = Multimodal.imageNearDupPairs(mediaAll, maxHamming = 7,
        materialize = true)
      .select("ma", "mb", "hamming").as[(Long, Long, Long)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // every doc pairs with its own perturbed variant (id + 100)
    Seq(1L, 2L, 3L, 10L).foreach { id =>
      assert(pairSet.contains((id, id + 100L)),
        s"missing variant pair for $id in ${pairSet.toSeq.sorted}")
    }
    // the exact text dup pairs at hamming 0 (same bytes -> same raster)
    assert(pairs.collect { case (1L, 10L, hd) => hd }.headOption.contains(0L))
    // unrelated docs never pair
    assert(!pairSet.contains((1L, 2L)) && !pairSet.contains((2L, 3L)) &&
      !pairSet.contains((1L, 3L)))
  }

  test("banded join vs brute force: identical pair set on a 120-doc corpus (pigeonhole losslessness)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    val media = Multimodal.asMediaTableWithVariants(docs, every = 10)
    val fps = Multimodal.imageFingerprints(media)
      .select("media_id", "fp").as[(Long, Long)].collect()
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 7
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
    val banded = Multimodal.imageNearDupPairs(media, maxHamming = 7,
        materialize = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture must plant at least the variant pairs")
  }

  test("hot-bucket guard: a boilerplate fingerprint flood stops generating candidates; healthy pairs survive") {
    // the fingerprint-family twin of the LSH bucket cap: 300 copies of
    // one fingerprint flood every band bucket (C(300,2) candidates per
    // band uncapped); with the cap they generate nothing, while a
    // planted near-pair in healthy buckets still comes through
    import graft.dedup.Dedup
    val flood = (1L to 300L).map(i => (i, 0x00FA12345678L))
    val near = Seq((901L, 0x55AA55AA55AA55L & ((1L << 56) - 1)),
      (902L, (0x55AA55AA55AA55L ^ 3L) & ((1L << 56) - 1))) // hamming 2
    val fps = (flood ++ near).toDF("media_id", "fp")
    val capped = Dedup.bandedHammingPairs(fps, "media_id", "fp", 56, 7,
      bucketCap = Some(64)).as[(Long, Long, Long)].collect()
    assert(capped.toSeq == Seq((901L, 902L, 2L)),
      s"flood must be diverted, planted pair kept: ${capped.toSeq}")
    // uncapped, the flood pairs quadratically (sanity of the premise)
    val uncapped = Dedup.bandedHammingPairs(fps, "media_id", "fp", 56, 7)
      .count()
    assert(uncapped == 300L * 299 / 2 + 1)
    // the monitor sees the flood: every band's hottest bucket is 300
    val occ = Dedup.hammingBandOccupancy(fps, "fp", 56, 7)
      .select("band_idx", "max_bucket").as[(Int, Long)].collect().toMap
    assert(occ.size == 8 && occ.values.forall(_ == 300L))
  }
}
