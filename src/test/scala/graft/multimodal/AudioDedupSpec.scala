package graft.multimodal

import graft.SparkSpec
import graft.functions.AudioHash
import org.apache.spark.sql.functions._

/** Golden + property coverage for the perceptual audio dedup family
  * (sibling of ImageDedupSpec): kernel vs reference, codegen parity,
  * gain-invariance + dither robustness, banded-vs-brute equality. */
class AudioDedupSpec extends SparkSpec {

  import spark.implicits._

  /** Independent reference formulation (collect-then-compare; the
    * kernel walks with a running prev). */
  private def hashRef(s: Array[Short]): Long = {
    val n = s.length
    val es = (0 until 57).map { k =>
      val p = (k.toLong * n / 57).toInt
      (0 until AudioHash.Window).map(i => math.abs(s(p + i).toLong)).sum
    }
    (0 until 56).map(k => if (es(k + 1) > es(k)) 1L << k else 0L).sum
  }

  test("audio hash kernel: reference parity, positivity, gain invariance") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val n = 228 + rnd.nextInt(4000)
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val fp = AudioHash.energyHash56(s)
      assert(fp == hashRef(s))
      assert(fp >= 0L && fp < (1L << 56))
      // uniform positive gain leaves every gradient comparison
      // unchanged (attenuate first so x2/x4 can't overflow PCM16)
      val safe = s.map(v => (v / 4).toShort)
      assert(AudioHash.energyHash56(safe.map(v => (v * 2).toShort)) ==
        AudioHash.energyHash56(safe.map(v => (v * 4).toShort)),
        "uniform positive gain must not change the fingerprint")
    }
    // too-short clips are rejected, not silently mis-hashed
    intercept[IllegalArgumentException] {
      AudioHash.energyHash56(Array.fill(100)(1.toShort))
    }
  }

  test("AudioHashExpr: codegen result equals the kernel on decoded PCM") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(90)
    val audio = Multimodal.asAudioTable(docs)
    val viaExpr = Multimodal.audioFingerprints(audio)
      .select("media_id", "fp").as[(Long, Long)].collect().toMap
    val direct = Multimodal.decodePcm(audio).collect()
      .map(r => r.media_id -> AudioHash.energyHash56(r.samples)).toMap
    assert(viaExpr == direct && viaExpr.size == 90)
  }

  test("perceptual robustness: comb-dithered copy is near, unrelated streams are far") {
    val rnd = new scala.util.Random(7)
    // a byte-derived stream like the fixture's: values in PCM16 step-256
    val bytes = Array.fill(1000)(rnd.nextInt(95) + 32)
    val s = Array.tabulate(2500)(i => ((bytes(i % 1000) - 128) << 8).toShort)
    val dither = Array.tabulate(2500) { i =>
      val b = if ((i % 1000) % 5 == 0) bytes(i % 1000) + 8 else bytes(i % 1000)
      ((b - 128) << 8).toShort
    }
    val other = Array.tabulate(2500)(_ =>
      ((rnd.nextInt(95) + 32 - 128) << 8).toShort)
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val fb = AudioHash.energyHash56(s)
    assert(hd(fb, AudioHash.energyHash56(dither)) <= 7,
      "sparse dither must stay within the radius")
    assert(hd(fb, AudioHash.energyHash56(other)) > 7,
      "an unrelated stream must not pair")
  }

  test("audioNearDupPairs: banded join vs brute force on a 120-doc corpus; variants found") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    val audio = Multimodal.asAudioTableWithVariants(docs, every = 10)
    val fps = Multimodal.audioFingerprints(audio)
      .select("media_id", "fp").as[(Long, Long)].collect()
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 7
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
    val banded = Multimodal.audioNearDupPairs(audio, maxHamming = 7,
        materialize = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture must plant at least some variant pairs")
  }
}
