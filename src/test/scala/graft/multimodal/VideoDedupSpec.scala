package graft.multimodal

import graft.SparkSpec
import graft.functions.ImageHash
import org.apache.spark.sql.functions._

/** Frame-fingerprint video dedup (sibling of Image/AudioDedupSpec):
  * rolled-kernel semantics, trimmed-clip e2e, shared-bumper hot-cap. */
class VideoDedupSpec extends SparkSpec {

  import spark.implicits._

  test("rolled dHash kernel: roll 0 is the still hash; roll wraps mod w*h; frames differ") {
    val rnd = new scala.util.Random(11)
    val w = 24; val h = 16
    val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
    assert(ImageHash.dhash56(rgb, w, h, 0) == ImageHash.dhash56(rgb, w, h))
    assert(ImageHash.dhash56(rgb, w, h, w * h) == ImageHash.dhash56(rgb, w, h))
    assert(ImageHash.dhash56(rgb, w, h, 7 + w * h) ==
      ImageHash.dhash56(rgb, w, h, 7))
    // distinct frames of a random raster hash differently
    assert(ImageHash.dhash56(rgb, w, h, 10) != ImageHash.dhash56(rgb, w, h, 20))
  }

  test("videoNearDupPairs e2e: trimmed clip pairs with its source; unrelated videos don't") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.asMediaTable(docs.limit(40))
    val full = Multimodal.videoFrameFingerprints(media, stride = 10, firstFrame = 0)
    val trimmed = Multimodal.videoFrameFingerprints(
      media.filter(col("media_id") % 4 === 0)
        .withColumn("media_id", col("media_id") + 1000L),
      stride = 10, firstFrame = 10)
    val pairs = Multimodal.videoNearDupPairs(full.unionByName(trimmed),
        0.5, materialize = true)
      .select("ma", "mb").as[(Long, Long)].collect().toSet
    // every trimmed clip with >= 2 surviving frames pairs with its
    // source ((m-1)/m >= 1/2); sources with n_frames <= 10 yield an
    // empty trim and legitimately no pair
    val expected = Multimodal.decodeRaster(
        media.filter(col("media_id") % 4 === 0)).collect()
      .filter(r => (r.width * r.height) % 241 + 8 > 10)
      .map(r => (r.media_id, r.media_id + 1000L)).toSet
    assert(expected.nonEmpty && expected.subsetOf(pairs),
      s"missing trim pairs: ${expected -- pairs}")
    // nothing pairs across unrelated sources
    val cross = pairs.filter { case (a, b) => (b - a) != 1000L }
    assert(cross.isEmpty, s"unrelated videos must not pair: $cross")
  }

  test("hotFpCap: a shared bumper frame stops generating candidates; true pairs keep exact counts") {
    // 50 unrelated videos all share ONE bumper fingerprint (the
    // station logo): uncapped, the bumper alone candidates C(50,2)
    // pairs (all failing verify); capped, it generates nothing, while
    // a genuine near-pair (sharing most frames) still pairs with its
    // full common count — verification reads the complete sets.
    val bumper = 0x123456789ABCDL
    val videos = (1L to 50L).flatMap { v =>
      Seq((v, bumper)) ++ (1 to 5).map(f => (v, v * 1000 + f))
    } ++ Seq((900L, 990001L), (900L, 990002L), (900L, 990003L), (900L, bumper),
      (901L, 990001L), (901L, 990002L), (901L, 990003L), (901L, bumper))
    val frames = videos.toDF("media_id", "fp")
    val capped = Multimodal.videoNearDupPairs(frames, 0.5, hotFpCap = Some(20))
      .select("ma", "mb", "common").as[(Long, Long, Long)].collect().toSeq
    // common = 4 (three real frames + the bumper): the cap only
    // restricts candidate GENERATION, not the verify arithmetic
    assert(capped == Seq((900L, 901L, 4L)), s"got $capped")
  }
}
