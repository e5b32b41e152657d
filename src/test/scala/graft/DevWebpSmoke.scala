package graft

/** Dev-only WebP round-trip smoke across bands and dims. */
object DevWebpSmoke {
  def main(args: Array[String]): Unit = {
    import graft.multimodal.{MediaCodec, WebpCodec}
    var seed = 42L
    def nextByte(): Byte = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
    var fails = 0
    for {
      (w, h) <- Seq((1, 1), (3, 2), (8, 8), (17, 5), (16, 16), (33, 31), (64, 51))
      band <- 0 to 3
      variant <- 0 to 1
    } {
      val gray = Array.fill(w * h)(
        if (variant == 0) nextByte()
        else ((nextByte() & 0x03) * 37).toByte) // few distinct: bundling leg
      try {
        val payload = WebpCodec.encodeWebp(w, h, gray, band)
        val img = WebpCodec.decode(payload)
        val got = Array.tabulate(w * h)(i => img.rgb(i * 3))
        val gGot = Array.tabulate(w * h)(i => img.rgb(i * 3 + 1))
        val bGot = Array.tabulate(w * h)(i => img.rgb(i * 3 + 2))
        if (img.width != w || img.height != h) {
          println(s"FAIL dims $w x $h band $band v$variant: ${img.width}x${img.height}"); fails += 1
        } else if (!got.sameElements(gray) || !gGot.sameElements(gray) || !bGot.sameElements(gray)) {
          val badIdx = got.indices.find(i => got(i) != gray(i) || gGot(i) != gray(i) || bGot(i) != gray(i)).get
          println(s"FAIL pixels $w x $h band $band v$variant at $badIdx: " +
            s"want ${gray(badIdx) & 0xff} got r=${got(badIdx) & 0xff} g=${gGot(badIdx) & 0xff} b=${bGot(badIdx) & 0xff}")
          fails += 1
        } else println(s"ok $w x $h band $band v$variant (${payload.length} bytes)")
      } catch {
        case e: Throwable =>
          println(s"FAIL $w x $h band $band v$variant: ${e.getClass.getSimpleName}: ${e.getMessage}")
          fails += 1
      }
    }
    println(if (fails == 0) "ALL OK" else s"$fails FAILURES")
  }
}
