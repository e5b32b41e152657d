package graft.multimodal

/** Tiny pure-JVM audio codec: canonical RIFF/WAVE, 16-bit PCM mono.
  * Real container bytes — little-endian chunk headers, a proper
  * chunk WALK on decode (fmt/data located by id, unknown chunks
  * skipped per the RIFF spec) — so the batched audio-decode operator
  * parses genuine WAV files, not a length heuristic. Like
  * [[MediaCodec]], the fixture CONTENT is synthetic (samples are the
  * document's bytes recentred to PCM16, duration derives from text
  * length so the SQL oracle can replicate the decoded metadata
  * arithmetically), but the decoder has no knowledge of that.
  */
object AudioCodec {

  /** Fixture stream params from text length (oracle-replicable):
    * 500..4499 samples; rate cycles 8/16/44.1 kHz by doc id. */
  def fixtureSamples(textLen: Int): Int = 500 + (textLen * 17) % 4000
  val Rates: Array[Int] = Array(8000, 16000, 44100)

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate
    le16(32, 2)              // block align
    le16(34, 16)             // bits/sample
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = samples(i).toByte
      out(44 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  final case class Audio(sampleRate: Int, samples: Array[Short]) {
    def nSamples: Int = samples.length
    /** integer milliseconds, floor — oracle-exact */
    def durationMs: Long = samples.length.toLong * 1000L / sampleRate
  }

  /** Walks the RIFF chunk list (fmt / data by id, anything else
    * skipped with its declared size — the part naive parsers get
    * wrong); only 16-bit mono PCM is accepted. */
  def decodeWav(p: Array[Byte]): Audio = {
    def le32(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    require(p.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var rate = -1
    var samples: Array[Short] = null
    while (off + 8 <= p.length && (rate < 0 || samples == null)) {
      val id = tag(off); val sz = le32(off + 4)
      // a corrupt size with the sign bit set would SHRINK the bound
      // check below and then blow up in Array allocation — reject it
      require(sz >= 0, s"negative '$id' chunk size $sz")
      require(off + 8 + sz <= p.length, s"truncated '$id' chunk")
      id match {
        case "fmt " =>
          require(le16(off + 8) == 1, "only PCM supported")
          require(le16(off + 10) == 1, "only mono supported")
          require(le16(off + 8 + 14) == 16, "only 16-bit supported")
          rate = le32(off + 12)
        case "data" =>
          val n = sz / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((p(off + 8 + 2 * i) & 0xff) |
              (p(off + 8 + 2 * i + 1) << 8)).toShort
            i += 1
          }
        case _ => () // skip unknown chunk (LIST, fact, ...)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(rate > 0 && samples != null, "missing fmt or data chunk")
    Audio(rate, samples)
  }

  /** Encode a document as a deterministic real WAV: samples are the
    * doc's bytes recentred to PCM16 ((b-128)<<8), cycled to the
    * fixture length; rate cycles by doc id. */
  def encodeDoc(docId: Long, text: Array[Byte]): Array[Byte] = {
    val n = fixtureSamples(text.length)
    val rate = Rates(((docId % 3) + 3).toInt % 3)
    val samples = Array.tabulate(n) { i =>
      val b = if (text.isEmpty) 0 else text(i % text.length) & 0xff
      ((b - 128) << 8).toShort
    }
    encodeWav(rate, samples)
  }

  def open(): AudioCodec.type = this // batched-UDF lifecycle (see MediaCodec)
  def close(): Unit = ()
}
