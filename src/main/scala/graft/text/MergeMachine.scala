package graft.text

import scala.collection.mutable

/** Shared driver-local merge-trainer machinery for the [[Bpe]] and
  * [[Wordpiece]] production trainers (ADVICE r14 #4 — the ~80-line
  * decrement/rewrite/re-add loop was duplicated verbatim and a fix to
  * one twin could silently miss the other): the reserved-character
  * precondition, symbol interning (pair keys pack to a single Long in
  * a LongMap — no allocation in the hot loop), per-word int-array
  * segmentation with the `_` end-of-word marker, the live pair-count
  * map, the pair→words index, and [[applyMerge]]'s
  * decrement → left-to-right non-overlapping rewrite → re-add pass.
  *
  * The ARGMAX STRATEGY stays with each caller — a lazy-deletion
  * max-heap for BPE's frequency objective (stale entries only ever go
  * stale downward), a full vocab-bounded scan for WordPiece (a merge
  * drifts the DENOMINATORS of every pair sharing a symbol, so cached
  * heap entries can go stale upward) — hooked in via [[applyMerge]]'s
  * `onPair` (pair count changed: BPE re-enqueues) and
  * `onWordRewrite` (word segmentation changed: WordPiece re-folds its
  * symbol counts) callbacks.
  */
private[text] final class MergeMachine(vocab: Seq[(String, Long)],
    segmenter: String => Array[String] = MergeMachine.codePointSegmenter) {
  val toks: Array[String] = vocab.iterator.map(_._1).toArray
  val cnts: Array[Long] = vocab.iterator.map(_._2).toArray

  // enforce the module precondition HERE, loudly (review r14 #3):
  // the local trainers segment code points correctly even for the
  // three reserved characters, but the distributed twins' paren
  // encoding (and the oracle CTEs that mirror it) garbles them —
  // accepting such a vocabulary would let the paths silently diverge
  // instead of failing the documented contract. Cheap: the
  // vocabulary is already driver-local. A CUSTOM segmenter (r16: the
  // byte-fallback leg) lifts the precondition — its symbols are its
  // own alphabet (e.g. `b63`), never raw token characters, so the
  // paren encoding stays unambiguous for ANY input text.
  if (segmenter eq MergeMachine.codePointSegmenter) toks.foreach { t =>
    require(t.indexOf('(') < 0 && t.indexOf(')') < 0 && t.indexOf('_') < 0,
      s"token '$t' contains a reserved character ( ) _ — " +
        "strip/escape in normalization first (Bpe module precondition)")
  }

  private val symbolArr = mutable.ArrayBuffer.empty[String]
  private val symId = mutable.HashMap.empty[String, Int]

  def symbol(i: Int): String = symbolArr(i)
  def intern(s: String): Int =
    symId.getOrElseUpdate(s, { symbolArr += s; symbolArr.length - 1 })

  def key(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xffffffffL)
  def left(p: Long): Int = (p >>> 32).toInt
  def right(p: Long): Int = p.toInt

  /** Code-point order of two interned symbols — the collation BOTH
    * engines' distributed argmax actually uses (Spark UTF8String and
    * DuckDB compare UTF-8 bytes, whose unsigned order IS code-point
    * order). ADVICE r14 #2: `String.compareTo` is UTF-16 CODE-UNIT
    * order, which misorders supplementary-plane symbols (a surrogate
    * 0xD800+ sorts above U+E000..U+FFFF), so ties on non-ASCII
    * corpora could silently diverge from the distributed twins. */
  def symCompare(a: Int, b: Int): Int =
    MergeMachine.cpCompare(symbolArr(a), symbolArr(b))

  // initial segmentation: the segmenter's symbols + the `_` end
  // marker (default: one symbol per code point, matching the
  // `(?s)(.)` split of Bpe.wordFrame)
  val words: Array[Array[Int]] = toks.map { t =>
    val syms = segmenter(t)
    val a = new Array[Int](syms.length + 1)
    var i = 0
    while (i < syms.length) { a(i) = intern(syms(i)); i += 1 }
    a(syms.length) = intern("_")
    a
  }

  /** Live adjacent-pair corpus counts, maintained by [[applyMerge]]. */
  val pairCount: mutable.LongMap[Long] = mutable.LongMap.empty[Long]

  /** pair → containing-word index: a lazy SUPERSET of the live
    * containers (members are never removed on rewrite — applyMerge
    * re-verifies each). */
  val pairWords: mutable.LongMap[mutable.HashSet[Int]] =
    mutable.LongMap.empty[mutable.HashSet[Int]]

  {
    var wi = 0
    while (wi < words.length) {
      val s = words(wi); val c = cnts(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = key(s(i), s(i + 1))
        pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += wi
        i += 1
      }
      wi += 1
    }
  }

  /** Apply merge (l,r)→lr to every indexed word that still contains
    * the pair: per affected word, decrement the old adjacent pairs,
    * rewrite left-to-right non-overlapping (the `(l)(r)`→`(lr)`
    * string-replace order of the distributed twins), then re-add the
    * new adjacent pairs and their index entries. `onPair(pairKey,
    * newCount)` fires after every SURVIVING count change (a count
    * that hits zero is removed silently, matching the BPE heap's
    * contract); `onWordRewrite(oldSyms, newSyms, c0)` fires once per
    * rewritten word. */
  def applyMerge(l: Int, r: Int, lr: Int,
      onPair: (Long, Long) => Unit,
      onWordRewrite: (Array[Int], Array[Int], Long) => Unit): Unit = {
    val affected = pairWords.remove(key(l, r))
      .getOrElse(mutable.HashSet.empty[Int])
    affected.foreach { w =>
      val s = words(w)
      var has = false
      var i = 0
      while (!has && i + 1 < s.length) {
        if (s(i) == l && s(i + 1) == r) has = true
        i += 1
      }
      if (has) {
        val c0 = cnts(w)
        i = 0
        while (i + 1 < s.length) {
          val p = key(s(i), s(i + 1))
          val n = pairCount(p) - c0
          if (n <= 0L) pairCount.remove(p)
          else { pairCount.update(p, n); onPair(p, n) }
          i += 1
        }
        val b = new Array[Int](s.length)
        var o = 0
        i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
            b(o) = lr; o += 1; i += 2
          } else { b(o) = s(i); o += 1; i += 1 }
        }
        val ns = java.util.Arrays.copyOf(b, o)
        words(w) = ns
        i = 0
        while (i + 1 < ns.length) {
          val p = key(ns(i), ns(i + 1))
          val n = pairCount.getOrElse(p, 0L) + c0
          pairCount.update(p, n)
          pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += w
          onPair(p, n)
          i += 1
        }
        onWordRewrite(s, ns, c0)
      }
    }
  }

  /** The final per-word segmentation (tok, symbols, cnt). */
  def segmentation: Array[(String, Array[String], Long)] =
    Array.tabulate(toks.length)(i =>
      (toks(i), words(i).map(symbolArr(_)), cnts(i)))
}

private[text] object MergeMachine {
  /** The default initial segmentation: one symbol per code point. */
  val codePointSegmenter: String => Array[String] = t =>
    t.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Byte-fallback segmentation (r16, the GPT-2-lineage leg): one
    * symbol per UTF-8 BYTE, spelled `b` + two lowercase hex digits —
    * a 256-symbol alphabet that segments ANY input (no OOV), in a
    * spelling both engines synthesize (`hex(encode(tok))`). */
  val byteSegmenter: String => Array[String] = t =>
    t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"b${b & 0xff}%02x")

  /** Lexicographic CODE-POINT comparison — equals unsigned UTF-8 byte
    * order, the collation of Spark's UTF8String and DuckDB VARCHAR. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}
