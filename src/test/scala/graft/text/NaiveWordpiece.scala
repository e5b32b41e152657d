package graft.text

/** Naive in-memory WordPiece trainer (symbol lists, recompute
  * everything per epoch, BigInt score arithmetic) — the independent
  * reference [[Wordpiece]]'s distributed and local trainers are
  * checked against in WordpieceSpec. */
object NaiveWordpiece {
  private val Scale = BigInt(Wordpiece.Scale)

  def merges(words: Map[String, Long], m: Int)
      : Seq[(Int, String, String, Long)] = {
    var w: Map[Vector[String], Long] =
      words.map { case (k, c) => (k.map(_.toString).toVector :+ "_", c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var stop = false
    for (e <- 1 to m if !stop) {
      val sc = w.toSeq.flatMap { case (syms, c) => syms.map((_, c)) }
        .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
      val pc = w.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (pc.isEmpty) stop = true
      else {
        val scored = pc.map { case ((l, r), c) =>
          ((l, r), (BigInt(c) * Scale / (BigInt(sc(l)) * BigInt(sc(r)))).toLong)
        }
        val ((l, r), s) = scored.minBy { case ((l, r), s) => (-s, l, r) }
        out += ((e, l, r, s))
        w = NaiveBpe.apply(w, l, r)
      }
    }
    out.result()
  }
}
