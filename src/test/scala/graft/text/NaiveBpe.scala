package graft.text

/** Naive in-memory BPE (symbol lists, no string tricks) — the
  * independent reference the distributed trainer is checked against
  * in BpeSpec and PropertySpec. */
object NaiveBpe {
  def merges(words: Map[String, Long], m: Int)
      : Seq[(Int, String, String, Long)] = {
    var w: Map[Vector[String], Long] =
      words.map { case (k, c) => (k.map(_.toString).toVector :+ "_", c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var stop = false
    for (e <- 1 to m if !stop) {
      val pc = w.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => (p, c))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), c) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((e, l, r, c))
        w = apply(w, l, r)
      }
    }
    out.result()
  }

  def apply(w: Map[Vector[String], Long], l: String, r: String)
      : Map[Vector[String], Long] =
    w.map { case (syms, cnt) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += l + r; i += 2
        } else { b += syms(i); i += 1 }
      }
      (b.result(), cnt)
    }.groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
}
