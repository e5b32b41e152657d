package graft.sim

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("int8 stats match a plain-Scala reference quantizer, zero vector included") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f), 0),
      (2L, Array(0.001f, 0.002f, -0.003f, 0.0015f), 0),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f), 1), // zero vector -> zero codes
      (4L, Array(-0.7f, 0.7f, 0.7f, -0.7f), 1))
    val got = Quantize.int8Stats(vecs.toDF("vec_id", "embedding", "label"))
      .select("label", "n_vecs", "sum_scale", "sum_codes", "sum_err")
      .as[(Int, Long, Long, Long, Long)].collect().toSet

    def ref(v: Array[Float]): (Long, Long, Long) = {
      val xq = v.map(x => math.round(x.toDouble * 1000000))
      val scale = if (xq.isEmpty) 0L else xq.map(math.abs).max
      val qs = xq.map { x =>
        if (scale == 0) 0L
        else math.signum(x) * ((math.abs(x) * 254 + scale) / (2 * scale))
      }
      val err = xq.zip(qs).map { case (x, q) => math.abs(x * 127 - q * scale) }.sum
      (scale, qs.sum, err)
    }
    val expect = vecs.groupBy(_._3).map { case (label, rows) =>
      val stats = rows.map(r => ref(r._2))
      (label, rows.size.toLong, stats.map(_._1).sum, stats.map(_._2).sum,
        stats.map(_._3).sum)
    }.toSet
    assert(got == expect)
    // codes really land in [-127, 127]: max-magnitude element maps to ±127
    val (s1, _, _) = ref(Array(0.5f, -1.0f, 0.25f, 0.0f))
    assert(s1 == 1000000L)
  }
}
