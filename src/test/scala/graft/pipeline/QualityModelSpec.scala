package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("perceptron converges: zero training error on the rule label") {
    // indicator features make the AND-of-thresholds label linearly
    // separable, so batch-perceptron training error must reach 0
    val feats = QualityModel.features(docs)
      .filter(Sampling.sampleFilter(col("doc_id"), QualityModel.TrainMills))
    val w = QualityModel.trainWeights(feats)
    val errs = feats
      .filter(col("y") * QualityModel.marginCol(w) <= 0).count()
    assert(errs == 0L, s"training error $errs with w=${w.toSeq}")
  }

  test("weights are partitioning-invariant (summed updates, not SGD)") {
    val feats = QualityModel.features(docs)
    val w1 = QualityModel.trainWeights(feats)
    val w2 = QualityModel.trainWeights(feats.repartition(7, col("doc_id")))
    val w3 = QualityModel.trainWeights(
      feats.orderBy(col("y"), col("doc_id").desc))
    assert(w1.toSeq == w2.toSeq && w1.toSeq == w3.toSeq)
  }

  test("extra epochs after convergence are no-ops") {
    val feats = QualityModel.features(docs)
    val w = QualityModel.trainWeights(feats, QualityModel.Epochs)
    val wMore = QualityModel.trainWeights(feats, QualityModel.Epochs + 5)
    assert(w.toSeq == wMore.toSeq)
  }

  test("distilled model recovers the rule on a hand fixture") {
    // every signal combination present; the learned halfspace must
    // reproduce ok = f1 AND f2 AND f3 on the training points
    val fix = Seq(
      // (nt>=20, wl<=8nt, stopwords ok) -> ok
      (1L, ("the and of is a to in " * 5).trim),            // 35 toks, all stop
      (2L, ("a b c " * 10).trim + " the of and is"),        // ok
      (3L, "short the of"),                                  // too_short
      (4L, ("wordswithoutstops " * 30).trim),                // low_stopword
      (5L, ("the " + "x " * 30).trim),                       // ok-ish mix
    ).toDF("doc_id", "text")
    val feats = QualityModel.features(fix)
    val w = QualityModel.trainWeights(feats, epochs = 50)
    val wrong = feats
      .filter(col("y") * QualityModel.marginCol(w) <= 0).count()
    assert(wrong == 0L, s"fixture not separated, w=${w.toSeq}")
  }

  test("distill output shape: 4 weights + 4 confusion cells") {
    val out = QualityModel.distill(docs).as[(String, Long)].collect().toMap
    assert(out.keySet == Set("w0", "w1", "w2", "w3", "tp", "fp", "fn", "tn"))
    // held-out counts must cover the whole held-out band
    val n = docs
      .filter(!Sampling.sampleFilter(col("doc_id"), QualityModel.TrainMills))
      .count()
    assert(out("tp") + out("fp") + out("fn") + out("tn") == n)
  }
}
