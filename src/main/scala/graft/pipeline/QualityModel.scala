package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Trained quality-classifier distillation: fit a linear model over
  * bucketized quality signals to an existing labeling (here the
  * hand-written q_quality_filter rule) and serve it corpus-wide —
  * the fastText-classifier shape modern pipelines use to scale a
  * seed labeling (human or LLM judgments on a sample) to the full
  * corpus.
  *
  * The trainer is a BATCH (synchronous) perceptron, chosen because it
  * is exactly replayable: per epoch, every currently-misclassified
  * row (margin y·(w·x) ≤ 0) contributes y·x to one summed update, so
  * the trajectory is integer arithmetic whose partial sums are
  * order-independent — the DuckDB oracle unrolls the epochs as CTEs
  * and lands on bit-identical weights. (Per-row SGD would depend on
  * row order, which no distributed engine should promise.) Features
  * are 0/1 signal indicators (the standard bucketization), which
  * makes the rule label linearly separable — an AND of thresholds is
  * a halfspace over its own indicators — so the perceptron
  * convergence theorem applies: training error reaches 0 and further
  * epochs are no-op updates (measured: convergence at epoch 15 on the
  * 500-doc fixture, epoch 12 at sf0.1; [[Epochs]] = 20 covers both,
  * and a not-yet-converged corpus still yields bit-identical
  * weights because the oracle replays the same truncated
  * trajectory). |w_j| ≤ epochs·N, so margins stay far inside 2^63 at
  * any corpus size.
  *
  * 100 TB posture: one narrow projection builds the per-row feature
  * frame (label + 4 small longs ≈ 40 B/row, cached for the epoch
  * loop); each epoch is ONE ungrouped filtered aggregate (map-side
  * partial sums → dim+1 longs on the driver — the kMeansCentroids
  * bounded-model pattern) and the loop exits early at convergence.
  * Serving is a per-row expression with the weights inlined as
  * literals. No shuffle anywhere — the model is the only thing that
  * moves.
  */
object QualityModel {

  val Epochs = 20

  /** Train id-band in mills (the band Sampling.splitLabel calls
    * 'train'); the rest is the held-out eval band. */
  val TrainMills = 800

  /** The q_quality_filter rule thresholds — shared constants
    * ([[TextFunctions.QualityMinTokens]] family), so retuning the
    * filter automatically retunes the distillation label. */
  private val MinT = TextFunctions.QualityMinTokens
  private val MaxWl = TextFunctions.QualityMaxAvgWordLen
  private val StopD = TextFunctions.QualityStopwordDen

  /** Per-doc label + indicator features:
    * (doc_id, y, f0, f1, f2, f3) with y ∈ {+1, -1} from the
    * q_quality_filter "ok" verdict and f1/f2/f3 the rule's own
    * bucketized signals (length ok, word-length ok, stopword ok) —
    * what's learned is their combination. */
  def features(docs: DataFrame): DataFrame = {
    val nt = TextFunctions.nTokens(col("text")).cast("long")
    docs
      .select(col("doc_id"), nt.as("nt"),
        (length(col("text")) - nt + lit(1)).cast("long").as("wl"),
        size(filter(TextFunctions.tokens(col("text")),
          w => w.isin(TextFunctions.Stopwords: _*))).cast("long").as("ns"))
      .select(col("doc_id"),
        when(col("nt") >= MinT && col("wl") <= col("nt") * MaxWl &&
          col("ns") * StopD >= col("nt"), 1L).otherwise(-1L).as("y"),
        lit(1L).as("f0"),
        when(col("nt") >= MinT, 1L).otherwise(0L).as("f1"),
        when(col("wl") <= col("nt") * MaxWl, 1L).otherwise(0L).as("f2"),
        when(col("ns") * StopD >= col("nt"), 1L).otherwise(0L).as("f3"))
  }

  /** w·x as a Column with the trained weights inlined as literals. */
  def marginCol(w: Array[Long]): Column =
    lit(w(0)) * col("f0") + lit(w(1)) * col("f1") +
      lit(w(2)) * col("f2") + lit(w(3)) * col("f3")

  /** Batch-perceptron training on `feats` (features() output):
    * returns the weight vector after at most `epochs` synchronous
    * updates, stopping early once no row is misclassified (the
    * remaining unrolled-oracle epochs are zero updates). Each epoch
    * is one filtered ungrouped aggregate — a bounded (dim+1 longs)
    * driver collect per epoch. */
  def trainWeights(feats: DataFrame, epochs: Int = Epochs): Array[Long] = {
    var w = Array.fill(4)(0L)
    var converged = false
    for (_ <- 1 to epochs if !converged) {
      val d = feats.filter(col("y") * marginCol(w) <= 0)
        .agg(count(lit(1)),
          sum(col("y") * col("f0")), sum(col("y") * col("f1")),
          sum(col("y") * col("f2")), sum(col("y") * col("f3")))
        .head()
      if (d.getLong(0) == 0L) converged = true
      else w = w.indices.map(i => w(i) + d.getLong(i + 1)).toArray
    }
    w
  }

  /** The full distillation audit: train on the 80% id-band, output
    * the final weights plus the held-out confusion matrix
    * (pred = +1 iff w·x > 0) as a compact (item, value) frame. */
  def distill(docs: DataFrame, epochs: Int = Epochs): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val feats = features(docs).persist(MEMORY_AND_DISK)
    val inTrain = Sampling.sampleFilter(col("doc_id"), TrainMills)
    val w = trainWeights(feats.filter(inTrain), epochs)
    val pred = when(marginCol(w) > 0, 1L).otherwise(-1L)
    val conf = feats.filter(!inTrain)
      .select(col("y"), pred.as("pred"))
      .select(
        sum(when(col("y") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === -1 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1 && col("pred") === -1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("y") === -1 && col("pred") === -1, 1L).otherwise(0L)).as("tn"))
    import spark.implicits._
    val wDf = w.indices.map(i => (s"w$i", w(i))).toDF("item", "value")
    val confDf = conf.select(explode(map(
      lit("tp"), col("tp"), lit("fp"), col("fp"),
      lit("fn"), col("fn"), lit("tn"), col("tn"))).as(Seq("item", "value")))
    graft.api.Materialize.releasing(wDf.unionByName(confDf), Seq(feats))
  }

  /** SQL twin of [[distill]]: unrolled epoch CTEs ending in a
    * (item, value) result. Converged epochs sum over an empty
    * misclassified set → +0 updates, replaying Spark's early stop. */
  def sqlDistill(epochs: Int = Epochs): String = {
    val trainBand = Sampling.sqlIdBucket("doc_id", 1000)
    val featsCte =
      s"""raw AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
             CAST(length(text) - len(string_split(text, ' ')) + 1 AS BIGINT) AS wl,
             CAST(${TextFunctions.sqlLangScore("text", TextFunctions.Stopwords)}
               AS BIGINT) AS ns
           FROM documents),
         f AS (SELECT doc_id,
             CASE WHEN nt >= $MinT AND wl <= nt * $MaxWl AND ns * $StopD >= nt
               THEN 1 ELSE -1 END AS y,
             CAST(1 AS BIGINT) AS f0,
             CASE WHEN nt >= $MinT THEN 1 ELSE 0 END AS f1,
             CASE WHEN wl <= nt * $MaxWl THEN 1 ELSE 0 END AS f2,
             CASE WHEN ns * $StopD >= nt THEN 1 ELSE 0 END AS f3
           FROM raw),
         tr AS (SELECT * FROM f WHERE $trainBand < $TrainMills)"""
    def wRef(e: Int, j: Int) = s"(SELECT w$j FROM e$e)"
    def marginSql(e: Int) =
      s"y * (${(0 to 3).map(j => s"${wRef(e, j)} * f$j").mkString(" + ")})"
    val e0 = "e0 AS (SELECT " +
      (0 to 3).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    val epochCtes = (1 to epochs).map { e =>
      s"""e$e AS MATERIALIZED (SELECT ${(0 to 3).map(j =>
          s"${wRef(e - 1, j)} + COALESCE(CAST(SUM(y * f$j) AS BIGINT), 0) AS w$j")
          .mkString(", ")}
         FROM tr WHERE ${marginSql(e - 1)} <= 0)"""
    }
    val last = s"e$epochs"
    s"""WITH $featsCte,
       $e0,
       ${epochCtes.mkString(",\n       ")},
       ho AS (SELECT y,
           CASE WHEN ${(0 to 3).map(j => s"${wRef(epochs, j)} * f$j")
             .mkString(" + ")} > 0 THEN 1 ELSE -1 END AS pred
         FROM f WHERE $trainBand >= $TrainMills)
       ${(0 to 3).map(j =>
          s"SELECT 'w$j' AS item, (SELECT w$j FROM $last) AS value")
          .mkString("\n       UNION ALL ")}
       UNION ALL SELECT 'tp', CAST(COALESCE(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 END), 0) AS BIGINT) FROM ho
       UNION ALL SELECT 'fp', CAST(COALESCE(SUM(CASE WHEN y = -1 AND pred = 1 THEN 1 END), 0) AS BIGINT) FROM ho
       UNION ALL SELECT 'fn', CAST(COALESCE(SUM(CASE WHEN y = 1 AND pred = -1 THEN 1 END), 0) AS BIGINT) FROM ho
       UNION ALL SELECT 'tn', CAST(COALESCE(SUM(CASE WHEN y = -1 AND pred = -1 THEN 1 END), 0) AS BIGINT) FROM ho"""
  }
}
