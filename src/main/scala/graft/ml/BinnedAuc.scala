package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROC-AUC without a global sort: bin the scores (one codegen hash
  * aggregation, B bins), collect the tiny per-bin (n, positives) table,
  * and integrate the ROC curve by trapezoid on the driver.
  *
  * Spark's BinaryClassificationEvaluator sorts ALL (score, label) pairs
  * (RDD sortByKey) and then downsamples the curve to ~1000 bins anyway —
  * at 100 TB that global sort is the whole cost, and its post-hoc binning
  * admits the same approximation this method applies up front. Ties within
  * a bin integrate as a diagonal segment, which is exactly the average-rank
  * tie treatment. Accuracy is bounded by the bin width (1/bins on the
  * score axis); BinnedAucSpec pins agreement with the exact evaluator.
  *
  * `scoreCol` must lie in [0, 1] (a probability); `labelCol` in {0, 1}.
  */
object BinnedAuc {

  def auc(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10000): Double = {
    require(bins > 0, "bins must be positive")
    val perBin = scored.select(
      least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int").as("bin"),
      col(labelCol).cast("double").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1).toDouble, r.getDouble(2)))
      .sortBy(-_._1) // descending score: ROC sweeps from strictest threshold
    val totPos = perBin.map(_._3).sum
    val totNeg = perBin.map(t => t._2 - t._3).sum
    if (totPos == 0 || totNeg == 0) return 0.5
    var tp = 0.0; var fp = 0.0; var area = 0.0
    var prevTpr = 0.0; var prevFpr = 0.0
    perBin.foreach { case (_, n, pos) =>
      tp += pos; fp += n - pos
      val tpr = tp / totPos; val fpr = fp / totNeg
      area += (fpr - prevFpr) * (tpr + prevTpr) / 2
      prevTpr = tpr; prevFpr = fpr
    }
    area
  }
}
