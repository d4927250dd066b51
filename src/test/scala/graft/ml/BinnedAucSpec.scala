package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class BinnedAucSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("perfect and random separators give 1.0 and ~0.5") {
    import spark.implicits._
    val perfect = (1 to 1000).map(i => (if (i > 500) 1 else 0, i / 1000.0))
      .toDF("label", "score")
    BinnedAuc.auc(perfect, "score", "label") shouldBe 1.0 +- 0.005
    val random = (1 to 4000).map(i => (i % 2, (i % 997) / 997.0))
      .toDF("label", "score")
    BinnedAuc.auc(random, "score", "label") shouldBe 0.5 +- 0.03
  }

  test("agrees with BinaryClassificationEvaluator on a real model (gdelt, AUC 0.72)") {
    val feats = spark.read
      .parquet("/root/reference/gdelt/data/gdelt_ml_features.parquet")
    val indexed = feats.withColumn("label",
      when(col("label_week") === "week_feb", 1.0).otherwise(0.0))
    val cols = graft.gdelt.GdeltMl.weekFeatures
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features")
      .transform(indexed.na.fill(0, cols))
    val model = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label").fit(assembled)
    val scored = model.transform(assembled)
      .select(col("label"),
        vector_to_array(col("probability")).getItem(1).as("p1"),
        col("rawPrediction"))
    val exact = new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("rawPrediction").evaluate(scored)
    val binned = BinnedAuc.auc(scored, "p1", "label")
    binned shouldBe exact +- 0.002
  }

  test("agrees with the exact rank-sum AUC (q47's relational form) on the same scored frame") {
    // q47 computes exact Mann-Whitney AUC of this fixed linear score over
    // lineitem; BinnedAuc on a monotone [0,1] rescale of the same score
    // must land within binning tolerance — transitively validating the
    // AUC path the ML queries rely on against a DuckDB-verified value.
    val exact = graft.queries.Registry.queries("q47_auc_ranksum")(spark, sf0001)
      .collect()(0).getDouble(0)
    val scored = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(
        // raw score range is (-0.4, 1.5); monotone rescale preserves AUC
        (((col("l_discount") * 10 - col("l_tax") * 5 + col("l_quantity") / 100.0)
          + 0.5) / 2.0).as("score"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"))
    BinnedAuc.auc(scored, "score", "label") shouldBe exact +- 0.002
  }

  test("degenerate single-class input returns 0.5") {
    import spark.implicits._
    val onlyPos = Seq((1, 0.9), (1, 0.1)).toDF("label", "score")
    BinnedAuc.auc(onlyPos, "score", "label") shouldBe 0.5
  }
}
