package graft.forecast

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E5 — gradient-boosted-tree regression on lag features (the
  * reference trains XGBoost on the same supervised frame,
  * ml/forecast_utils.py:54-114). Spark MLlib's GBTRegressor is the
  * distributed-native equivalent: tree induction parallelizes over
  * both rows and features, so the same code trains on a 100 TB
  * feature frame.
  */
object Gbt {

  /** Train on the 'train' split, predict the 'test' split. */
  def forecast(obs: DataFrame): DataFrame = {
    val feats = Forecast.lagFeatures(obs)
      .join(Forecast.trainTestSplit(obs), Seq("geo", "indicator", "year", "value"))
      .filter(col("lag3").isNotNull && col("roll_std_3").isNotNull)
    val assembler = new VectorAssembler()
      .setInputCols(Array("year", "lag1", "lag2", "lag3", "roll_mean_3", "roll_std_3"))
      .setOutputCol("features")
    val train = assembler.transform(feats.filter(col("split") === "train"))
    val test = assembler.transform(feats.filter(col("split") === "test"))
    val model = new GBTRegressor()
      .setLabelCol("value").setFeaturesCol("features")
      .setMaxIter(20).setMaxDepth(3).setStepSize(0.1).setSeed(42)
      .fit(train)
    model.transform(test)
      .select(col("geo"), col("indicator"), col("year"),
        col("value"), col("prediction"))
  }
}
