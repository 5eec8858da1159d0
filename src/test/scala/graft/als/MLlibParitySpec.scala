package graft.als

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md protocol: our ALS must reach RMSE ≤ MLlib's + ε on identical
  * data and hyperparameters (distribution-level parity — the RNG streams
  * differ, so factors are compared through the fit quality, not bitwise).
  */
class MLlibParitySpec extends AnyFunSuite with SparkFixture {

  test("graft ALS matches MLlib ALS fit quality on fixture-derived ratings") {
    val ratings = graft.queries.Queries.ratingsDF(spark, "/root/testdata/sf0.001")
      .withColumn("user_int", col("user_id").cast("int"))
      .withColumn("item_int", col("item_id").cast("int"))
    ratings.cache().count()

    val ours = GraftALS(
      rank = 8, maxIter = 5, regParam = 0.1,
      numUserBlocks = 4, numItemBlocks = 4,
      userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
      seed = 42L).fit(ratings)
    val ourMse = ours.mse(ratings, "rating")

    val mllib = new org.apache.spark.ml.recommendation.ALS()
      .setRank(8).setMaxIter(5).setRegParam(0.1)
      .setNumUserBlocks(4).setNumItemBlocks(4)
      .setUserCol("user_int").setItemCol("item_int").setRatingCol("rating")
      .setSeed(42L)
      .fit(ratings)
    mllib.setColdStartStrategy("drop")
    val mllibMse = mllib.transform(ratings)
      .agg(avg(pow(col("prediction").cast("double") - col("rating"), 2.0)))
      .head().getDouble(0)

    info(s"graft MSE=$ourMse, MLlib MSE=$mllibMse")
    assert(ourMse <= mllibMse * 1.10 + 1e-9,
      s"graft MSE $ourMse worse than MLlib $mllibMse by more than 10%")
  }
}
