package graft.als

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedModelSpec extends AnyFunSuite with SparkFixture {

  test("bucketed factor tables join without an Exchange on the factor side") {
    import scala.jdk.CollectionConverters._
    val rng = new scala.util.Random(21)
    val ratings = for {
      u <- 0 until 30; i <- 0 until 20 if rng.nextDouble() < 0.5
    } yield org.apache.spark.sql.Row(u.toLong, i.toLong, (1 + rng.nextInt(5)).toDouble)
    val df = spark.createDataFrame(
      ratings.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("item", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rating", org.apache.spark.sql.types.DoubleType))))
    val model = GraftALS(rank = 3, maxIter = 3, numUserBlocks = 2, numItemBlocks = 2, seed = 77).fit(df)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      model.saveBucketed("spec_model", numBuckets = 4)
      val served = model.persistedBucketed(spark, "spec_model")
      val scored = served.transform(df)
      // same predictions as the in-memory model
      val a = model.transform(df).orderBy("user", "item")
        .select("prediction").collect().map(_.getFloat(0)).toSeq
      val b = scored.orderBy("user", "item")
        .select("prediction").collect().map(_.getFloat(0)).toSeq
      assert(a == b)
      // the bucketed factor scans must feed the join without their own
      // shuffle: count Exchanges under the join vs the unbucketed plan
      val bucketedPlan = scored.queryExecution.executedPlan.toString()
      val plainPlan = model.transform(df).queryExecution.executedPlan.toString()
      def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges(bucketedPlan) < exchanges(plainPlan),
        s"bucketed plan must drop factor-side exchanges:\nbucketed=$bucketedPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS spec_model_user_factors")
      spark.sql("DROP TABLE IF EXISTS spec_model_item_factors")
    }
  }
}
