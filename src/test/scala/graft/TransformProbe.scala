package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope — run with `sbt "Test/runMain graft.TransformProbe"`;
  * round-10 ADVICE: keep throwaway harnesses out of the shipped binary): isolate whether the
  * ×100 transform gap vs MLlib is join-key width (our BIGINT ids vs
  * MLlib's INT) by timing the identical two-join + dot plan with long vs
  * int keys on the same data and model.
  */
object TransformProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_full_x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ratings = graft.queries.Queries.ratingsDF(spark, sfDir)
    val model = graft.als.GraftALS(
      rank = 8, maxIter = 5, regParam = 0.1,
      numUserBlocks = 8, numItemBlocks = 8,
      userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
      seed = 7L).fit(ratings)

    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def settle(): Unit = { spark.catalog.clearCache(); System.gc() }

    import graft.functions.VectorFunctions

    // long-keyed manual twin of model.transform
    val ufL = model.userFactors.select(col("id").as("uid"), col("features").as("uf"))
    val itfL = model.itemFactors.select(col("id").as("iid"), col("features").as("if_"))
    timed("transform_long_keys") {
      ratings
        .join(ufL, ratings("user_id").cast("long") === ufL("uid"))
        .join(itfL, ratings("item_id").cast("long") === itfL("iid"))
        .withColumn("prediction", VectorFunctions.dot(col("uf"), col("if_")).cast("float"))
        .drop("uf", "if_")
        .write.format("noop").mode("overwrite").save()
    }
    settle()
    // int-keyed variant: same join shape, narrower keys everywhere
    val ufI = model.userFactors.select(col("id").cast("int").as("uid"), col("features").as("uf"))
    val itfI = model.itemFactors.select(col("id").cast("int").as("iid"), col("features").as("if_"))
    val ratingsI = ratings.select(
      col("user_id").cast("int").as("user_id"),
      col("item_id").cast("int").as("item_id"), col("rating"))
    timed("transform_int_keys") {
      ratingsI
        .join(ufI, ratingsI("user_id") === ufI("uid"))
        .join(itfI, ratingsI("item_id") === itfI("iid"))
        .withColumn("prediction", VectorFunctions.dot(col("uf"), col("if_")).cast("float"))
        .drop("uf", "if_")
        .write.format("noop").mode("overwrite").save()
    }
    settle()
    // fit auto-engages the INT-key path since round 14, so the LONG-path
    // model-API row has to force it back off
    timed("transform_model_api") {
      model.copy(intKeyTransform = false)
        .transform(ratings).write.format("noop").mode("overwrite").save()
    }
    settle()
    // the INT-key serving path (GraftALSModel.withCompactIds, now the fit
    // default) — the model-API row that closes the long-vs-int key gap
    val compact = model.withCompactIds()
    timed("transform_model_int") {
      compact.transform(ratings).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
