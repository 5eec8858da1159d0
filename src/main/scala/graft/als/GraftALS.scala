package graft.als

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ml-style ALS estimator: DataFrame in → [[GraftALSModel]] out.
  *
  * Public API analogue of the reference's `NewALS.train`
  * (`/root/reference/ALS.py:24-37`): same hyperparameters, but the input is
  * a DataFrame with configurable user/item/rating columns and the output
  * model exposes `userFactors`/`itemFactors` DataFrames plus a Catalyst-plan
  * `transform` (scoring joins + codegen'd dot product).
  */
case class GraftALS(
    rank: Int = 10,
    maxIter: Int = 10,
    regParam: Double = 0.01,
    numUserBlocks: Int = 10,
    numItemBlocks: Int = 10,
    implicitPrefs: Boolean = false,
    alpha: Double = 1.0,
    nonnegative: Boolean = false,
    userCol: String = "user",
    itemCol: String = "item",
    ratingCol: String = "rating",
    seed: Long = 0L,
    checkpointInterval: Int = 10,
    intermediateStorageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    finalStorageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    coldStartStrategy: String = "nan") {

  require(Seq("nan", "drop").contains(coldStartStrategy),
    s"coldStartStrategy must be 'nan' or 'drop', got $coldStartStrategy")

  def fit(df: DataFrame): GraftALSModel = {
    val spark = df.sparkSession
    val ratings = df
      .select(
        col(userCol).cast("long"),
        col(itemCol).cast("long"),
        col(ratingCol).cast("float"))
      .na.drop()
      .rdd
      .map(r => Rating(r.getLong(0), r.getLong(1), r.getFloat(2)))

    val cfg = BlockedALS.Config(
      rank = rank,
      numUserBlocks = numUserBlocks,
      numItemBlocks = numItemBlocks,
      maxIter = maxIter,
      regParam = regParam,
      implicitPrefs = implicitPrefs,
      alpha = alpha,
      nonnegative = nonnegative,
      intermediateStorageLevel = intermediateStorageLevel,
      finalStorageLevel = finalStorageLevel,
      checkpointInterval = checkpointInterval,
      seed = seed)

    val (userIdAndFactors, itemIdAndFactors) = BlockedALS.train(ratings, cfg)

    val userFactors = spark.createDataFrame(
      userIdAndFactors.map { case (id, f) => FactorRow(id, f) })
    val itemFactors = spark.createDataFrame(
      itemIdAndFactors.map { case (id, f) => FactorRow(id, f) })

    GraftALSModel(rank, userFactors, itemFactors, userCol, itemCol, coldStartStrategy)
  }
}

/** Row type of the factor tables: `(id BIGINT, features ARRAY<FLOAT>)`. */
case class FactorRow(id: Long, features: Array[Float])

/** Fitted ALS model. `transform` is a pure Catalyst plan: two equi-joins
  * against the factor tables plus a builtin-expression dot product — the
  * reference's scoring join-chain (`ALS.py:622-625`) without any RDD or UDF.
  *
  * Scale note: the joins shuffle on the raw id (block partitioning is an
  * internal training detail); when a factor side is small Spark/AQE
  * broadcast it. Cold-start rows (ids unseen in training) get NaN
  * predictions or are dropped, per `coldStartStrategy` — the reference's
  * inner joins silently drop them (`ALS.py:622-624`).
  */
case class GraftALSModel(
    rank: Int,
    userFactors: DataFrame,
    itemFactors: DataFrame,
    userCol: String = "user",
    itemCol: String = "item",
    coldStartStrategy: String = "nan") {

  def transform(df: DataFrame): DataFrame = {
    val uf = userFactors.select(col("id").as("__uid"), col("features").as("__ufeat"))
    val itf = itemFactors.select(col("id").as("__iid"), col("features").as("__ifeat"))
    val joined = df
      .join(uf, df(userCol).cast("long") === uf("__uid"), "left")
      .join(itf, df(itemCol).cast("long") === itf("__iid"), "left")
      .withColumn(
        "prediction",
        when(col("__ufeat").isNull || col("__ifeat").isNull, lit(Float.NaN))
          .otherwise(VectorFunctions.dot(col("__ufeat"), col("__ifeat")).cast("float")))
      .drop("__uid", "__ufeat", "__iid", "__ifeat")
    if (coldStartStrategy == "drop") joined.where(!isnan(col("prediction"))) else joined
  }

  /** Training-set-style MSE over a ratings DataFrame with `ratingCol`
    * (reference: `ALS.py:629`). Cold-start rows are dropped first.
    */
  def mse(df: DataFrame, ratingCol: String = "rating"): Double = {
    val scored = copy(coldStartStrategy = "drop").transform(df)
    scored
      .agg(avg(pow(col("prediction").cast("double") - col(ratingCol).cast("double"), 2.0)))
      .head().getDouble(0)
  }

  /** Persists both factor tables + metadata. */
  def save(path: String): Unit = {
    userFactors.write.mode("overwrite").parquet(s"$path/userFactors")
    itemFactors.write.mode("overwrite").parquet(s"$path/itemFactors")
    val meta = s"""{"rank":$rank,"userCol":"$userCol","itemCol":"$itemCol","coldStartStrategy":"$coldStartStrategy"}"""
    val spark = userFactors.sparkSession
    import spark.implicits._
    Seq(meta).toDF("meta").coalesce(1).write.mode("overwrite").json(s"$path/metadata")
  }
}

object GraftALSModel {
  def load(spark: SparkSession, path: String): GraftALSModel = {
    val meta = spark.read.json(s"$path/metadata").head().getAs[String]("meta")
    // minimal JSON field extraction (metadata is written by save() above)
    def field(name: String): String = {
      val m = ("\"" + name + "\"\\s*:\\s*\"?([^\",}]+)\"?").r
      m.findFirstMatchIn(meta).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"missing $name in model metadata"))
    }
    GraftALSModel(
      rank = field("rank").toInt,
      userFactors = spark.read.parquet(s"$path/userFactors"),
      itemFactors = spark.read.parquet(s"$path/itemFactors"),
      userCol = field("userCol"),
      itemCol = field("itemCol"),
      coldStartStrategy = field("coldStartStrategy"))
  }
}
