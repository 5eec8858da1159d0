package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ratings ingestion — the engine's source surface (SURVEY.md §2.1).
  *
  * The reference consumes a headerless CSV of `user,item,rating` triples
  * (`/root/reference/ALS.py:590-592`); fixture-backed pipelines derive
  * ratings relationally. Both paths produce the same canonical schema
  * `(user_id BIGINT, item_id BIGINT, rating DOUBLE)`.
  */
object RatingsSource {

  val schema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false),
    StructField("rating", DoubleType, nullable = false)))

  /** Headerless CSV `user:int,item:int,rating:float` — the reference's
    * `textFile` + split + typed construction (`ALS.py:590-592`) as one typed
    * csv scan. Malformed lines are dropped (PERMISSIVE + na.drop), matching
    * the reference's implicit assumption of clean input without its crash.
    */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .na.drop()

  /** Explicit ratings from the fixture star schema: interaction strength of
    * customer×part (`rating = Σ quantity`).
    */
  def fromLineitem(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("rating"))

  /** Implicit-feedback derivation from the events stream table: interaction
    * counts per (user, event_type-as-item) — nonnegative confidence inputs
    * for the Hu-Koren-Volinsky path. Item ids come from a dense-rank over
    * the (tiny) distinct event-type dim — portable across engines, and the
    * single-partition window only ever sees the dim, not the fact table.
    */
  def implicitFromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.load(spark, sfDir, "events")
    val items = events.select("event_type").distinct()
      .withColumn("item_id",
        dense_rank().over(org.apache.spark.sql.expressions.Window.orderBy("event_type"))
          .cast("long"))
    events.join(broadcast(items), "event_type")
      .groupBy(col("user_id"), col("item_id"))
      .agg(count(lit(1)).cast("double").as("rating"))
  }
}
