package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming ingest of the `events` table: watermarked windowed
  * aggregation and within-watermark dedup, plus an incremental-ratings
  * stream (the streaming twin of the ALS ratings derivation).
  *
  * The batch fixtures stand in for a stream via the file source +
  * `Trigger.AvailableNow` (process-everything-then-stop), which exercises
  * the real streaming machinery — state store, watermark advance, append
  * mode — while remaining deterministic and oracle-checkable against the
  * equivalent batch aggregation.
  */
object EventsStream {

  /** Streaming DataFrame over the events parquet directory (ts normalized
    * from nano parquet storage by [[graft.Tables.streamEvents]]).
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.streamEvents(spark, sfDir)

  /** Tumbling-window counts/sums per event_type with a watermark: the
    * canonical streaming aggregation. Output columns are chosen to be
    * batch-comparable (epoch seconds, not window structs).
    */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour", windowLen: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,6)")).as("sum_value_dec"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))

  /** Streaming dedup on event_id within the watermark — the streaming
    * counterpart of exact dedup (bounded state, drops late replays).
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental ratings derivation: per (user, event_type) running
    * aggregates in update-less append form (windowed by day so each day's
    * interactions close once the watermark passes).
    */
  def incrementalRatings(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), "1 day").as("w"),
        col("user_id"),
        col("event_type"))
      .agg(avg("value").as("rating"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("user_id"),
        abs(xxhash64(col("event_type"))).as("item_id"),
        col("rating"))

  /** Runs a streaming transform to completion over the fixture files with
    * `Trigger.AvailableNow` and returns the accumulated result as a batch
    * DataFrame (memory sink). Used by the verify harness so the streaming
    * path is DuckDB-oracle-checkable.
    */
  def runToBatch(
      spark: SparkSession,
      sfDir: String,
      transform: DataFrame => DataFrame,
      queryName: String): DataFrame = {
    val out = transform(readEvents(spark, sfDir))
    val q = out.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
