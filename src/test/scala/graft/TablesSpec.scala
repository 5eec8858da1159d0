package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.load("events")` vintage normalization — in particular that the
  * TIMESTAMP_NTZ→TIMESTAMP cast is pinned to UTC regardless of the caller's
  * `spark.sql.session.timeZone` (round-8 advice: a non-UTC notebook session
  * must not silently shift every event instant).
  */
class TablesSpec extends AnyFunSuite with SparkFixture {

  private def writeNtzEvents(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    dir.deleteOnExit()
    // LocalDateTime encodes as TIMESTAMP_NTZ; parquet writes
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark re-infers as NTZ
    Seq((1L, LocalDateTime.of(2024, 3, 1, 12, 0, 0)))
      .toDF("event_id", "ts")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("NTZ events cast to TIMESTAMP as a UTC instant under any session tz") {
    val dir = writeNtzEvents()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      // 2024-03-01T12:00Z in epoch micros — the UTC interpretation; a cast
      // leaking the LA session tz would land 8h later
      val got = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == 1709294400000000L)
      // and the load must leave the caller's session tz untouched
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/Los_Angeles")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("NTZ events read identically under UTC session tz") {
    val dir = writeNtzEvents()
    val got = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == 1709294400000000L)
  }
}
