package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Fixture-table access (see /root/repo/TESTDATA.md, FIXTURES.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read the
  * driver-generated parquet directly. Reads are plain `spark.read.parquet`
  * so Catalyst's parquet source handles column pruning / predicate pushdown;
  * at cluster scale the same code reads a partitioned table root.
  *
  * The `events` table's `ts` column has shipped in two physical vintages:
  * parquet TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
  * outright ([PARQUET_TYPE_ILLEGAL]), so we read it as a raw nano count
  * (`spark.sql.legacy.parquet.nanosAsLong`) — and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ. Either
  * way `load` surfaces one canonical micro-precision TIMESTAMP column.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") normalizeEventTs(readNanos(spark, s"$sfDir/$name.parquet"))
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Only the events table needs the legacy nanos conf; there is no per-read
    * parquet option for it (checked ParquetOptions in 4.1), so reading
    * events necessarily leaves the session conf set — but loads of the other
    * nine tables no longer mutate session state at all.
    */
  private def readNanos(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  /** Normalize `ts` to Spark's TIMESTAMP (one canonical event-time type
    * across the engine and the DuckDB oracle) over the fixture vintages:
    * nanos-since-epoch LONG (legacy-nanos fixtures; integer `div` keeps
    * full precision) and parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * which Spark 4 infers as TIMESTAMP_NTZ.
    *
    * The NTZ→LTZ cast interprets the stored wall clock in a time zone; it
    * is built HERE as a Catalyst `Cast` with an explicit
    * `timeZoneId=Some("UTC")` (round-10 ADVICE) rather than by toggling
    * `spark.sql.session.timeZone` around eager analysis — the toggle was
    * correct single-threaded but raced any concurrent analysis in the same
    * session (which would silently run under UTC), and two concurrent
    * loads could restore the wrong zone. The explicit-tz expression is
    * thread-safe by construction and leaves session state untouched.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.GraftSqlShims.column(
            org.apache.spark.sql.catalyst.expressions.Cast(
              org.apache.spark.sql.GraftSqlShims.expression(col("ts")),
              TimestampType, timeZoneId = Some("UTC"))))
      case _                => df
    }

  /** Raw (pre-conversion) schema of a fixture table — what the streaming
    * file source must be given.
    */
  def rawSchema(spark: SparkSession, sfDir: String, name: String): StructType =
    readNanos(spark, s"$sfDir/$name.parquet").schema

  /** Streaming twin of `load` for the events table, handling both fixture
    * layouts: a single FILE named `events.parquet` (the driver fixtures —
    * the file source wants a directory, so stream the sf dir with a glob
    * pinned to that leaf name) and a DIRECTORY of part files (every real
    * deployment, and `graft.ScaleUp` tiers — `pathGlobFilter` matches leaf
    * file names, so pinning it to `events.parquet` would silently discover
    * ZERO files and run the stream on empty input).
    */
  def streamEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = rawSchema(spark, sfDir, "events")
    val path = s"$sfDir/events.parquet"
    val reader = spark.readStream.schema(schema)
    normalizeEventTs(
      if (new java.io.File(path).isDirectory) reader.parquet(path)
      else reader.option("pathGlobFilter", "events.parquet").parquet(sfDir))
  }

  /** Register all fixture tables as temp views so SQL-form queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
