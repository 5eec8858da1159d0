package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe (test scope): the events_json_variant read-path A/B behind
  * the round-12 shred-at-ingest change — per-query `parse_json` over the
  * raw `props` strings (the round-11 plan, whose ×100 cost was 20.1 s for
  * a 5-row output) vs `variant_get` over the VARIANT column materialized
  * once at ingest. Each side is the same aggregation; warmed median of 3
  * after one discarded cold run. The one-time shred cost is reported too:
  * it is the write-path price that buys every later read.
  *
  * Run: sbt "Test/runMain graft.VariantShredProbe /tmp/graft_scale_full_x10 /tmp/graft_scale_full_x100"
  */
object VariantShredProbe {
  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def agg(df: DataFrame): DataFrame =
      df.groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          min(col("k")).cast("bigint").as("min_k"),
          max(col("k")).cast("bigint").as("max_k"))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def warmedMedian(df: => DataFrame): Double = {
      timed(df.write.format("noop").mode("overwrite").save()): Unit
      val runs = (0 until 3).map(_ =>
        timed(df.write.format("noop").mode("overwrite").save())).sorted
      runs(1)
    }

    val out = new StringBuilder("[\n")
    tiers.zipWithIndex.foreach { case (dir, ti) =>
      val shredded = s"/tmp/graft_vsp_${ProcessHandle.current().pid()}_$ti"
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(shredded))
      val raw = Tables.load(spark, dir, "events")
      val shredSec = timed {
        raw.withColumn("props_var", parse_json(col("props"))).drop("props")
          .write.parquet(shredded)
      }
      val rawSec = warmedMedian(agg(
        raw.select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))))
      val shredReadSec = warmedMedian(agg(
        spark.read.parquet(shredded).select(col("event_type"),
          variant_get(col("props_var"), "$.k", "bigint").as("k"))))
      println(f"[probe] $dir shred_once=$shredSec%7.2f " +
        f"raw_read=$rawSec%7.2f shredded_read=$shredReadSec%7.2f " +
        f"(${rawSec / shredReadSec}%5.1fx)")
      out.append(s"""  {"dir":"$dir",""" +
        f""""shred_once_sec":$shredSec%.2f,"raw_read_sec":$rawSec%.2f,""" +
        f""""shredded_read_sec":$shredReadSec%.2f}""" +
        (if (ti == tiers.size - 1) "\n" else ",\n"))
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(shredded))
      spark.catalog.clearCache(); System.gc()
    }
    out.append("]\n")
    val dst = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
      "/root/repo/bench_artifacts/variant_shred_probe_r12.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(dst),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
