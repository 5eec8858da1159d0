package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (test scope): per-batch cost of the bucketed merge-on-write
  * first-seen index vs index size — the measurement behind the round-11
  * O(batch) claim.
  *
  * For each `dir:numBuckets` argument: build the index from the tier's
  * full events table (one AvailableNow batch — the bulk load), then apply
  * two small incremental batches of `batchKeys` fresh keys each (the
  * second is the measured one; the first warms stream/codegen machinery).
  * With numBuckets sized so a bucket holds a bounded key count, the
  * incremental batch reads only the <=batchKeys buckets its keys hash
  * into — so the measured maintenance cost should track BATCH size and
  * stay ~flat across a 10x index-size decade, where the old full-rewrite
  * design paid the whole index every trigger.
  *
  * Run: sbt "Test/runMain graft.StreamIndexProbe /tmp/graft_scale_full_x10:128 /tmp/graft_scale_full_x100:1024"
  */
object StreamIndexProbe {
  def main(args: Array[String]): Unit = {
    val tiers = (if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1:32"))
      .map { a => val Array(d, b) = a.split(":"); (d, b.toInt) }
    val batchKeys = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val out = new StringBuilder("[\n")
    tiers.zipWithIndex.foreach { case ((dir, numBuckets), ti) =>
      val root = s"/tmp/graft_sip_${ProcessHandle.current().pid()}_$ti"
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(root))
      val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
      // seed: the tier's whole events table, keyed as in stream_index_maintenance
      Tables.load(spark, dir, "events")
        .select(
          md5(concat_ws("|", col("user_id"), col("event_type"), col("props")))
            .as("content_hash"),
          col("event_id"))
        .write.parquet(s"$src/f0")
      def stream = spark.readStream
        .schema("content_hash STRING, event_id BIGINT")
        .parquet(s"$src/*")
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        graft.streaming.EventsStream.firstSeenIndex(stream, idx, ck, numBuckets)
        spark.streams.resetTerminated()
        (System.nanoTime() - t0) / 1e9
      }
      val buildSec = runOnce()
      // two incremental batches of fresh keys; warm first, measure second
      def incr(tag: String): Double = {
        (0 until batchKeys).map(i => (s"${tag}_probe_key_$i", 1L + i))
          .toDF("content_hash", "event_id")
          .coalesce(1).write.parquet(s"$src/$tag")
        runOnce()
      }
      val warmSec = incr("w1")
      val incrSec = incr("w2")
      val indexRows = graft.streaming.EventsStream.latestIndex(spark, idx).count()
      println(f"[probe] $dir buckets=$numBuckets%5d index=$indexRows%9d " +
        f"build=$buildSec%7.2f warm=$warmSec%6.2f incr=$incrSec%6.2f")
      out.append(s"""  {"dir":"$dir","num_buckets":$numBuckets,""" +
        s""""index_rows":$indexRows,"batch_keys":$batchKeys,""" +
        f""""build_sec":$buildSec%.2f,"incr_warm_sec":$warmSec%.2f,"incr_sec":$incrSec%.2f}""" +
        (if (ti == tiers.size - 1) "\n" else ",\n"))
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(root))
      spark.catalog.clearCache(); System.gc()
    }
    out.append("]\n")
    val dst = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
      "/root/repo/bench_artifacts/stream_index_probe_r11.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(dst),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
