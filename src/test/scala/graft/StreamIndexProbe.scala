package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (test scope): per-trigger cost of the append-only
  * merge-on-write first-seen index vs BATCH size and vs INDEX size — the
  * measurement behind the round-12 "O(batch) in every regime" claim.
  *
  * For each `dir:numBuckets` argument: build the index from the tier's
  * full events table (one AvailableNow batch — the bulk load), then apply
  * incremental batches of 64, 100k and 1M FRESH keys (a 64-key warm batch
  * first absorbs stream/codegen startup). The 64-key trickle touches ≤64
  * buckets; the 100k/1M batches hash into EVERY bucket — the regime where
  * the round-11 read-modify-write design degraded to an O(index) full
  * rewrite. The append-only commit must show per-trigger cost tracking
  * batch size (1M ≳ 100k ≫ 64 only by its own write volume) and staying
  * ~flat across the ×10→×100 index-size decade. A final 1M batch runs
  * with compactEvery=1, forcing every bucket to fold base+deltas — the
  * amortized compaction ceiling, reported separately from the append
  * path it amortizes.
  *
  * SPARK_GRAFT_PROBE_STAGES=1 prints per-stage timings (>0.5 s).
  *
  * Run: sbt "Test/runMain graft.StreamIndexProbe /tmp/graft_scale_full_x10:128 /tmp/graft_scale_full_x100:1024"
  */
object StreamIndexProbe {
  def main(args: Array[String]): Unit = {
    val tiers = (if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1:32"))
      .map { a => val Array(d, b) = a.split(":"); (d, b.toInt) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1000.0
          if (dur.exists(_ > 0.5))
            println(f"[stage] ${si.stageId}%4d ${dur.getOrElse(0.0)}%7.2f s  " +
              f"tasks=${si.numTasks}  ${si.name.take(90)}")
        }
      })

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
      def runOnce(compactEvery: Int = 8, cap: Int = Int.MaxValue): Double = {
        val t0 = System.nanoTime()
        graft.streaming.EventsStream.firstSeenIndex(
          stream, idx, ck, numBuckets, compactEvery, cap)
        spark.streams.resetTerminated()
        (System.nanoTime() - t0) / 1e9
      }
      val buildSec = runOnce()
      // fresh-key incremental batches; a small warm batch first
      def incr(tag: String, keys: Long, compactEvery: Int = 8,
          cap: Int = Int.MaxValue): Double = {
        spark.range(keys)
          .select(
            concat(lit(s"${tag}_k"), col("id").cast("string")).as("content_hash"),
            (col("id") + 1L).as("event_id"))
          .coalesce(math.max(1, (keys / 250000L).toInt))
          .write.parquet(s"$src/$tag")
        println(s"[probe] --- batch $tag ($keys keys) ---")
        runOnce(compactEvery, cap)
      }
      val warmSec = incr("w1", 64)
      val incr64 = incr("w2", 64)
      val incr100k = incr("m100k", 100000)
      val incr1m = incr("m1m", 1000000)
      // amortization ceiling, UNCAPPED: same 1M append + every bucket folds
      // on this one trigger — the round-12 lockstep latency spike
      val incr1mCompact = incr("m1mc", 1000000, compactEvery = 1)
      // the round-13 capped regime on the SAME all-buckets-over-threshold
      // pattern: a 1M append puts a delta in every bucket again
      // (compactEvery=1 → all candidates), but the default cap folds only
      // nb/8 of them per trigger; two 64-key drain triggers then show the
      // carryover cost each later trigger absorbs. Max(capped, drains) vs
      // incr1m_compact_sec is the latency-spike reduction the cap buys.
      val incr1mCapped = incr("c1m", 1000000, compactEvery = 1, cap = 0)
      val drain1 = incr("d1", 64, compactEvery = 1, cap = 0)
      val drain2 = incr("d2", 64, compactEvery = 1, cap = 0)
      val indexRows = graft.streaming.EventsStream.latestIndex(spark, idx).count()
      println(f"[probe] $dir buckets=$numBuckets%5d index=$indexRows%9d " +
        f"build=$buildSec%7.2f warm=$warmSec%6.2f incr64=$incr64%6.2f " +
        f"incr100k=$incr100k%6.2f incr1m=$incr1m%6.2f compact1m=$incr1mCompact%7.2f " +
        f"capped1m=$incr1mCapped%7.2f drains=$drain1%6.2f/$drain2%6.2f")
      out.append(s"""  {"dir":"$dir","num_buckets":$numBuckets,""" +
        s""""index_rows":$indexRows,""" +
        f""""build_sec":$buildSec%.2f,"incr_warm_sec":$warmSec%.2f,""" +
        f""""incr64_sec":$incr64%.2f,"incr100k_sec":$incr100k%.2f,""" +
        f""""incr1m_sec":$incr1m%.2f,"incr1m_compact_sec":$incr1mCompact%.2f,""" +
        f""""incr1m_capped_sec":$incr1mCapped%.2f,""" +
        f""""drain1_sec":$drain1%.2f,"drain2_sec":$drain2%.2f}""" +
        (if (ti == tiers.size - 1) "\n" else ",\n"))
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(root))
      spark.catalog.clearCache(); System.gc()
    }
    out.append("]\n")
    val dst = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
      "/root/repo/bench_artifacts/stream_index_probe_r12.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(dst),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
