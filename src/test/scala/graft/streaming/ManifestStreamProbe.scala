package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope): drives the append-log manifest through
  * the REAL stream at 10⁴–10⁵ buckets — round-14 verdict "What's missing"
  * #3: `manifest_log_probe_r14.json` measured commit/read cost in
  * isolation; this measures `firstSeenIndex` per-trigger wall time
  * end-to-end with the log enabled, folds crossed mid-run, and a
  * concurrent reader racing the fold boundary.
  *
  * Per tier (numBuckets ∈ {10k, 100k}):
  *   1. bulk seed: one micro-batch of `seedKeys` fresh keys (occupies
  *      most buckets, pays one all-buckets log append + fold),
  *   2. 64 trickle files × 64 fresh keys, ONE `firstSeenIndex` run with
  *      `maxFilesPerTrigger=1` → 64 real sub-second micro-batches; the
  *      per-trigger series is recovered from the checkpoint's
  *      `commits/<batchId>` mtimes (ms resolution, no harness in the
  *      timed path),
  *   3. `manifestFoldAppendsOverride=2048` pins folds at ~trigger 32 and
  *      64 of the series at BOTH tiers (production folds every
  *      max(64, buckets) appends — rarer; the override makes the fold
  *      spike land inside a 64-trigger series so its cost is visible),
  *   4. a daemon reader hammers [[EventsStream.readManifest]] for the
  *      whole run, recording successes / dir-walk fallbacks / crashes and
  *      every epoch transition it observes (fold events, relative time),
  *   5. end check: `latestIndex` count == seeded + trickled distinct keys.
  *
  * Run: sbt "Test/runMain graft.streaming.ManifestStreamProbe [outFile]"
  */
object ManifestStreamProbe {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse(
      "/root/repo/bench_artifacts/manifest_stream_probe_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def num(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

    val seedKeys = 500000L
    val trickleBatches = 64
    val trickleKeys = 64L
    val tiers = Seq(10000, 100000)

    val out = new StringBuilder("[\n")
    tiers.zipWithIndex.foreach { case (nb, ti) =>
      val root = s"/tmp/graft_msp_${ProcessHandle.current().pid()}_$nb"
      EventsStream.deleteRecursively(new java.io.File(root))
      val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
      def stream = spark.readStream
        .schema("content_hash STRING, event_id BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/*")

      EventsStream.manifestFoldAppendsOverride = Some(2048)

      // ---- 1. bulk seed: one micro-batch occupying ~every bucket ----
      spark.range(seedKeys)
        .select(concat(lit("s"), col("id").cast("string")).as("content_hash"),
          col("id").as("event_id"))
        .coalesce(1).write.parquet(s"$src/seed")
      val tSeed0 = System.nanoTime()
      EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = nb)
      val seedSec = (System.nanoTime() - tSeed0) / 1e9
      println(f"[probe] nb=$nb seed $seedKeys keys ${seedSec}%.1f s")

      // ---- 4. concurrent reader (starts before the trickle run) ----
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val someReads = new java.util.concurrent.atomic.AtomicLong(0)
      val noneReads = new java.util.concurrent.atomic.AtomicLong(0)
      val readErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val foldEvents = new java.util.concurrent.ConcurrentLinkedQueue[(Double, Long)]()
      val t0 = System.nanoTime()
      def snapshotEpoch(): Long = {
        val f = new java.io.File(idx, "_manifest")
        if (!f.isFile) -1L
        else try {
          val in = new java.io.BufferedReader(new java.io.FileReader(f))
          try Option(in.readLine()).filter(_.startsWith("#epoch "))
            .flatMap(_.stripPrefix("#epoch ").trim.toLongOption).getOrElse(-1L)
          finally in.close()
        } catch { case _: Throwable => -1L }
      }
      val reader = new Thread(() => {
        var lastEpoch = snapshotEpoch()
        while (!stop.get()) {
          try {
            EventsStream.readManifest(idx) match {
              case Some(_) => someReads.incrementAndGet(): Unit
              case None    => noneReads.incrementAndGet(): Unit
            }
            val e = snapshotEpoch()
            if (e != lastEpoch) {
              foldEvents.add(((System.nanoTime() - t0) / 1e9, e)): Unit
              lastEpoch = e
            }
          } catch { case t: Throwable => readErrors.add(t): Unit }
        }
      })
      reader.setDaemon(true)
      reader.start()

      // ---- 2. sixty-four 64-key trickle micro-batches in ONE stream ----
      (0 until trickleBatches).foreach { i =>
        spark.range(trickleKeys)
          .select(concat(lit(s"t${i}_"), col("id").cast("string")).as("content_hash"),
            (col("id") + i * 1000L).as("event_id"))
          .coalesce(1).write.parquet(s"$src/t$i")
      }
      val tTrickle0 = System.nanoTime()
      EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = nb)
      val trickleSec = (System.nanoTime() - tTrickle0) / 1e9
      stop.set(true)
      reader.join(5000)
      EventsStream.manifestFoldAppendsOverride = None

      // per-trigger series from the checkpoint's commit-file mtimes:
      // commits/0 is the seed batch; 1..64 are the trickle triggers
      val commitTimes = Option(new java.io.File(ck, "commits").listFiles())
        .toSeq.flatten
        .filter(_.getName.forall(_.isDigit))
        .map(f => f.getName.toInt -> f.lastModified())
        .sortBy(_._1)
      val series = commitTimes.sliding(2).collect {
        case Seq((_, a), (id, b)) if id >= 2 => (b - a) / 1000.0
      }.toSeq // drop the first trickle trigger: its gap includes stream start
      def pct(s: Seq[Double], p: Double): Double = {
        val x = s.sorted
        x((p * (x.size - 1)).round.toInt)
      }

      // ---- 5. end-to-end read check ----
      val rows = EventsStream.latestIndex(spark, idx).count()
      val expected = seedKeys + trickleBatches * trickleKeys
      require(rows == expected, s"index rows $rows != expected $expected")
      require(readErrors.isEmpty,
        s"concurrent reader crashed: ${readErrors.peek()}")

      println(f"[probe] nb=$nb trickle ${trickleSec}%.1f s for $trickleBatches triggers; " +
        f"p50=${pct(series, 0.5)}%.3f p90=${pct(series, 0.9)}%.3f max=${series.max}%.3f s; " +
        s"reads ok=${someReads.get()} fallback=${noneReads.get()} folds=${foldEvents.size()}")
      import scala.jdk.CollectionConverters._
      out.append(s"""  {"num_buckets":$nb,"seed_keys":$seedKeys,""" +
        s""""seed_sec":${num(seedSec)},"trickle_triggers":$trickleBatches,""" +
        s""""trickle_keys_per_trigger":$trickleKeys,""" +
        s""""fold_appends_override":2048,""" +
        s""""trigger_p50_sec":${num(pct(series, 0.5))},""" +
        s""""trigger_p90_sec":${num(pct(series, 0.9))},""" +
        s""""trigger_max_sec":${num(series.max)},""" +
        s""""trigger_series_sec":[${series.map(num).mkString(",")}],""" +
        s""""reader_ok":${someReads.get()},"reader_fallback":${noneReads.get()},""" +
        s""""reader_errors":${readErrors.size()},""" +
        s""""fold_events":[${foldEvents.asScala.map { case (at, e) =>
              s"""{"at_sec":${num(at)},"epoch":$e}"""
            }.mkString(",")}],""" +
        s""""index_rows":$rows}""" +
        (if (ti == tiers.size - 1) "\n" else ",\n"))
      EventsStream.deleteRecursively(new java.io.File(root))
      spark.catalog.clearCache()
      System.gc()
    }
    out.append("]\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), out.toString.getBytes("UTF-8"))
    println(s"[probe] wrote $outFile")
    spark.stop()
  }
}
