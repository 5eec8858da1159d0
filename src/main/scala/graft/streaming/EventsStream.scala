package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

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

  /** Session windows via the built-in `session_window` (gap-merged event
    * groups per user): the declarative sessionization path.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** One user's open session carried across micro-batches. */
  case class OpenSession(startSec: Double, lastSec: Double, n: Long, sum: Double)

  /** One emitted (closed) session. */
  case class Session(user_id: Long, session_start: Long, n_events: Long, sum_value: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * imperative path for session logic the declarative `session_window`
    * cannot express (per-session derived metrics, custom close rules).
    *
    * Per micro-batch, each user's new events are sorted and folded into the
    * open-session state; sessions closed by a gap are emitted immediately
    * and the trailing open session is kept in state with an event-time
    * timeout (watermark past `gap` closes and emits it). State size is
    * O(users), not O(events).
    */
  def sessionizeStateful(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    def fold(
        key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Double)],
        state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(Session(key, s.startSec.toLong, s.n, s.sum))
      }
      val sorted = rows.toArray.sortBy(_._2.getTime)
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var open = state.getOption
      sorted.foreach { case (_, ts, value) =>
        val tsec = ts.getTime / 1000.0
        open match {
          case Some(s) if tsec - s.lastSec <= gapSec =>
            open = Some(OpenSession(s.startSec, tsec, s.n + 1, s.sum + value))
          case Some(s) =>
            out += Session(key, s.startSec.toLong, s.n, s.sum)
            open = Some(OpenSession(tsec, tsec, 1L, value))
          case None =>
            open = Some(OpenSession(tsec, tsec, 1L, value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close once the watermark passes lastSec + gap
        state.setTimeoutTimestamp((s.lastSec * 1000).toLong + gapSec * 1000)
      }
      out.iterator
    }

    events
      // the watermark column itself must flow INTO the stateful operator
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF()
  }

  /** Stream-stream interval join: each purchase matched to the same user's
    * views in the preceding hour. Both sides watermarked and the join
    * condition time-bounded, so the state store evicts rows once the
    * watermark passes the bound — state is O(events inside the interval),
    * never O(stream) — the contract that keeps a streaming join alive at
    * 100 TB/day. Inner joins emit matches eagerly (no watermark wait), so
    * an AvailableNow run produces exactly the batch join's rows.
    */
  def purchaseViewJoin(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "1 hour")
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
      col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .select(
        col("purchase_id"), col("view_id"), col("user_id"),
        col("purchase_value").cast("double").as("purchase_value"))
  }

  /** Default state-partition count for the fixture-tier streams. Stateful
    * operators pay a per-partition, per-micro-batch fixed cost (state-store
    * open/commit/snapshot against the checkpoint dir; a stream-stream join
    * runs FOUR stores per partition), measured at ~250 ms/partition/batch —
    * so state partitioning must be sized to STATE VOLUME, not inherited
    * from the session's batch shuffle width: at 32 partitions the interval
    * join reads ~8.7 s per run, at 8 it reads ~3.0 s, with identical
    * results. A production deployment sizes this as state bytes / target
    * store size (and can only grow it by starting a fresh checkpoint —
    * Spark pins it per checkpoint); the fixture tiers' watermark-bounded
    * state fits comfortably in 8.
    */
  val defaultStatePartitions: Int = 8

  /** Runs a streaming transform to completion over the fixture files with
    * `Trigger.AvailableNow` and returns the result as a batch DataFrame.
    * Used by the verify harness so the streaming path is
    * DuckDB-oracle-checkable.
    *
    * The sink is a parquet FILE sink read back after termination — NOT the
    * memory sink: the memory sink collects every result row onto the
    * driver heap, which held to the ×10 tier but OOM'd an 8g driver at
    * ×100 (`stream_dedup` emits ~10M wide rows there). The file round-trip
    * keeps the result distributed end-to-end (executors → parquet →
    * batch scan) at the cost of one scratch write, which is the only
    * shape that survives a 100 TB stream.
    *
    * The stream runs on a CLONED session (`spark.newSession()` — shared
    * SparkContext, independent SQLConf) with `spark.sql.shuffle.partitions`
    * set to `statePartitions`, so stateful-operator state is partitioned by
    * state volume while the caller's session — and any concurrent analysis
    * in it — keeps its batch shuffle width untouched.
    */
  def runToBatch(
      spark: SparkSession,
      sfDir: String,
      transform: DataFrame => DataFrame,
      queryName: String,
      statePartitions: Int = defaultStatePartitions): DataFrame = {
    val streamSession = spark.newSession()
    streamSession.conf.set("spark.sql.shuffle.partitions", statePartitions)
    // RocksDB state store: the 100 TB posture. The default HDFS-backed
    // provider keeps every stateful operator's state in executor HEAP —
    // fine at fixture scale, an OOM at production state volumes. RocksDB
    // spills to local disk with bounded memory, at equal results (the
    // provider is a storage backend, not a semantics change; the
    // state-partition sizing note above still governs per-batch cost).
    // SPARK_GRAFT_STATE_STORE=hdfs restores the in-memory provider for
    // A/B measurement.
    if (!sys.env.get("SPARK_GRAFT_STATE_STORE").contains("hdfs")) {
      streamSession.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: commit the per-batch DELTA instead of a
      // full RocksDB snapshot per store per trigger — the snapshot upload
      // was 1-3x per-row overhead in the x100 A/B (stream_purchase_views
      // runs 4 stores x 8 partitions x every micro-batch)
      streamSession.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
    }
    val out = transform(readEvents(streamSession, sfDir))
    // pid-scoped scratch: a world-shared path would let a concurrent
    // process running the same queryName delete this run's live
    // checkpoint mid-stream (and read back the wrong rows). The returned
    // DataFrame stays lazily backed by these files, so cleanup is
    // deferred to the next same-process run / tmp reaping, not done here.
    sweepStaleScratch
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_" +
      s"${ProcessHandle.current().pid()}_$queryName"
    // fresh scratch per run: a stale sink dir + fresh checkpoint would
    // double rows (AvailableNow re-offers all input under a new query id)
    deleteRecursively(new java.io.File(base))
    val q = out.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    try spark.read.parquet(s"$base/out")
    catch {
      // zero micro-batches committed → no part files to infer from
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], out.schema)
    }
  }

  /** Key → hash-bucket of the merge-on-write index layout. A pure
    * function of the key, so it never needs storing: reads of raw version
    * dirs re-derive it.
    */
  private def bucketOf(key: Column, numBuckets: Int): Column =
    pmod(xxhash64(key), lit(numBuckets.toLong)).cast("int")

  /** Pins the index's bucket count in the index itself. The bucket
    * function must be IDENTICAL across every batch that ever merged into
    * an index — a caller re-opening an existing index with a different
    * `numBuckets` would re-hash keys into different buckets, silently
    * missing prior rows in the merge and leaving duplicate keys across
    * buckets. The count is written once at index creation and every
    * later invocation is held to it (fail-fast, never silent corruption).
    */
  private def pinnedNumBuckets(indexDir: String, requested: Int): Int = {
    require(requested > 0, s"numBuckets must be positive, got $requested")
    val meta = new java.io.File(indexDir, "_num_buckets")
    if (meta.isFile) {
      val pinned = new String(
        java.nio.file.Files.readAllBytes(meta.toPath), "UTF-8").trim.toInt
      require(pinned == requested,
        s"index $indexDir was created with numBuckets=$pinned; " +
          s"re-opening it with numBuckets=$requested would corrupt the " +
          "bucket layout (rebuild the index to change the count)")
      pinned
    } else {
      new java.io.File(indexDir).mkdirs()
      java.nio.file.Files.write(meta.toPath, requested.toString.getBytes("UTF-8"))
      requested
    }
  }

  /** Latest committed version number under one `bucket=<b>` dir. */
  private def latestVersion(bucketDir: java.io.File): Option[Long] =
    Option(bucketDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.stripPrefix("v").toLong).sorted.lastOption

  private def bucketDirs(indexDir: String): Seq[java.io.File] =
    Option(new java.io.File(indexDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))

  /** Removes everything a crashed run can leave behind that the
    * per-commit prune would not reach: stale `.staging_*` dirs and, in
    * EVERY bucket, all versions older than the latest — commitBuckets
    * prunes only the buckets a batch touches, so an orphan in a bucket
    * no later batch ever touches again would otherwise leak forever.
    * Safe at stream start: the latest committed version is always the
    * valid one (a crash between rename and checkpoint-commit replays the
    * same batch, whose idempotent merge reads that latest version).
    */
  private def sweepStaleCommits(indexDir: String): Unit = {
    Option(new java.io.File(indexDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(".staging_"))
      .foreach(deleteRecursively)
    bucketDirs(indexDir).foreach { bd =>
      latestVersion(bd).foreach { latest =>
        Option(bd.listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("v") &&
            f.getName != s"v$latest")
          .foreach(deleteRecursively)
      }
    }
  }

  /** Commits `merged` (rows of the touched buckets, carrying a `bucket`
    * column) as version `v<batchId>` of each touched bucket: one
    * partitioned staging write, then a per-bucket dir rename (the atomic
    * commit), then pruning of every other version in the touched bucket —
    * not just the one this batch read: a crash between a prior batch's
    * rename and its prune can orphan an older version, and pruning only
    * the known-replaced one would leak it ([[sweepStaleCommits]] covers
    * orphans in buckets never touched again). Checkpoint replay only
    * ever re-runs the LAST uncommitted batch, so anything other than
    * `v<batchId>` is strictly stale. Untouched buckets are never read,
    * written, or renamed — their files stay byte-identical, which is the
    * whole point of the layout.
    */
  private def commitBuckets(
      merged: DataFrame,
      indexDir: String,
      batchId: Long,
      touched: Seq[Int]): Unit = {
    if (touched.isEmpty) return
    val staging = new java.io.File(s"$indexDir/.staging_v$batchId")
    deleteRecursively(staging)
    // co-locate each bucket in one task before the partitioned write: ONE
    // parquet file per bucket version. Plain task-partitioned writes made
    // (tasks x buckets) shards — 32k files for a 1024-bucket bulk load,
    // measured 116.6s vs 12.9s co-located. Salting the shuffle key to
    // raise write parallelism above the bucket count was measured and
    // REJECTED: a key-salt at nb=1024 read the x100 bulk load at 24.1s vs
    // 12.4s (4x the files, zero parallelism gain), and even in its target
    // case — 8 buckets on 32 cores — a warmed A/B read build 6.6s/incr
    // 2.6s salted vs 6.3s/2.2s unsalted at x10: the 8-task write stage is
    // never the bottleneck, and extra files tax every later read.
    merged.repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(staging.getPath)
    touched.foreach { b =>
      val src = new java.io.File(staging, s"bucket=$b")
      if (src.isDirectory) {
        val bucketDir = new java.io.File(s"$indexDir/bucket=$b")
        bucketDir.mkdirs()
        val dst = new java.io.File(bucketDir, s"v$batchId")
        // An existing v<batchId> can only have come from a prior attempt
        // of THIS batch completing its rename — and rename is atomic, so
        // it holds a complete staged dir, and the merge is idempotent, so
        // its content is exactly what this attempt staged. KEEP it rather
        // than delete-and-re-rename: deleting the bucket's only committed
        // version first would open a crash window (between delete and
        // rename, after the replay's own startup already wiped the
        // staging dir) in which the bucket has ZERO versions and the next
        // replay would silently commit the delta alone, losing every key
        // earlier batches merged into this bucket.
        if (!dst.isDirectory)
          require(src.renameTo(dst), s"commit rename failed: $src -> $dst")
        Option(bucketDir.listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("v") &&
            f.getName != s"v$batchId")
          .foreach(deleteRecursively)
      }
    }
    deleteRecursively(staging)
  }

  /** The shared per-micro-batch maintenance sequence of both
    * merge-on-write index families — kept in ONE place because every line
    * is crash-safety-critical: persist the batch's bucketed delta, find
    * the touched buckets (bounded collect: at most `nb` values) and their
    * latest committed versions, `merge` the old rows with the delta, and
    * commit the result as each touched bucket's next version.
    *
    * `bucketed` must already carry the `bucket` column (via [[bucketOf]]
    * on `keyCol`); `merge(old, delta)` defines the index's semantics —
    * re-min for [[firstSeenIndex]], last-writer-wins for
    * [[onlineUserRefresh]] — and must be idempotent under checkpoint
    * replay of the same delta.
    */
  private def mergeTouchedBuckets(
      indexDir: String,
      nb: Int,
      batchId: Long,
      bucketed: DataFrame,
      keyCol: String)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = bucketed.sparkSession
    val delta = bucketed.persist()
    try {
      val touched = delta.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val replaced = touched.flatMap { b =>
        latestVersion(new java.io.File(s"$indexDir/bucket=$b")).map(b -> _)
      }.toMap
      val oldPaths = replaced.toSeq.sorted
        .map { case (b, v) => s"$indexDir/bucket=$b/v$v" }
      val merged =
        if (oldPaths.isEmpty) delta
        else merge(
          spark.read.parquet(oldPaths: _*)
            .withColumn("bucket", bucketOf(col(keyCol), nb)),
          delta)
      commitBuckets(merged, indexDir, batchId, touched)
    } finally delta.unpersist(blocking = false): Unit
  }

  /** Micro-batch merge-on-write index maintenance via `foreachBatch`: for
    * a streaming `(content_hash, event_id)` frame, keeps a parquet index
    * of the FIRST event id seen per content hash. This is the streaming
    * twin of [[graft.ops.Dedup.exactHashIndex]] — the daily-crawl index
    * that batch `dedup_incremental` consults, kept fresh by the stream
    * itself.
    *
    * Layout: `indexDir/bucket=<b>/v<batchId>/` — the index is hash-bucket
    * partitioned on the key (`numBuckets` dirs), and each micro-batch
    * reads, re-mins, and rewrites ONLY the buckets its keys hash into.
    * Per-trigger cost is O(touched buckets × bucket size), i.e. O(batch)
    * once `numBuckets` is sized so a bucket holds a bounded key range —
    * NOT O(index), which a full-index rewrite pays and which is fatal at
    * 100 TB where the index dwarfs every batch. Versioned per-bucket
    * commit: a reader takes each bucket's latest `v` dir, the writer
    * renames a staged dir in and prunes the replaced version after.
    *
    * Exactly-once posture: the merge is `min`, a commutative/idempotent
    * reduction, so a replayed micro-batch (checkpoint recovery re-offers
    * the same files) converges to the same index instead of double
    * counting — the property that makes merge-on-write safe without a
    * transactional table format. At scale the index would live in a
    * transactional format with compaction; the per-bucket versioned-dir
    * swap is the format-free equivalent, and the merge plan (touched old
    * buckets ∪ batch minima → re-min) shuffles only hashes and ids,
    * never payloads.
    */
  def firstSeenIndex(
      keyed: DataFrame,
      indexDir: String,
      checkpointDir: String,
      numBuckets: Int = 8): Unit = {
    val nb = pinnedNumBuckets(indexDir, numBuckets)
    sweepStaleCommits(indexDir)
    val q = keyed.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val newMin = batch
          .withColumn("bucket", bucketOf(col("content_hash"), nb))
          .groupBy("bucket", "content_hash")
          .agg(min(col("event_id")).as("first_event_id"))
        mergeTouchedBuckets(indexDir, nb, batchId, newMin, "content_hash") {
          (old, delta) =>
            old.unionByName(delta)
              .groupBy("bucket", "content_hash")
              .agg(min(col("first_event_id")).as("first_event_id"))
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Online user-factor refresh: every micro-batch of ratings folds its
    * users into the model (one exact ALS-WR half-step against the FIXED
    * item factors — [[graft.als.GraftALSModel.foldInUsers]]) and merges
    * them into a versioned factor table, newest fold-in winning per user.
    * Continuous personalization without retraining: a user's factor
    * refreshes within one micro-batch of their new ratings, while the
    * item side stays the (periodically retrained) batch model.
    *
    * The merge is last-writer-wins per user id, so a checkpoint-replayed
    * batch converges to the same table. Same hash-bucketed layout and
    * per-bucket versioned commit as [[firstSeenIndex]]: each micro-batch
    * anti-joins and rewrites ONLY the buckets containing its users —
    * O(touched buckets), not O(factor table) — while untouched buckets'
    * files are never opened.
    */
  def onlineUserRefresh(
      ratings: DataFrame,
      model: graft.als.GraftALSModel,
      regParam: Double,
      factorsDir: String,
      checkpointDir: String,
      numBuckets: Int = 8): Unit = {
    val nb = pinnedNumBuckets(factorsDir, numBuckets)
    sweepStaleCommits(factorsDir)
    val q = ratings.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val folded = model.foldInUsers(batch, regParam)
          .withColumn("updated_batch", lit(batchId))
          .withColumn("bucket", bucketOf(col("id"), nb))
        mergeTouchedBuckets(factorsDir, nb, batchId, folded, "id") {
          // newest fold-in wins per user; untouched users carry forward
          (old, delta) =>
            old.join(delta.select("id"), Seq("id"), "left_anti")
              .unionByName(delta)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The current contents of a [[firstSeenIndex]]/[[onlineUserRefresh]]
    * directory: the union of every bucket's latest committed version.
    * (`bucket` is a pure function of the key, re-derivable — so version
    * dirs are read raw and the column is simply absent here.)
    */
  def latestIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val paths = bucketDirs(indexDir)
      .flatMap(bd => latestVersion(bd).map(v => s"${bd.getPath}/v$v"))
    require(paths.nonEmpty, s"no committed index version under $indexDir")
    spark.read.parquet(paths: _*)
  }

  /** Deletes `graft_stream_<pid>_*` scratch dirs left by DEAD processes:
    * the per-run delete above only covers this pid's own paths, so repeated
    * bench/verify JVMs would otherwise accumulate multi-GB parquet +
    * checkpoint dirs in java.io.tmpdir at the scale tiers. Live pids
    * (including this one) are never touched, and — because pid liveness is
    * only observable inside THIS process's pid namespace — a dir is also
    * kept while ANYTHING under it was written in the last 5 minutes: a
    * live stream writes continuously (state-store files, sink parts,
    * offsets/commits every micro-batch — the scan is full-depth precisely
    * so a long micro-batch's deep state writes count), so a pid-dead AND
    * everywhere-quiet dir is not a live sibling-container run whose pid
    * is merely invisible here. The scan only runs for pid-dead candidate
    * dirs (&&-short-circuit), so the live-path cost is zero. Runs once
    * per JVM.
    */
  private lazy val sweepStaleScratch: Unit = {
    val self = ProcessHandle.current().pid()
    val re = "graft_stream_(\\d+)_.*".r
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val staleAfterMs = 5L * 60 * 1000
    def newestMtime(f: java.io.File): Long = {
      val own = f.lastModified()
      if (!f.isDirectory) own
      else (own +: Option(f.listFiles()).toSeq.flatten.map(newestMtime)).max
    }
    Option(tmp.listFiles()).toSeq.flatten.filter(_.isDirectory).foreach { f =>
      f.getName match {
        case re(pidStr) =>
          val pid = pidStr.toLong
          val alive = pid == self || {
            val h = ProcessHandle.of(pid)
            h.isPresent && h.get.isAlive
          }
          if (!alive &&
            System.currentTimeMillis() - newestMtime(f) > staleAfterMs)
            deleteRecursively(f)
        case _ => ()
      }
    }
  }

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
