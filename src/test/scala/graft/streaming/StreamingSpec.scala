package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals batch agg on emitted (closed) windows") {
    val streamed = EventsStream.runToBatch(
      spark, sfDir, EventsStream.windowedAgg(_), "spec_windowed")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val events = Tables.load(spark, sfDir, "events")
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val batch = events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("s"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"), col("n"), col("s"))
      .where(col("ws") + 86400 <= maxTs - 3600) // append mode emits only watermark-closed windows
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventsStream.runToBatch(
      spark, sfDir, EventsStream.purchaseViewJoin(_), "spec_pv_join")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    val events = Tables.load(spark, sfDir, "events")
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val v = events.where(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vts"))
    val batch = p.join(v,
      col("pu") === col("vu") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("vts") <= col("pts"))
      .select("pid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    assert(batch.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark removes replayed event ids") {
    import spark.implicits._
    val events = Tables.load(spark, sfDir, "events").limit(50)
    // replay the same 50 events twice through a memory-backed stream
    val doubled = events.union(events)
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-dup").toString
    // the stream source expects the fixture layout: a single FILE named
    // events.parquet directly under the dir (a part-file directory would not
    // match the pathGlobFilter) — write then promote the lone part file
    doubled.coalesce(1).write.mode("overwrite").parquet(s"$tmp/_staging")
    val part = new java.io.File(s"$tmp/_staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(
      part.toPath, java.nio.file.Paths.get(s"$tmp/events.parquet"))
    val out = EventsStream.runToBatch(
      spark, tmp, EventsStream.dedupedEvents(_), "spec_dedup")
    assert(out.count() == 50)
    assert(out.select("event_id").distinct().count() == 50)
  }

  test("incremental ratings stream produces per-day user/item averages") {
    val out = EventsStream.runToBatch(
      spark, sfDir, EventsStream.incrementalRatings(_), "spec_ratings")
    assert(out.columns.toSeq == Seq("window_start", "user_id", "item_id", "rating"))
    assert(out.count() > 0)
    assert(out.where(col("rating").isNull).count() == 0)
  }

  test("stateful sessionizer equals batch islands minus each user's open session") {
    val streamed = EventsStream.runToBatch(
      spark, sfDir, EventsStream.sessionizeStateful(_), "spec_sessions")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // batch islands oracle (plain Scala, from the raw events)
    val events = Tables.load(spark, sfDir, "events")
      .selectExpr("user_id", "cast(ts as double) as tsec", "value")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // final watermark after the availableNow run: max event time - 1h delay
    val watermarkSec = events.map(_._2).max - 3600.0
    val expected = events.groupBy(_._1).flatMap { case (user, rows) =>
      val sorted = rows.sortBy(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Double, Double)]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
      sorted.foreach { e =>
        if (cur.nonEmpty && e._2 - cur.last._2 > 1800) {
          sessions += cur.toSeq
          cur = scala.collection.mutable.ArrayBuffer.empty
        }
        cur += e
      }
      // the trailing session is emitted too IF the final watermark passed
      // its gap timeout; otherwise it stays open in state
      if (cur.nonEmpty && cur.last._2 + 1800.0 <= watermarkSec) sessions += cur.toSeq
      sessions.map { s =>
        (user, s.head._2.toLong) -> (s.size.toLong, s.map(_._3).sum)
      }
    }.toMap

    assert(streamed.keySet == expected.keySet,
      s"session keys differ: streamed=${streamed.size} expected=${expected.size}")
    streamed.foreach { case (k, (n, sum)) =>
      assert(n == expected(k)._1, s"session $k count")
      assert(math.abs(sum - expected(k)._2) < 1e-6, s"session $k sum")
    }
    assert(streamed.nonEmpty)
  }

  test("built-in session_window agrees with the stateful sessionizer on closed sessions") {
    val stateful = EventsStream.runToBatch(
      spark, sfDir, EventsStream.sessionizeStateful(_), "spec_sessions_sw_a")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val declarative = EventsStream.runToBatch(
      spark, sfDir, EventsStream.sessionWindows(_), "spec_sessions_sw_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // session_window emits only watermark-closed sessions too; every session
    // it emits must exist in the stateful output with the same event count
    declarative.foreach { case (k, n) =>
      assert(stateful.get(k).contains(n), s"session $k: declarative=$n stateful=${stateful.get(k)}")
    }
  }

  test("streamed ratings feed ALS end-to-end (stream -> accumulate -> train)") {
    // the production pattern: streaming job lands incremental ratings; a
    // periodic batch job aggregates the accumulated table and (re)trains
    val streamed = EventsStream.runToBatch(
      spark, sfDir, EventsStream.incrementalRatings(_), "spec_train_ratings")
    val ratings = streamed
      .groupBy("user_id", "item_id")
      .agg(avg("rating").as("rating"))
    val model = graft.als.GraftALS(
      rank = 4, maxIter = 3, regParam = 0.1,
      numUserBlocks = 2, numItemBlocks = 2,
      userCol = "user_id", itemCol = "item_id", ratingCol = "rating", seed = 5)
      .fit(ratings)
    val scored = model.transform(ratings)
    assert(scored.count() == ratings.count())
    assert(scored.where(isnan(col("prediction"))).count() == 0)
  }

  test("onlineUserRefresh folds streamed ratings into per-user factors incrementally") {
    val spark2 = spark
    import spark2.implicits._
    // a small trained model to fold against
    val rng = new scala.util.Random(31L)
    val train = (for { u <- 0 until 20; i <- 0 until 15 if rng.nextDouble() < 0.5 }
      yield (u.toLong, i.toLong, (1.0 + 4.0 * rng.nextDouble()).toFloat))
      .toDF("user", "item", "rating")
    val model = graft.als.GraftALS(
      rank = 4, maxIter = 3, regParam = 0.1,
      numUserBlocks = 2, numItemBlocks = 2,
      userCol = "user", itemCol = "item", ratingCol = "rating", seed = 7L)
      .fit(train)
    val root = java.nio.file.Files.createTempDirectory("graft_our").toString
    // batch 1 introduces users 100,101; batch 2 re-rates 100 (must win)
    Seq((100L, 0L, 5.0f), (100L, 1L, 4.0f), (101L, 2L, 3.0f))
      .toDF("user", "item", "rating").coalesce(1).write.parquet(s"$root/src/f1")
    Seq((100L, 0L, 1.0f), (100L, 3L, 2.0f))
      .toDF("user", "item", "rating").coalesce(1).write.parquet(s"$root/src/f2")
    val stream = spark.readStream
      .schema("user BIGINT, item BIGINT, rating FLOAT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src/*")
    EventsStream.onlineUserRefresh(stream, model, regParam = 0.1,
      s"$root/factors", s"$root/ck")
    val got = EventsStream.latestIndex(spark, s"$root/factors")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[scala.collection.Seq[Float]](1).toArray, r.getAs[Long]("updated_batch"))))
      .toMap
    assert(got.keySet == Set(100L, 101L))
    // user 100's factor reflects the LATEST batch: equal to a direct
    // fold-in of only the second batch's ratings
    val direct = model.foldInUsers(
      Seq((100L, 0L, 1.0f), (100L, 3L, 2.0f)).toDF("user", "item", "rating"),
      regParam = 0.1).collect().head.getAs[scala.collection.Seq[Float]](1).toArray
    assert(got(100L)._1.zip(direct).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    // file order maps f1 -> batch 0, f2 -> batch 1
    assert(got(100L)._2 > got(101L)._2)
    // the LWW index maintains the manifest through the shared commit path
    // exactly as the min index does: snapshot + append log resolve to one
    // entry per live generation, matching directory truth
    val manifest = new java.io.File(s"$root/factors", "_manifest")
    assert(manifest.isFile, "onlineUserRefresh did not maintain the manifest")
    val lines = EventsStream.readManifest(s"$root/factors").get
      .flatMap { case (b, gens) => gens.map(g => s"$b/$g") }.toSet
    val walked = new java.io.File(s"$root/factors").listFiles()
      .filter(_.getName.startsWith("bucket=")).flatMap { bd =>
        bd.listFiles().filter(_.isDirectory)
          .map(g => s"${bd.getName.stripPrefix("bucket=")}/${g.getName}")
      }.toSet
    assert(lines == walked, s"manifest $lines != dirs $walked")
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("firstSeenIndex merges across micro-batches to the global minimum") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsi").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    // three source files -> maxFilesPerTrigger=1 forces three micro-batches;
    // key "b" spans batches with a LOWER id arriving in a later batch
    Seq(("a", 10L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("b", 5L), ("c", 30L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    Seq(("a", 40L), ("d", 50L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f3")
    val keyed = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    EventsStream.firstSeenIndex(keyed, idx, ck)
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 10L, "b" -> 5L, "c" -> 30L, "d" -> 50L))
    // append-only layout: every bucket dir holds only recognized
    // generation dirs, and at most compactEvery live deltas
    val buckets = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(buckets.nonEmpty)
    buckets.foreach { b =>
      val gens = b.listFiles().map(_.getName)
      assert(gens.forall(n => n.startsWith("base-") || n.startsWith("delta-")),
        s"${b.getName} holds unrecognized dirs: ${gens.mkString(",")}")
      assert(gens.count(_.startsWith("delta-")) <= 8,
        s"${b.getName} kept ${gens.length} deltas past the compaction bound")
    }
    // re-running against the same checkpoint is a no-op (no new files)
    EventsStream.firstSeenIndex(keyed, idx, ck)
    val again = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("startup sweep removes crash leftovers: folded generations and stale staging dirs") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsio").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    Seq(("a", 10L)).toDF("k", "event_id").coalesce(1).write.parquet(s"$src/f1")
    Seq(("a", 40L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    // compactEvery=2: the second batch folds both deltas into base-2
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 1, compactEvery = 2)
    val bucketDir = new java.io.File(idx, "bucket=0")
    assert(bucketDir.listFiles().map(_.getName).toSet == Set("base-2"))
    val want = Map("a" -> 10L, "b" -> 20L)
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    // a crash between a compaction's base rename and its prune leaves the
    // folded generations behind; they are non-live (seq <= base) so reads
    // ignore them, and the startup sweep must remove them — plus any
    // stale staging dir — even if NO later batch ever touches the bucket
    new java.io.File(bucketDir, "delta-1-b0-deadbeef").mkdirs()
    new java.io.File(bucketDir, "base-1").mkdirs()
    new java.io.File(idx, ".staging_b99-deadbeef/bucket=0").mkdirs()
    // ...and a manifest tmp from a writer that crashed pre-rename
    java.nio.file.Files.write(
      new java.io.File(idx, "._manifest_tmp_99999").toPath,
      "0/base-1\n".getBytes("UTF-8"))
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 1, compactEvery = 2)
    assert(bucketDir.listFiles().map(_.getName).toSet == Set("base-2"),
      "startup sweep left folded generations behind")
    assert(!new java.io.File(idx, ".staging_b99-deadbeef").exists(),
      "startup sweep left the stale staging dir")
    assert(!new java.io.File(idx, "._manifest_tmp_99999").exists(),
      "startup sweep left the crashed manifest tmp")
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("a fresh checkpoint over an existing index resolves idempotently (duplicate deltas)") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsir").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    Seq(("a", 10L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("b", 5L), ("c", 30L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, ck)
    val want = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want == Map("a" -> 10L, "b" -> 5L, "c" -> 30L))
    // a FRESH checkpoint re-offers every file with batch numbering
    // restarting at 0 — its deltas carry a NEW checkpoint id, so they are
    // NOT deduped against the old generation's b0 tag (they are genuinely
    // new commits); the min resolution folds the duplicates away
    EventsStream.firstSeenIndex(stream, idx, s"$root/ck2")
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("a fresh checkpoint's batch 0 with NEW keys is never deduped against an old batch 0") {
    // the round-11 design deduped replays by batchId alone: re-using an
    // index under a fresh checkpoint (batchIds restart at 0) silently
    // DROPPED a new batch-0 delta in any bucket whose latest version was
    // v0 — the delta tag now namespaces batchIds by checkpoint query id
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsin").toString
    val (src, idx) = (s"$root/src", s"$root/idx")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    Seq(("a", 10L)).toDF("k", "event_id").coalesce(1).write.parquet(s"$src/f1")
    // numBuckets=1 forces the new keys into a bucket that already has a
    // batch-0 delta from the first checkpoint generation
    EventsStream.firstSeenIndex(stream, idx, s"$root/ck1", numBuckets = 1)
    Seq(("fresh_key", 99L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, s"$root/ck2", numBuckets = 1)
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 10L, "fresh_key" -> 99L),
      s"fresh checkpoint's batch-0 keys were lost: $got")
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("a batch touching EVERY bucket appends O(batch) deltas without rewriting bases") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsia").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    // bulk load 64 keys across all 8 buckets, compacted to one base each —
    // the bulk-maintenance mode folds everything in one trigger
    // (compactBucketsPerTrigger = MaxValue); steady-state streaming keeps
    // the default per-trigger cap instead
    (0 until 64).map(i => (s"key_$i", 1000L + i)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    EventsStream.firstSeenIndex(stream, idx, ck, compactEvery = 1,
      compactBucketsPerTrigger = Int.MaxValue)
    def files(prefix: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(idx)).filter(_.getPath.contains(prefix))
        .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    }
    val basesBefore = files("/base-")
    assert(basesBefore.nonEmpty)
    // the large-batch regime: a second 64-key batch also spans all 8
    // buckets — the round-11 read-modify-write design rewrote the whole
    // index here; the append-only commit must write ONLY delta dirs,
    // leaving every base file byte-identical
    (0 until 64).map(i => (s"other_$i", 2000L + i)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, ck, compactEvery = 8)
    assert(files("/base-") == basesBefore,
      "an all-bucket batch rewrote base generations (O(index) write)")
    val deltaCounts = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.startsWith("delta-")))
    assert(deltaCounts.forall(_ == 1), s"deltas per bucket: ${deltaCounts.toSeq}")
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 128 && got("key_3") == 1003L && got("other_3") == 2003L)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("compaction folds a bucket's deltas into one base at the threshold") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsic").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    Seq(("a", 10L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("b", 5L), ("c", 30L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    Seq(("a", 40L), ("d", 50L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f3")
    // batch 0 -> delta-1; batch 1 -> delta-2 then compaction to base-2;
    // batch 2 -> delta-3 on top of the base
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 1, compactEvery = 2)
    val bucketDir = new java.io.File(idx, "bucket=0")
    val names = bucketDir.listFiles().map(_.getName).sorted
    assert(names.length == 2 && names(0) == "base-2" &&
      names(1).startsWith("delta-3-b2-"), s"bucket holds: ${names.mkString(",")}")
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 10L, "b" -> 5L, "c" -> 30L, "d" -> 50L))
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("rebucketIndex preserves contents and the stream resumes under the new count") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsiw").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    Seq(("a", 10L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("b", 5L), ("c", 30L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 2)
    val want = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // offline growth path: 2 -> 8 buckets, contents must be identical
    EventsStream.rebucketIndex(spark, idx, 8)
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idx, "_num_buckets")), "UTF-8").trim == "8")
    // the old count is now rejected...
    Seq(("d", 50L), ("a", 5L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f3")
    val e = intercept[Exception](
      EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 2))
    assert(e.getMessage != null && e.getMessage.contains("numBuckets"))
    // ...and the SAME checkpoint resumes under the new count, merging the
    // next batch into the re-bucketed layout
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 8)
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 5L, "b" -> 5L, "c" -> 30L, "d" -> 50L))
    // crash window between swap-out and swap-in: indexDir absent, contents
    // parked at .rebucket_old — a stream start must REFUSE to create a
    // fresh empty index (that would silently lose every key)...
    assert(new java.io.File(idx).renameTo(new java.io.File(s"$idx.rebucket_old")))
    Seq(("e", 60L)).toDF("k", "event_id").coalesce(1).write.parquet(s"$src/f4")
    val crash = intercept[Exception](
      EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 8))
    assert(crash.getMessage != null && crash.getMessage.contains("rebucket"))
    // ...and re-running the rebucket self-recovers, after which the stream
    // continues with nothing lost
    EventsStream.rebucketIndex(spark, idx, 8)
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 8)
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      got + ("e" -> 60L))
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("firstSeenIndex rewrites ONLY the buckets a batch's keys hash into") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsib").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    // run 1: 64 keys spread across all 8 buckets
    (0 until 64).map(i => (s"key_$i", 1000L + i)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    EventsStream.firstSeenIndex(stream, idx, ck)
    // snapshot every committed file: untouched buckets must stay
    // byte-identical (same paths, lengths, mtimes) across the next batch
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(idx))
        // the manifest (snapshot + append log) is O(metadata) maintained
        // at every commit by design — the byte-identity contract is about
        // bucket DATA files
        .filterNot(f => f.getName == "_manifest" || f.getName == "_manifest.log")
        .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    }
    val before = snapshot()
    // run 2 (same checkpoint — AvailableNow offers only the new file):
    // ONE new key, whose bucket we derive with the layout's own hash
    val newKey = "key_one_more"
    val touchedBucket = Seq(newKey).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8L)).cast("int")).head().getInt(0)
    Seq((newKey, 7L)).toDF("k", "event_id").coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, ck)
    val after = snapshot()
    val touchedPrefix = s"$idx/bucket=$touchedBucket/"
    // untouched buckets: identical file set and metadata
    assert(before.view.filterKeys(!_.startsWith(touchedPrefix)).toMap ==
      after.view.filterKeys(!_.startsWith(touchedPrefix)).toMap,
      "an untouched bucket was rewritten")
    // the touched bucket WAS rewritten (new version dir)
    assert(before.keySet.filter(_.startsWith(touchedPrefix)) !=
      after.keySet.filter(_.startsWith(touchedPrefix)))
    // and the merged content is still the global minimum per key
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 65 && got(newKey) == 7L && got("key_0") == 1000L)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("re-opening an index with a different numBuckets fails fast instead of corrupting it") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsip").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    Seq(("a", 1L)).toDF("k", "event_id").coalesce(1).write.parquet(s"$src/f1")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 8)
    // a different count would re-hash keys into different buckets and the
    // merge would silently miss prior rows — the pinned meta rejects it
    Seq(("b", 2L)).toDF("k", "event_id").coalesce(1).write.parquet(s"$src/f2")
    val e = intercept[Exception](
      EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 16))
    assert(e.getMessage != null && e.getMessage.contains("numBuckets"))
    // the SAME count continues cleanly
    EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 8)
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L))
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("the manifest names every live generation, drives reads, and self-repairs") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsim").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    Seq(("a", 10L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("b", 5L), ("c", 30L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, ck)
    val manifestFile = new java.io.File(idx, "_manifest")
    assert(manifestFile.isFile, "commit did not maintain the manifest")
    def walkLive(): Set[String] = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("bucket=")).flatMap { bd =>
        bd.listFiles().filter(_.isDirectory)
          .map(g => s"${bd.getName.stripPrefix("bucket=")}/${g.getName}")
      }.toSet
    def manifestLines(): Set[String] =
      EventsStream.readManifest(idx).get
        .flatMap { case (b, gens) => gens.map(g => s"$b/$g") }.toSet
    // after the startup sweep every on-disk generation is live, so the
    // manifest (snapshot + log) must equal the directory truth exactly
    assert(manifestLines() == walkLive(),
      s"manifest ${manifestLines()} != dirs ${walkLive()}")
    val want = Map("a" -> 10L, "b" -> 5L, "c" -> 30L)
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    // reads go THROUGH the manifest: a hand-written manifest naming only a
    // subset of generations changes what latestIndex returns (no dir walk).
    // The headerless subset is the LEGACY snapshot form (epoch 0), so the
    // current run's log — whose records are at a later epoch — must go
    // too, exactly as it would for a genuinely legacy index.
    val subset = manifestLines().filter(_.contains("delta-1-"))
    new java.io.File(idx, "_manifest.log").delete()
    java.nio.file.Files.write(manifestFile.toPath,
      subset.mkString("", "\n", "\n").getBytes("UTF-8"))
    val partial = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(partial == Map("a" -> 10L, "b" -> 20L),
      s"latestIndex did not read via the manifest: $partial")
    // a MISSING manifest falls back to the directory walk (legacy index)...
    assert(manifestFile.delete())
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    // ...and the next writer start rebuilds it from directory truth — the
    // repair path for every crash window between a data rename and the
    // manifest write
    EventsStream.firstSeenIndex(stream, idx, ck)
    assert(manifestFile.isFile && manifestLines() == walkLive())
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("concurrent manifest readers across fold boundaries: no crash, committed states only") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsic").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    // 24 one-file micro-batches with a fold every 2 appended records: the
    // stream crosses MANY fold boundaries (snapshot rewrite + log delete)
    // while reader threads hammer readManifest nonstop — the fold-delete
    // TOCTOU window (round-14 ADVICE, medium) and the epoch-skip path
    // under real concurrency, not hand-staged file states.
    (0 until 24).foreach { i =>
      Seq((s"k$i", i.toLong)).toDF("k", "event_id")
        .coalesce(1).write.parquet(s"$src/f$i")
    }
    EventsStream.manifestFoldAppendsOverride = Some(2)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val someReads = new java.util.concurrent.atomic.AtomicLong(0)
    val noneReads = new java.util.concurrent.atomic.AtomicLong(0)
    val badStates = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (0 until 4).map { _ =>
      val t = new Thread(() => {
        while (!stop.get()) {
          try {
            EventsStream.readManifest(idx) match {
              case Some(m) =>
                someReads.incrementAndGet(): Unit
                // committed-state shape: every bucket maps to a non-empty
                // list of recognized generation names (readers must never
                // surface a half-applied record or a vanished-log crash)
                m.foreach { case (b, gens) =>
                  if (gens.isEmpty || !gens.forall(g =>
                      g.startsWith("base-") || g.startsWith("delta-")))
                    badStates.add(s"bucket $b -> $gens"): Unit
                }
              case None => noneReads.incrementAndGet(): Unit
            }
          } catch { case e: Throwable => errors.add(e): Unit }
        }
      })
      t.setDaemon(true)
      t.start()
      t
    }
    try EventsStream.firstSeenIndex(stream, idx, ck, numBuckets = 4)
    finally {
      stop.set(true)
      readers.foreach(_.join(5000))
      EventsStream.manifestFoldAppendsOverride = None
    }
    assert(errors.isEmpty, s"concurrent reader crashed: ${errors.peek()}")
    assert(someReads.get() > 0, "no successful concurrent reads — race not exercised")
    assert(badStates.isEmpty, s"uncommitted manifest state observed: ${badStates.peek()}")
    // after the run the manifest read equals directory truth and the data
    // answer is complete — concurrency left no lasting damage
    val mfFinal = EventsStream.readManifest(idx).get
      .map { case (b, g) => b -> g.toSet }
    val dirFinal = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("bucket=")).map { bd =>
        bd.getName.stripPrefix("bucket=").toInt ->
          bd.listFiles().filter(_.isDirectory).map(_.getName).toSet
      }.toMap
    assert(mfFinal == dirFinal, s"manifest $mfFinal != dirs $dirFinal")
    val got = EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == (0 until 24).map(i => s"k$i" -> i.toLong).toMap)
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("manifest log: O(touched) appends, epoch-safe folds, torn/garbage tails") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsil").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    def walkLive(): Map[Int, Set[String]] = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("bucket=")).map { bd =>
        bd.getName.stripPrefix("bucket=").toInt ->
          bd.listFiles().filter(_.isDirectory).map(_.getName).toSet
      }.toMap
    def mf(): Map[Int, Set[String]] =
      EventsStream.readManifest(idx).get.map { case (b, g) => b -> g.toSet }
    val snapFile = new java.io.File(idx, "_manifest")
    val logFile = new java.io.File(idx, "_manifest.log")
    def snapshotBytes(): String =
      new String(java.nio.file.Files.readAllBytes(snapFile.toPath), "UTF-8")

    // two files -> two commits in one run: writer start writes the
    // snapshot, each commit APPENDS (compactEvery high: no fold path yet)
    Seq(("a", 10L), ("b", 20L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("c", 30L)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f2")
    EventsStream.firstSeenIndex(stream, idx, ck, compactEvery = 100)
    assert(logFile.isFile, "commits did not append to the manifest log")
    val snapAfterRun = snapshotBytes()
    assert(snapAfterRun.startsWith("#epoch "), "snapshot lost its epoch header")
    assert(mf() == walkLive(), s"manifest ${mf()} != dirs ${walkLive()}")
    // the snapshot alone is STALE (start-of-run state: no deltas yet) —
    // proof the commits appended instead of rewriting it
    assert(!snapAfterRun.contains("delta-"),
      "a commit rewrote the snapshot instead of appending to the log")

    // torn trailing line (crash mid-append): ignored, read stays at truth
    val before = mf()
    java.nio.file.Files.write(logFile.toPath,
      "999 0/delta-77-torn".getBytes("UTF-8"), // no trailing newline
      java.nio.file.StandardOpenOption.APPEND)
    assert(mf() == before, "a torn tail changed the manifest read")

    // a COMPLETE malformed line is distrust -> dir-walk fallback: the
    // option goes None but latestIndex still answers from directory truth
    java.nio.file.Files.write(logFile.toPath,
      "\ngarbage-line\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    assert(EventsStream.readManifest(idx).isEmpty,
      "malformed log content must force the directory-walk fallback")
    val want = Map("a" -> 10L, "b" -> 20L, "c" -> 30L)
    assert(EventsStream.latestIndex(spark, idx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)

    // a log epoch AHEAD of the snapshot (impossible in normal operation)
    // is also distrust, not application
    java.nio.file.Files.write(logFile.toPath,
      "999999 0/base-1\n".getBytes("UTF-8"))
    assert(EventsStream.readManifest(idx).isEmpty,
      "a log record from the future must force the fallback")

    // crash-after-fold simulation: snapshot at a HIGHER epoch than every
    // log record (fold renamed the snapshot, crashed before the log
    // delete) — stale records are skipped, the read equals the snapshot
    val truthLines = walkLive().toSeq.sortBy(_._1).flatMap { case (b, gens) =>
      gens.toSeq.sorted.map(g => s"$b/$g") }.mkString("", "\n", "\n")
    java.nio.file.Files.write(snapFile.toPath,
      ("#epoch 7\n" + truthLines).getBytes("UTF-8"))
    java.nio.file.Files.write(logFile.toPath,
      "6 0/delta-99-stale\n".getBytes("UTF-8")) // pre-fold record
    assert(mf() == walkLive(),
      "a pre-fold log record leaked through the epoch gate")

    // fold: force the threshold to 1 so the next commit folds — the log
    // clears, the snapshot advances past epoch 7, and reads stay at truth
    EventsStream.manifestFoldAppendsOverride = Some(1)
    try {
      Seq(("d", 40L)).toDF("k", "event_id")
        .coalesce(1).write.parquet(s"$src/f3")
      EventsStream.firstSeenIndex(stream, idx, ck, compactEvery = 100)
      assert(!logFile.isFile, "the fold did not clear the log")
      val ep = snapshotBytes().split('\n').head.stripPrefix("#epoch ").trim.toLong
      assert(ep > 7, s"fold epoch $ep did not advance past the snapshot's")
      assert(mf() == walkLive())
      assert(EventsStream.latestIndex(spark, idx)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        (want + ("d" -> 40L)))
    } finally EventsStream.manifestFoldAppendsOverride = None
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("capped compaction spreads a lockstep fold over triggers and drains the carryover") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fsik").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    def stream = spark.readStream
      .schema("k STRING, event_id BIGINT")
      .parquet(s"$src/*")
      .select(col("k").as("content_hash"), col("event_id"))
    def basesAndDeltas(): (Int, Map[Int, Int]) = {
      val buckets = new java.io.File(idx).listFiles()
        .filter(_.getName.startsWith("bucket="))
      val withBase = buckets.count(_.listFiles().exists(_.getName.startsWith("base-")))
      val deltas = buckets.map(b => b.getName.stripPrefix("bucket=").toInt ->
        b.listFiles().count(_.getName.startsWith("delta-"))).toMap
      (withBase, deltas)
    }
    // one 64-key batch spans all 8 buckets; compactEvery=1 makes every
    // bucket a candidate on the very first trigger — the lockstep
    // large-batch pattern. cap=2 must fold exactly 2 per trigger.
    (0 until 64).map(i => (s"key_$i", 1000L + i)).toDF("k", "event_id")
      .coalesce(1).write.parquet(s"$src/f1")
    EventsStream.firstSeenIndex(stream, idx, ck, compactEvery = 1,
      compactBucketsPerTrigger = 2)
    val (folded1, _) = basesAndDeltas()
    assert(folded1 == 2, s"cap=2 folded $folded1 buckets on one trigger")
    // each later trigger drains 2 MORE buckets from the carryover (the
    // candidate set comes from the manifest, not the batch's touched set,
    // so buckets the new batch never touches still get their turn)
    val expect = scala.collection.mutable.Map(
      (0 until 64).map(i => s"key_$i" -> (1000L + i)): _*)
    (0 until 3).foreach { round =>
      Seq((s"extra_$round", 9000L + round)).toDF("k", "event_id")
        .coalesce(1).write.parquet(s"$src/g$round")
      expect(s"extra_$round") = 9000L + round
      EventsStream.firstSeenIndex(stream, idx, ck, compactEvery = 1,
        compactBucketsPerTrigger = 2)
      val (folded, deltas) = basesAndDeltas()
      // each trigger folds 2 candidates, of which at most one can be a
      // REfold of the single bucket the round's new key touched — so the
      // base count grows by at least one per trigger until all 8 are based
      assert(folded >= math.min(8, 3 + round),
        s"carryover not draining: $folded buckets folded after round $round")
      // the graceful degradation bound: a waiting bucket holds its original
      // delta plus at most one per trigger while it waits
      assert(deltas.values.forall(_ <= 1 + (round + 2)),
        s"read fan-in exceeded the wait bound: $deltas")
      // reads stay correct mid-drain
      assert(EventsStream.latestIndex(spark, idx)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect.toMap)
    }
    EventsStream.deleteRecursively(new java.io.File(root))
  }

  test("state-partition count never changes stream results, or the caller's session conf") {
    // state partitioning is a COST knob (state-store instances per
    // stateful op), sized to state volume in runToBatch; results must be
    // partitioning-invariant and the caller's session must keep its own
    // shuffle width (the stream runs on a cloned session)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def rows(parts: Int): Set[(Long, Long, Long)] = EventsStream.runToBatch(
      spark, sfDir, EventsStream.purchaseViewJoin(_), s"spec_pv_parts_$parts",
      statePartitions = parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val r4 = rows(4)
    val r32 = rows(32)
    assert(r4 == r32, s"4-part run ${r4.size} rows vs 32-part ${r32.size}")
    assert(r4.nonEmpty)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
