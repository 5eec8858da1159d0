package graft.als

import graft.SparkFixture
import org.apache.spark.GraftSparkInternals
import org.scalatest.funsuite.AnyFunSuite

/** Pins the iteration-scoped shuffle cleanup (wall 3's scratch high-water,
  * r17 verdict): at every checkpoint cut the [[ShuffleLedger]] must DELETE
  * the retired factor-routing shuffles (not merely leave them for a driver
  * GC the ×1000 runs didn't get in time), while
  *   - factors stay bit-identical to a fit with no cleanup at all,
  *   - the block-structure shuffles (blockify / in-block) survive the
  *     whole fit (they are protected), and
  *   - the final model remains fully readable afterwards.
  *
  * Assertions are on the CONCRETE ids the fit's ledger reaped, so the spec
  * stays correct when other suites create shuffles in the shared context.
  */
class ShuffleReapSpec extends AnyFunSuite with SparkFixture {

  private def ratings(seed: Int): Seq[Rating] = {
    val rng = new scala.util.Random(seed)
    for {
      u <- 0 until 30
      i <- 0 until 20
      if rng.nextDouble() < 0.6
    } yield Rating(u.toLong, i.toLong, (1 + rng.nextInt(5)).toFloat)
  }

  private def fit(cfg: BlockedALS.Config, data: Seq[Rating])
    : (Map[Long, Seq[Float]], Map[Long, Seq[Float]], ShuffleLedger) = {
    val rdd = spark.sparkContext.parallelize(data, 3)
    val (uf, itf) = BlockedALS.train(rdd, cfg)
    val ledger = BlockedALS.lastLedgerForTest
    val u = uf.collect().toMap.map { case (k, v) => k -> v.toSeq }
    val i = itf.collect().toMap.map { case (k, v) => k -> v.toSeq }
    uf.unpersist(); itf.unpersist()
    (u, i, ledger)
  }

  private def withCheckpointDir[T](body: => T): T = {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-reap-ckpt").toFile
    sc.setCheckpointDir(dir.getAbsolutePath)
    try body
    finally {
      sc.setCheckpointDir(null.asInstanceOf[String])
      graft.streaming.EventsStream.deleteRecursively(dir)
    }
  }

  test("explicit fit: checkpoint cuts reap retired factor shuffles; factors bit-identical to the no-cleanup fit") {
    val data = ratings(41)
    val base = BlockedALS.Config(rank = 4, numUserBlocks = 3, numItemBlocks = 2,
      maxIter = 4, regParam = 0.05, seed = 11)

    // no checkpointing → no factor shuffle is ever retired; the only reaps
    // are the eager ones — the tile exchange plus both in-block exchanges
    // (the default intermediate level has a disk tier), freed up front
    // once both block sides are built (r18)
    val (u0, i0, ledger0) = fit(base.copy(checkpointInterval = -1), data)
    assert(ledger0.reaped == 3,
      "without cuts only the tile + in-block exchanges are reaped")

    val (u1, i1, ledger1) = withCheckpointDir {
      fit(base.copy(checkpointInterval = 1), data)
    }
    assert(u1 == u0 && i1 == i0, "reaping must be inert to the factors")
    // maxIter=4 / interval=1: 8 factor-routing shuffles exist; everything
    // behind the last cut is reapable — only the final user half-step's
    // shuffle (after the last cut) must survive for the model's lineage.
    // +3 for the tile + in-block exchanges (reaped eagerly up front, r18).
    assert(ledger1.reaped >= 9,
      s"expected 3 eager + at least 6 retired factor shuffles reaped, got ${ledger1.reaped}")
    assert(ledger1.reapedIds.size >= 6 && ledger1.reapedEagerIds.size == 3)
    // sweep-reaped ids sit behind a checkpoint truncation: they must stay
    // unregistered (nothing can even re-create their stage)
    val registered = GraftSparkInternals.registeredShuffleIds(spark.sparkContext)
    val stillRegistered = ledger1.reapedIds.toSet.intersect(registered)
    assert(stillRegistered.isEmpty,
      s"reaped shuffle ids still registered with the map-output tracker: $stillRegistered")
    // the eager tile reap's claim is DISK: its dep stays in the in-block
    // lineage (may be re-registered empty), but its files must be gone
    ledger1.reapedEagerIds.foreach { id =>
      assert(GraftSparkInternals.shuffleFileCount(spark.sparkContext, id) == 0,
        s"tile shuffle $id still has files on disk")
    }
  }

  test("implicit fit: cut-time reap fires and is inert to the factors") {
    val data = ratings(42)
    val base = BlockedALS.Config(rank = 4, numUserBlocks = 2, numItemBlocks = 2,
      maxIter = 3, regParam = 0.05, implicitPrefs = true, alpha = 2.0, seed = 23)

    val (u0, i0, ledger0) = fit(base.copy(checkpointInterval = -1), data)
    assert(ledger0.reaped == 3) // the eager tile + in-block exchanges (no cuts)

    val (u1, i1, ledger1) = withCheckpointDir {
      fit(base.copy(checkpointInterval = 1), data)
    }
    assert(u1 == u0 && i1 == i0, "reaping must be inert to the factors")
    assert(ledger1.reaped >= 6,
      s"expected 3 eager + at least 3 retired factor shuffles reaped, got ${ledger1.reaped}")
    val registered = GraftSparkInternals.registeredShuffleIds(spark.sparkContext)
    assert(ledger1.reapedIds.toSet.intersect(registered).isEmpty)
    ledger1.reapedEagerIds.foreach { id =>
      assert(GraftSparkInternals.shuffleFileCount(spark.sparkContext, id) == 0)
    }
  }

  test("checkpoint cuts delete all-but-last checkpoint files (both paths)") {
    // The r18 ×1000 scratch series measured ~1 GB/iteration of creep from
    // accumulated factor checkpoint generations inside the otherwise-flat
    // reap epochs; only the LAST checkpoint backs any live lineage (each
    // new cut is persisted and reads its own files on eviction), so train
    // deletes the previous generation's files once a new cut has
    // materialized. The last one must survive — the returned model's
    // lineage reaches it.
    def rddDirs(dir: java.io.File): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) {
          val children = Option(f.listFiles()).getOrElse(Array.empty).toSeq
          children.filter(c => c.isDirectory && c.getName.startsWith("rdd-")) ++
            children.flatMap(walk)
        } else Nil
      walk(dir)
    }
    for (implicitPrefs <- Seq(false, true)) {
      val data = ratings(if (implicitPrefs) 47 else 46)
      val sc = spark.sparkContext
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-clean").toFile
      sc.setCheckpointDir(dir.getAbsolutePath)
      try {
        val (uf, itf) = BlockedALS.train(
          sc.parallelize(data, 3),
          BlockedALS.Config(rank = 4, numUserBlocks = 3, numItemBlocks = 2,
            maxIter = 4, regParam = 0.05, implicitPrefs = implicitPrefs,
            alpha = 2.0, checkpointInterval = 1, seed = 29))
        // 4 cuts happened; 3 retired generations deleted, the last kept
        val remaining = rddDirs(dir)
        assert(remaining.size == 1,
          s"implicitPrefs=$implicitPrefs: expected exactly the last checkpoint " +
            s"generation on disk, found ${remaining.map(_.getName)}")
        assert(Option(remaining.head.listFiles()).exists(_.nonEmpty),
          "the surviving checkpoint generation must have its part files")
        // the model stays readable with the retired generations gone
        assert(uf.count() > 0 && itf.count() > 0)
        uf.unpersist(); itf.unpersist()
      } finally {
        sc.setCheckpointDir(null.asInstanceOf[String])
        graft.streaming.EventsStream.deleteRecursively(dir)
      }
    }
  }

  test("a reaped shuffle recomputes on demand (the tile-reap recovery contract)") {
    // The train-time tile-shuffle reap (and any reap racing a rare
    // lost-partition recompute) relies on Spark re-running the map stage
    // of an unregistered shuffle instead of failing the job. Pin that
    // semantics directly: reap a shuffle, then run a fresh job over its
    // child — the result must be recomputed, bit-identical.
    val sc = spark.sparkContext
    val a = sc.parallelize(1 to 1000, 4).map(x => (x % 13, x.toLong))
    val b = a.reduceByKey(_ + _)
    val expected = b.collect().toMap
    val ids = ShuffleLedger.reachableShuffleIds(Seq(b))
    assert(ids.nonEmpty)
    GraftSparkInternals.reapShuffles(sc, ids, blocking = true)
    assert(ids.intersect(GraftSparkInternals.registeredShuffleIds(sc)).isEmpty,
      "the shuffle must actually be unregistered before the re-read")
    assert(b.collect().toMap == expected,
      "a job over a reaped shuffle must recompute it, not fail")
  }

  test("train eagerly reaps the tile + in-block exchanges; the caller's upstream shuffle survives") {
    // The tile exchange is O(ratings) of shuffle files nothing reads after
    // makeBlocks on both sides, and with a disk-tiered intermediate level
    // the two in-block exchanges are node-loss insurance duplicating data
    // the persists hold durably — train deletes all three up front (the
    // r18 x1000 scratch series measured them sitting under every
    // iteration's peak), while the caller's own upstream shuffles must
    // never be touched.
    val sc = spark.sparkContext
    val data = ratings(44)
    // give the caller's ratings an upstream shuffle that must be spared
    val rdd = sc.parallelize(data, 3)
      .map(r => (r.user, r)).partitionBy(new org.apache.spark.HashPartitioner(3))
      .map(_._2)
    val callerIds = ShuffleLedger.reachableShuffleIds(Seq(rdd))
    assert(callerIds.size == 1)
    val (uf, itf) = BlockedALS.train(rdd, BlockedALS.Config(
      rank = 4, numUserBlocks = 3, numItemBlocks = 2, maxIter = 2,
      regParam = 0.05, seed = 17)) // no checkpoint dir → no cut-time reaps
    val ledger = BlockedALS.lastLedgerForTest
    assert(ledger.reaped == 3, "exactly the tile + 2 in-block exchanges reaped up front")
    assert(ledger.reapedEagerIds.size == 3 && ledger.reapedIds.isEmpty)
    // the scratch claim: the exchanges' files are gone from disk
    // (registration may reappear as empty stage bookkeeping — see
    // GraftSparkInternals.registeredShuffleIds scaladoc)
    ledger.reapedEagerIds.foreach { id =>
      assert(GraftSparkInternals.shuffleFileCount(sc, id) == 0,
        s"eagerly reaped shuffle $id still has files on disk")
    }
    // positive control: the caller's upstream shuffle was spared — its
    // files are still on disk and it was never in the reap ledger
    assert(callerIds.intersect(ledger.reapedEagerIds.toSet).isEmpty)
    callerIds.foreach { id =>
      assert(GraftSparkInternals.shuffleFileCount(sc, id) > 0,
        s"caller shuffle $id must keep its files")
    }
    // the model remains fully readable on the reaped lineage
    assert(uf.count() > 0 && itf.count() > 0)
    uf.unpersist(); itf.unpersist()
  }

  test("memory-only intermediate level: the eager reap stays tile-only") {
    // Under MEMORY_ONLY an evicted in-block partition's only cheap
    // recompute path is its exchange — train must keep those files and
    // reap only the tile exchange.
    val sc = spark.sparkContext
    val rdd = sc.parallelize(ratings(45), 3)
    val (uf, itf) = BlockedALS.train(rdd, BlockedALS.Config(
      rank = 4, numUserBlocks = 3, numItemBlocks = 2, maxIter = 2,
      regParam = 0.05, seed = 19,
      intermediateStorageLevel = org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
    val ledger = BlockedALS.lastLedgerForTest
    assert(ledger.reaped == 1, "only the tile exchange may be reaped under MEMORY_ONLY")
    assert(ledger.reapedEagerIds.size == 1)
    assert(GraftSparkInternals.shuffleFileCount(sc, ledger.reapedEagerIds.head) == 0)
    assert(uf.count() > 0 && itf.count() > 0)
    uf.unpersist(); itf.unpersist()
  }

  test("block-structure shuffles are protected: never tracked, never reaped") {
    val data = ratings(43)
    val sc = spark.sparkContext
    val rdd = sc.parallelize(data, 3)
    val userPart = new org.apache.spark.HashPartitioner(3)
    val itemPart = new org.apache.spark.HashPartitioner(2)
    val tiles = BlockedALS.partitionRatings(rdd, userPart, itemPart)
    val (inBlocks, outBlocks, bcCounts) = BlockedALS.makeBlocks(
      tiles, userPart, itemPart, org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    outBlocks.count()
    val blockIds = ShuffleLedger.reachableShuffleIds(Seq(inBlocks, outBlocks))
    assert(blockIds.nonEmpty, "in-block lineage must contain shuffles")

    val ledger = new ShuffleLedger(sc, Seq(inBlocks, outBlocks))
    ledger.track(inBlocks) // over-collection on purpose: protection must hold
    assert(ledger.sweep(Seq.empty) == 0,
      "protected block shuffles must survive a sweep with no live roots")
    val registered = GraftSparkInternals.registeredShuffleIds(sc)
    assert(blockIds.subsetOf(registered),
      "block-structure shuffles must stay registered after the sweep")
    inBlocks.unpersist(); outBlocks.unpersist(); bcCounts.unpersist()
  }
}
