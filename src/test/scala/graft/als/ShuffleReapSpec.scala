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

    // no checkpointing → nothing is ever retired, nothing may be reaped
    val (u0, i0, ledger0) = fit(base.copy(checkpointInterval = -1), data)
    assert(ledger0.reaped == 0, "without cuts every shuffle stays reachable")

    val (u1, i1, ledger1) = withCheckpointDir {
      fit(base.copy(checkpointInterval = 1), data)
    }
    assert(u1 == u0 && i1 == i0, "reaping must be inert to the factors")
    // maxIter=4 / interval=1: 8 factor-routing shuffles exist; everything
    // behind the last cut is reapable — only the final user half-step's
    // shuffle (after the last cut) must survive for the model's lineage.
    assert(ledger1.reaped >= 6,
      s"expected at least 6 retired factor shuffles reaped, got ${ledger1.reaped}")
    val registered = GraftSparkInternals.registeredShuffleIds(spark.sparkContext)
    val stillRegistered = ledger1.reapedIds.toSet.intersect(registered)
    assert(stillRegistered.isEmpty,
      s"reaped shuffle ids still registered with the map-output tracker: $stillRegistered")
  }

  test("implicit fit: cut-time reap fires and is inert to the factors") {
    val data = ratings(42)
    val base = BlockedALS.Config(rank = 4, numUserBlocks = 2, numItemBlocks = 2,
      maxIter = 3, regParam = 0.05, implicitPrefs = true, alpha = 2.0, seed = 23)

    val (u0, i0, ledger0) = fit(base.copy(checkpointInterval = -1), data)
    assert(ledger0.reaped == 0)

    val (u1, i1, ledger1) = withCheckpointDir {
      fit(base.copy(checkpointInterval = 1), data)
    }
    assert(u1 == u0 && i1 == i0, "reaping must be inert to the factors")
    assert(ledger1.reaped >= 3,
      s"expected at least 3 retired factor shuffles reaped, got ${ledger1.reaped}")
    val registered = GraftSparkInternals.registeredShuffleIds(spark.sparkContext)
    assert(ledger1.reapedIds.toSet.intersect(registered).isEmpty)
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
