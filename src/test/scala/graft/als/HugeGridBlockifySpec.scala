package graft.als

import graft.SparkFixture
import org.apache.spark.HashPartitioner
import org.scalatest.funsuite.AnyFunSuite

/** Pins the wall-5 de-densification of the blockify tile grid
  * (SCALING §13.7): `partitionRatings` must work at block grids whose
  * CELL COUNT exceeds Int.MaxValue — the old code computed
  * `gridSize = numSrc * numDst` as an Int (overflow past 46,341
  * blocks/side) and allocated one dense builder per cell per map task,
  * both fatal at the ~10⁵-10⁶ blocks/side a 100 TB deployment prices
  * out. The sparse rewrite must also keep the reduce-partition count
  * decoupled from grid cells and stay correct through the live-tile
  * flush-all path.
  */
class HugeGridBlockifySpec extends AnyFunSuite with SparkFixture {

  private def ratingsRdd(n: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    val rows = Seq.fill(n)(Rating(
      rng.nextLong(1L << 40), rng.nextLong(1L << 40), rng.nextFloat() * 5))
    (spark.sparkContext.parallelize(rows, 4), rows)
  }

  private def reassemble(tiles: Array[((Int, Int), RatingBlock)]): Seq[Rating] =
    tiles.flatMap { case (_, b) =>
      Array.tabulate(b.size)(i => Rating(b.srcIds(i), b.dstIds(i), b.ratings(i)))
    }.toSeq

  test("70k x 70k grid (4.9e9 cells > Int.MaxValue) tiles without dense allocation") {
    val numSrc = 70000
    val numDst = 70000
    assert(numSrc.toLong * numDst > Int.MaxValue, "test must exceed the old Int grid")
    val srcPart = new HashPartitioner(numSrc)
    val dstPart = new HashPartitioner(numDst)
    val (rdd, rows) = ratingsRdd(5000, seed = 11)
    // production-default live-tile cap; shuffle partitions injected small so
    // the unit test doesn't schedule 64k reduce tasks — the cap is exactly
    // the decoupling knob under test
    val tiles = BlockedALS.partitionRatings(rdd, srcPart, dstPart,
      maxShufflePartitions = 32, maxLiveTiles = BlockedALS.BlockifyMaxLiveTiles)
    assert(tiles.partitions.length == 32)
    val collected = tiles.collect()
    // every tile key must agree with the partitioners
    collected.foreach { case ((srcBlockId, dstBlockId), block) =>
      assert(srcBlockId >= 0 && srcBlockId < numSrc)
      assert(dstBlockId >= 0 && dstBlockId < numDst)
      var i = 0
      while (i < block.size) {
        assert(srcPart.getPartition(block.srcIds(i)) == srcBlockId)
        assert(dstPart.getPartition(block.dstIds(i)) == dstBlockId)
        i += 1
      }
    }
    // one tile per key after the reduce-side merge
    assert(collected.map(_._1).distinct.length == collected.length)
    // no rating lost or duplicated
    assert(reassemble(collected).sorted(RatingOrdering) ==
      rows.sorted(RatingOrdering))
  }

  test("live-tile flush-all path produces the same tiles as the unbounded path") {
    val srcPart = new HashPartitioner(40)
    val dstPart = new HashPartitioner(40)
    val (rdd, _) = ratingsRdd(3000, seed = 23)
    def tileMap(maxLiveTiles: Int): Map[(Int, Int), Seq[Rating]] =
      BlockedALS.partitionRatings(rdd, srcPart, dstPart,
        maxShufflePartitions = 16, maxLiveTiles = maxLiveTiles)
        .collect()
        .map { case (k, b) =>
          k -> Array.tabulate(b.size)(i =>
            Rating(b.srcIds(i), b.dstIds(i), b.ratings(i))).toSeq.sorted(RatingOrdering)
        }.toMap
    // 3000 rows over a 1600-cell grid visits ~every cell per partition, so
    // maxLiveTiles=8 forces many flush-all rounds
    assert(tileMap(maxLiveTiles = 8) == tileMap(maxLiveTiles = Int.MaxValue))
  }

  test("full fit works on a mostly-empty block grid (sparse out-blocks in train)") {
    // 120×120 = 14.4k grid cells over ≤4k distinct rating pairs: >70% of
    // (src, dst) block pairs are EMPTY, so the whole iteration loop runs
    // on sparse out-blocks that skip them (the dense table shipped an
    // empty message per cell). The >64k-cell cap-binding path is pinned
    // at the blockify level above (a capped fit is cluster-normal but
    // local-mode-slow: 64k reduce tasks is scheduling, not compute).
    val rng = new scala.util.Random(31)
    val rows = Seq.tabulate(4000) { i =>
      Rating((i % 200).toLong, rng.nextInt(150).toLong, 1f + rng.nextInt(5))
    }
    val ratings = spark.sparkContext.parallelize(rows, 4)
    val cfg = BlockedALS.Config(rank = 4, numUserBlocks = 120, numItemBlocks = 120,
      maxIter = 2, regParam = 0.1, seed = 5L)
    val (userFactors, itemFactors) = BlockedALS.train(ratings, cfg)
    val users = userFactors.collect().toMap
    val items = itemFactors.collect().toMap
    assert(users.keySet == rows.map(_.user).toSet)
    assert(items.keySet == rows.map(_.item).toSet)
    assert(users.values.forall(f => f.length == 4 && f.forall(v => !v.isNaN && !v.isInfinite)))
    assert(items.values.forall(f => f.length == 4 && f.forall(v => !v.isNaN && !v.isInfinite)))
    userFactors.unpersist(); itemFactors.unpersist()
  }

  test("gridAdvisory fires only when a block overshoots the auto budget") {
    // 10M ratings in one block at rank 8: 10M × 68 B = ~680 MB > 256 MB
    // (counts are a primitive array indexed by dense block id — wall 6)
    val fat = Array(10000000L, 1000L)
    val msg = BlockedALS.gridAdvisory(fat, rank = 8, parallelism = 32,
      numUserBlocks = 2, numItemBlocks = 2)
    assert(msg.isDefined)
    assert(msg.get.contains("AutoBlocks"))
    assert(msg.get.contains("2x2"))
    // the recommended count must match the rule itself
    val rec = BlockedALS.autoBlockCount(10001000L, 8, 32)
    assert(msg.get.contains(s"would use $rec blocks"))
    // small blocks: silent
    assert(BlockedALS.gridAdvisory(Array(1000L, 1000L), 8, 32, 2, 2).isEmpty)
    assert(BlockedALS.gridAdvisory(Array.empty[Long], 8, 32, 2, 2).isEmpty)
    // an all-empty grid (array allocated, no ratings landed): silent
    assert(BlockedALS.gridAdvisory(Array(0L, 0L), 8, 32, 2, 2).isEmpty)
    // exactly at the budget: silent (advisory is for overshoot)
    val atBudget = (BlockedALS.TargetBlockBytes / 68L)
    assert(BlockedALS.gridAdvisory(Array(atBudget), 8, 32, 2, 2).isEmpty)
    assert(BlockedALS.gridAdvisory(Array(atBudget + 1), 8, 32, 2, 2).isDefined)
    // per-side labels (r17 ADVICE: the item side is audited too — a skewed
    // fat ITEM block OOMs the item in-block build exactly like a user one)
    assert(msg.get.contains("user block"))
    val itemMsg = BlockedALS.gridAdvisory(fat, rank = 8, parallelism = 32,
      numUserBlocks = 2, numItemBlocks = 2, side = "item")
    assert(itemMsg.isDefined && itemMsg.get.contains("item block"))
  }

  private object RatingOrdering extends Ordering[Rating] {
    def compare(a: Rating, b: Rating): Int = {
      val u = java.lang.Long.compare(a.user, b.user)
      if (u != 0) return u
      val i = java.lang.Long.compare(a.item, b.item)
      if (i != 0) return i
      java.lang.Float.compare(a.rating, b.rating)
    }
  }
}
