package graft.als

import graft.SparkFixture
import org.apache.spark.HashPartitioner
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sparse src-factor lookup in [[BlockedALS.computeFactors]] (r17
  * ADVICE): above [[BlockedALS.DenseSrcFactorLookupMax]] src blocks, the
  * per-task lookup is a LongMap over VISITED src blocks instead of a dense
  * O(blocks/side) array — and the two paths must produce bit-identical
  * factors. The spec forces the sparse path with an injected cap of 1 on
  * real block structures, so every tested grid exercises it.
  */
class SparseSrcFactorLookupSpec extends AnyFunSuite with SparkFixture {

  private def ratings(seed: Int): Seq[Rating] = {
    val rng = new scala.util.Random(seed)
    for {
      u <- 0 until 40
      i <- 0 until 25
      if rng.nextDouble() < 0.5
    } yield Rating(u.toLong, i.toLong, (1 + rng.nextInt(5)).toFloat)
  }

  test("sparse lookup (forced via cap=1) is bit-identical to the dense path") {
    val sc = spark.sparkContext
    val rdd = sc.parallelize(ratings(7), 4)
    val userPart = new HashPartitioner(4)
    val itemPart = new HashPartitioner(3)

    val tiles = BlockedALS.partitionRatings(rdd, userPart, itemPart)
    val (userIn, userOut, userBc) =
      BlockedALS.makeBlocks(tiles, userPart, itemPart, StorageLevel.MEMORY_ONLY)
    val swapped = tiles.map { case ((ub, ib), b) =>
      ((ib, ub), RatingBlock(b.dstIds, b.srcIds, b.ratings))
    }
    val (itemIn, itemOut, itemBc) =
      BlockedALS.makeBlocks(swapped, itemPart, userPart, StorageLevel.MEMORY_ONLY)

    val userEncoder = new LocalIndexEncoder(userPart.numPartitions)
    val userFactors = BlockedALS.initialize(userIn, rank = 4, seed = 3L)
    val solver = new CholeskySolver

    def run(maxDense: Int): Map[Int, Seq[Seq[Float]]] =
      BlockedALS.computeFactors(userFactors, userOut, itemIn,
          rank = 4, regParam = 0.05, userEncoder,
          implicitPrefs = false, alpha = 1.0, solver, maxDense)
        .collect().toMap.map { case (b, fs) => b -> fs.toSeq.map(_.toSeq) }

    val dense = run(BlockedALS.DenseSrcFactorLookupMax)
    val sparse = run(1) // numSrcBlocks=4 > 1 → sparse path on every task
    assert(dense == sparse, "sparse and dense lookups must agree bit-for-bit")

    // implicit path exercises the same lookup through the YᵀY-seeded solve
    def runImplicit(maxDense: Int): Map[Int, Seq[Seq[Float]]] =
      BlockedALS.computeFactors(userFactors, userOut, itemIn,
          rank = 4, regParam = 0.05, userEncoder,
          implicitPrefs = true, alpha = 2.0, solver, maxDense)
        .collect().toMap.map { case (b, fs) => b -> fs.toSeq.map(_.toSeq) }
    assert(runImplicit(BlockedALS.DenseSrcFactorLookupMax) == runImplicit(1))

    userIn.unpersist(); userOut.unpersist(); itemIn.unpersist(); itemOut.unpersist()
    userBc.unpersist(); itemBc.unpersist()
  }
}
