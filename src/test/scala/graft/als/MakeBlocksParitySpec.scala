package graft.als

import graft.SparkFixture
import org.apache.spark.HashPartitioner
import org.scalatest.funsuite.AnyFunSuite

/** Pins the wall-2 rewrite of `makeBlocks` (exact-size streamed in-block
  * build, SCALING §12.7 wall 2) bit-identical to the reference path it
  * replaced: `groupByKey` + growing [[UncompressedInBlockBuilder]]
  * (ALS.py:306-329). The oracle path is reconstructed HERE, in the spec,
  * from the same `partitionRatings` tiles, so the comparison is
  * element-wise within one JVM — stronger than a cross-binary A/B.
  */
class MakeBlocksParitySpec extends AnyFunSuite with SparkFixture {

  private def randomRatings(n: Int, users: Int, items: Int, seed: Int): Seq[Rating] = {
    val rng = new scala.util.Random(seed)
    // duplicate (user, item) pairs allowed — the blocked pipeline carries
    // them through, which exercises equal-srcId sort ties
    Seq.fill(n)(Rating(rng.nextInt(users).toLong, rng.nextInt(items).toLong,
      rng.nextFloat() * 5))
  }

  /** The previous production path, verbatim: per-tile local-index prep,
    * groupByKey, growing builder. Kept as the parity oracle.
    */
  private def makeBlocksGrouped(
      ratingBlocks: org.apache.spark.rdd.RDD[((Int, Int), RatingBlock)],
      numSrcBlocks: Int,
      numDstBlocks: Int): Map[Int, InBlock] = {
    val keyed = ratingBlocks.map { case ((srcBlockId, dstBlockId), block) =>
      val sz = block.size
      val uniq = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < sz) { uniq.add(block.dstIds(i)); i += 1 }
      val sortedDstIds = new Array[Long](uniq.size)
      val toLocal = new java.util.HashMap[java.lang.Long, Integer](uniq.size * 2)
      val it = uniq.iterator()
      i = 0
      while (it.hasNext) {
        val id = it.next()
        sortedDstIds(i) = id
        toLocal.put(id, i)
        i += 1
      }
      val dstLocalIndices = new Array[Int](sz)
      i = 0
      while (i < sz) { dstLocalIndices(i) = toLocal.get(block.dstIds(i)); i += 1 }
      (srcBlockId, (dstBlockId, block.srcIds, dstLocalIndices, block.ratings))
    }
    keyed
      .groupByKey(new HashPartitioner(numSrcBlocks))
      .mapValues { tiles =>
        val encoder = new LocalIndexEncoder(numDstBlocks)
        val builder = new UncompressedInBlockBuilder(encoder)
        tiles.foreach { case (dstBlockId, srcIds, dstLocalIndices, ratings) =>
          builder.add(dstBlockId, srcIds, dstLocalIndices, ratings)
        }
        builder.build().compress()
      }
      .collect().toMap
  }

  private def assertInBlocksIdentical(
      actual: Map[Int, InBlock], expected: Map[Int, InBlock]): Unit = {
    assert(actual.keySet == expected.keySet)
    actual.foreach { case (blockId, a) =>
      val e = expected(blockId)
      assert(a.srcIds.sameElements(e.srcIds), s"srcIds differ in block $blockId")
      assert(a.dstPtrs.sameElements(e.dstPtrs), s"dstPtrs differ in block $blockId")
      assert(a.dstEncodedIndices.sameElements(e.dstEncodedIndices),
        s"dstEncodedIndices differ in block $blockId")
      // bit-level float compare: any reorder or recompute would show here
      assert(a.ratings.length == e.ratings.length, s"ratings length in block $blockId")
      var i = 0
      while (i < a.ratings.length) {
        assert(java.lang.Float.floatToRawIntBits(a.ratings(i)) ==
          java.lang.Float.floatToRawIntBits(e.ratings(i)),
          s"ratings($i) differ in block $blockId")
        i += 1
      }
    }
  }

  test("streamed exact-size in-block build is bit-identical to the groupByKey path") {
    for ((numSrc, numDst, n, seed) <- Seq((2, 3, 500, 7), (4, 4, 2000, 23), (1, 1, 50, 5))) {
      val ratings = spark.sparkContext.parallelize(randomRatings(n, 40, 30, seed), 4)
      val srcPart = new HashPartitioner(numSrc)
      val dstPart = new HashPartitioner(numDst)
      // persist + materialize the tiles so both paths below consume the
      // SAME tile contents in the same order: the reduce-side tile merge
      // order is only scheduling-deterministic, so recomputing the tiles
      // per path would rest the bit-level assertion on luck
      val tiles = BlockedALS.partitionRatings(ratings, srcPart, dstPart)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      tiles.count()
      val (inBlocks, outBlocks, bcCounts) = BlockedALS.makeBlocks(
        tiles, srcPart, dstPart, org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val actual = inBlocks.collect().toMap
      val expected = makeBlocksGrouped(tiles, numSrc, numDst)
      assertInBlocksIdentical(actual, expected)
      // out-blocks derive from in-blocks, so identity carries over; assert
      // the sparse-table invariants anyway
      val out = outBlocks.collect().toMap
      assert(out.keySet == actual.keySet)
      out.foreach { case (_, ob) =>
        assert(ob.dstBlockIds.sameElements(ob.dstBlockIds.sorted.distinct))
        assert(ob.dstBlockIds.forall(id => id >= 0 && id < numDst))
        assert(ob.activeIndices.forall(_.nonEmpty))
      }
      tiles.unpersist(); inBlocks.unpersist(); outBlocks.unpersist()
      bcCounts.unpersist()
    }
  }

  test("exact builder matches growing builder tile-for-tile and rejects bad counts") {
    val encoder = new LocalIndexEncoder(4)
    val t1 = (2, Array(5L, 3L, 5L), Array(0, 1, 2), Array(1.0f, 2.0f, 3.0f))
    val t2 = (0, Array(9L, 1L), Array(1, 0), Array(4.0f, 5.0f))
    val grown = new UncompressedInBlockBuilder(encoder)
      .add(t1._1, t1._2, t1._3, t1._4).add(t2._1, t2._2, t2._3, t2._4).build()
    val exact = new ExactUncompressedInBlockBuilder(encoder, 5)
      .add(t1._1, t1._2, t1._3, t1._4).add(t2._1, t2._2, t2._3, t2._4).build()
    assert(exact.srcIds.sameElements(grown.srcIds))
    assert(exact.dstEncodedIndices.sameElements(grown.dstEncodedIndices))
    assert(exact.ratings.sameElements(grown.ratings))

    // underflow: counted more than received
    val under = new ExactUncompressedInBlockBuilder(encoder, 6)
      .add(t1._1, t1._2, t1._3, t1._4).add(t2._1, t2._2, t2._3, t2._4)
    val e1 = intercept[IllegalArgumentException](under.build())
    assert(e1.getMessage.contains("underflow"))
    // overflow: counted fewer than received
    val over = new ExactUncompressedInBlockBuilder(encoder, 4)
      .add(t1._1, t1._2, t1._3, t1._4)
    val e2 = intercept[IllegalArgumentException](over.add(t2._1, t2._2, t2._3, t2._4))
    assert(e2.getMessage.contains("overflow"))
  }
}
