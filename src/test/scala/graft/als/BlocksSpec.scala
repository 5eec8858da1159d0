package graft.als

import org.scalatest.funsuite.AnyFunSuite

class BlocksSpec extends AnyFunSuite {

  test("RatingBlockBuilder add + merge + build keeps columns parallel") {
    val b1 = new RatingBlockBuilder
    b1.add(1L, 10L, 1.5f).add(2L, 20L, 2.5f)
    val b2 = new RatingBlockBuilder
    b2.add(3L, 30L, 3.5f)
    b1.merge(b2.build())
    val block = b1.build()
    assert(block.size == 3)
    assert(block.srcIds.toSeq == Seq(1L, 2L, 3L))
    assert(block.dstIds.toSeq == Seq(10L, 20L, 30L))
    assert(block.ratings.toSeq == Seq(1.5f, 2.5f, 3.5f))
  }

  test("ParallelSort sorts three parallel arrays consistently") {
    val rng = new scala.util.Random(1)
    for (trial <- 0 until 500) {
      val n = rng.nextInt(500) + 1
      val orig = Array.fill(n)(rng.nextLong(51))
      val keys = orig.clone()
      // values carry the ORIGINAL INDEX so any permutation mismatch is caught
      val v1 = Array.tabulate(n)(identity)
      val v2 = Array.tabulate(n)(_.toFloat)
      ParallelSort.sortBySrc(keys, v1, v2)
      assert(keys.toSeq == orig.toSeq.sorted, s"trial $trial: keys not sorted")
      keys.indices.foreach { i =>
        assert(orig(v1(i)) == keys(i), s"trial $trial pos $i: v1 lost its key")
        assert(v2(i) == v1(i).toFloat, s"trial $trial pos $i: v2 diverged from v1")
      }
      assert(v1.sorted.toSeq == (0 until n), s"trial $trial: v1 not a permutation")
    }
  }

  test("CSR compress on a known array set") {
    // ratings: src 5 -> (enc 1, 1.0), src 3 -> (enc 2, 2.0), src 5 -> (enc 3, 3.0)
    val ub = new UncompressedInBlock(
      Array(5L, 3L, 5L), Array(1, 2, 3), Array(1.0f, 2.0f, 3.0f))
    val in = ub.compress()
    assert(in.srcIds.toSeq == Seq(3L, 5L))
    assert(in.dstPtrs.toSeq == Seq(0, 1, 3))
    // src 3's slice
    assert(in.dstEncodedIndices(0) == 2 && in.ratings(0) == 2.0f)
    // src 5's slice holds both its ratings (order within a run is free)
    val five = (1 until 3).map(i => (in.dstEncodedIndices(i), in.ratings(i))).toSet
    assert(five == Set((1, 1.0f), (3, 3.0f)))
  }

  test("CSR invariants on random data") {
    val rng = new scala.util.Random(5)
    for (_ <- 0 until 200) {
      val n = rng.nextInt(300) + 1
      val srcs = List.fill(n)(rng.nextLong(21))
      val enc = srcs.indices.toArray
      val ratings = srcs.indices.map(_.toFloat).toArray
      // snapshot expected pairs BEFORE compress — it sorts the arrays in place
      val expectedPairs = srcs.zip(ratings.toSeq).sorted
      val in = new UncompressedInBlock(srcs.toArray, enc, ratings).compress()
      assert(in.srcIds.toSeq == srcs.distinct.sorted)
      assert(in.dstPtrs.head == 0 && in.dstPtrs.last == n)
      assert(in.dstPtrs.toSeq.sliding(2).forall { case Seq(a, b) => a < b; case _ => true })
      // every (src, rating) pair survived
      val flat = in.srcIds.zipWithIndex.flatMap { case (src, i) =>
        (in.dstPtrs(i) until in.dstPtrs(i + 1)).map(j => (src, in.ratings(j)))
      }
      assert(flat.sorted.toSeq == expectedPairs)
    }
  }

  test("UncompressedInBlockBuilder encodes block ids and local indices") {
    val encoder = new LocalIndexEncoder(4)
    val b = new UncompressedInBlockBuilder(encoder)
    b.add(2, Array(7L, 8L), Array(0, 5), Array(1f, 2f))
    b.add(3, Array(9L), Array(1), Array(3f))
    val ub = b.build()
    assert(ub.length == 3)
    assert(encoder.blockId(ub.dstEncodedIndices(0)) == 2)
    assert(encoder.localIndex(ub.dstEncodedIndices(1)) == 5)
    assert(encoder.blockId(ub.dstEncodedIndices(2)) == 3)
  }
}
