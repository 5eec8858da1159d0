package graft.als

import org.scalatest.funsuite.AnyFunSuite

class EncoderSpec extends AnyFunSuite {

  test("encode/decode round-trips for randomized valid packings") {
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val numBlocks = rng.nextInt(4096) + 1
      val blockId = rng.nextInt(numBlocks)
      val bits = math.min(Integer.numberOfLeadingZeros(numBlocks - 1), 31)
      val maxLocal = math.min((1L << bits) - 1, 1000000L).toInt
      val localIndex = if (maxLocal == 0) 0 else rng.nextInt(maxLocal + 1)
      val enc = new LocalIndexEncoder(numBlocks)
      // NOTE: the encoded int may use the sign bit (e.g. numBlocks=2 keeps 31
      // local bits); decode uses >>> so the round trip is still exact.
      val e = enc.encode(blockId, localIndex)
      assert(enc.blockId(e) == blockId, s"numBlocks=$numBlocks blockId=$blockId local=$localIndex")
      assert(enc.localIndex(e) == localIndex, s"numBlocks=$numBlocks blockId=$blockId local=$localIndex")
    }
  }

  test("exhaustive round-trip for small block counts") {
    for (numBlocks <- 1 to 17; blockId <- 0 until numBlocks; localIndex <- 0 until 100) {
      val enc = new LocalIndexEncoder(numBlocks)
      val e = enc.encode(blockId, localIndex)
      assert(enc.blockId(e) == blockId && enc.localIndex(e) == localIndex)
    }
  }

  test("single block gives 31 local bits") {
    val enc = new LocalIndexEncoder(1)
    val e = enc.encode(0, Int.MaxValue)
    assert(enc.blockId(e) == 0)
    assert(enc.localIndex(e) == Int.MaxValue)
  }

  test("rejects out-of-range block ids") {
    val enc = new LocalIndexEncoder(10)
    intercept[IllegalArgumentException](enc.encode(10, 0))
    intercept[IllegalArgumentException](enc.encode(-1, 0))
  }
}
