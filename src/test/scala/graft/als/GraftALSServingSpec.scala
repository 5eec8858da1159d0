package graft.als

import graft.SparkFixture
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-serving parity: the blocked cosine top-k kernel behind
  * `itemNeighbors` must agree with the exact crossJoin+window baseline
  * (`Similarity.bruteForceTopK`) — same neighbors, same order, same scores
  * (up to float-normalization rounding).
  */
class GraftALSServingSpec extends AnyFunSuite with SparkFixture {

  private def syntheticFactors(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      // one all-zero vector exercises the zero-norm (cosine = 0) path
      val f =
        if (i == 7) Array.fill(dim)(0f)
        else Array.fill(dim)(rng.nextFloat() * 2f - 1f)
      FactorRow(i.toLong, f)
    }
    spark.createDataFrame(rows)
  }

  test("blocked itemNeighbors matches bruteForceTopK (neighbors, ranks, cosines)") {
    val dim = 6
    val factors = syntheticFactors(n = 120, dim = dim, seed = 5L)
    val model = GraftALSModel(rank = dim, userFactors = factors, itemFactors = factors)

    val blocked = model.itemNeighbors(3, blockSize = 32)
      .select(col("item_id"), col("rank"), col("neighbor_item_id"), col("cosine"))
    val brute = Similarity.bruteForceTopK(factors, factors, k = 3,
      idCol = "id", vecCol = "features")
      .select(col("query_id").as("item_id"), col("rank"),
        col("neighbor_id").as("b_neighbor"), col("cosine").as("b_cosine"))

    val joined = blocked.join(brute, Seq("item_id", "rank"), "full").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(4),
        s"row present on only one side: $r")
      val (nbr, cos) = (r.getLong(2), r.getDouble(3))
      val (bNbr, bCos) = (r.getLong(4), r.getDouble(5))
      // identical neighbor, or a genuine cosine tie broken differently by
      // float-normalization rounding (normalize-then-dot vs dot-over-norms)
      assert(nbr == bNbr || math.abs(cos - bCos) < 1e-6,
        s"item ${r.getLong(0)} rank ${r.getInt(1)}: $nbr(cos=$cos) vs $bNbr(cos=$bCos)")
      if (nbr == bNbr)
        assert(math.abs(cos - bCos) < 1e-5,
          s"cosine drift for item ${r.getLong(0)}: $cos vs $bCos")
    }
    // every item with a non-self match gets exactly k=3 rows on both sides
    assert(blocked.count() == brute.count())
  }
}
