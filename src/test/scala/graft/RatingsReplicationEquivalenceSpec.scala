package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the claim [[RatingsTierFixture]] rests on: deriving ratings from a
  * [[ScaleUp]] ×factor tier equals key-shifted replication of the SOURCE
  * tier's derived ratings (same strides). The lineitem⋈orders join and the
  * (o_custkey, l_partkey) groupBy both stay within one replica — key
  * ranges are disjoint by construction — so derivation commutes with
  * replication, row-set-exactly (DOUBLE ratings included: each replica
  * sums the same decimal values in some order, and the sum is computed in
  * decimal(18,2) BEFORE the double cast, so ordering cannot perturb it).
  */
class RatingsReplicationEquivalenceSpec extends AnyFunSuite with SparkFixture {

  private val src = "/root/testdata/sf0.001"

  test("direct ratings replication == derive-from-ScaleUp-tier, exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ratings_equiv")
    try {
      ScaleUp.run(spark, dir.toString, src, factor = 3)
      val fromTier = graft.sources.RatingsSource.fromLineitem(spark, dir.toString)
      val direct = RatingsTierFixture.scaledRatings(spark, src, factor = 3)
      assert(direct.count() ==
        3 * graft.sources.RatingsSource.fromLineitem(spark, src).count())
      // symmetric difference empty — full rows, rating included
      assert(fromTier.exceptAll(direct).count() == 0)
      assert(direct.exceptAll(fromTier).count() == 0)
    } finally {
      graft.streaming.EventsStream.deleteRecursively(dir.toFile)
    }
  }
}
