package graft.als

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Pins the volume-based auto block sizing rule (SCALING §12.7 wall 2):
  * the per-task working set of the iteration cogroup is bounded by the
  * per-block byte budget, so the block count must grow with
  * ratings × rank.
  */
class AutoBlockSizingSpec extends AnyFunSuite with SparkFixture {

  test("autoBlockCount: parallelism floor, volume ceiling, rank scaling") {
    // small data: the parallelism floor wins
    assert(BlockedALS.autoBlockCount(60_000L, 8, 32) == 32)
    assert(BlockedALS.autoBlockCount(1L, 8, 8) == 8)
    // ×1000-scale: volume wins — 599M ratings × (36+4·8) B / 256 MB
    val x1000 = BlockedALS.autoBlockCount(599_351_000L, 8, 32)
    assert(x1000 == 152, s"expected 152 blocks at x1000/rank8, got $x1000")
    // rank grows the routed-message term, so blocks grow with rank
    val r64 = BlockedALS.autoBlockCount(599_351_000L, 64, 32)
    assert(r64 > x1000, s"rank 64 must need more blocks: $r64 vs $x1000")
    // monotone in volume
    assert(BlockedALS.autoBlockCount(1_000_000_000L, 8, 32) >
      BlockedALS.autoBlockCount(500_000_000L, 8, 32))
    // deterministic (same inputs, same grid — init seeds depend on it)
    assert(BlockedALS.autoBlockCount(599_351_000L, 8, 32) == x1000)
  }

  test("AutoBlocks fit is bit-identical to an explicit fit at the resolved count") {
    val rng = new scala.util.Random(31)
    val ratings = Seq.fill(400)(
      Rating(rng.nextInt(30).toLong, rng.nextInt(25).toLong, rng.nextFloat() * 5))
    val rdd = spark.sparkContext.parallelize(ratings, 4)
    val resolved = BlockedALS.autoBlockCount(
      ratings.size.toLong, 4, spark.sparkContext.defaultParallelism)
    def cfg(blocks: Int) = BlockedALS.Config(
      rank = 4, numUserBlocks = blocks, numItemBlocks = blocks,
      maxIter = 3, regParam = 0.05, seed = 11L)
    val (uAuto, iAuto) = BlockedALS.train(rdd, cfg(BlockedALS.AutoBlocks))
    val (uExp, iExp) = BlockedALS.train(rdd, cfg(resolved))
    val a = uAuto.collect().toMap.map { case (k, v) => k -> v.toSeq }
    val e = uExp.collect().toMap.map { case (k, v) => k -> v.toSeq }
    assert(a == e, "auto-resolved user factors must equal explicit-count factors")
    val ai = iAuto.collect().toMap.map { case (k, v) => k -> v.toSeq }
    val ei = iExp.collect().toMap.map { case (k, v) => k -> v.toSeq }
    assert(ai == ei, "auto-resolved item factors must equal explicit-count factors")
  }

  test("GraftALS.fit accepts AutoBlocks end-to-end (estimator surface)") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(7)
    val df = Seq.fill(300)(
      (rng.nextInt(20).toLong, rng.nextInt(15).toLong, rng.nextFloat() * 5))
      .toDF("user_id", "item_id", "rating")
    val m = GraftALS(
      rank = 4, maxIter = 2, regParam = 0.1,
      numUserBlocks = BlockedALS.AutoBlocks, numItemBlocks = BlockedALS.AutoBlocks,
      userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
      seed = 3L).fit(df)
    assert(m.userFactors.count() == df.select("user_id").distinct().count())
    assert(m.itemFactors.count() == df.select("item_id").distinct().count())
    val scored = m.transform(df)
    assert(scored.where(org.apache.spark.sql.functions.col("prediction").isNotNull)
      .count() == 300)
    m.unpersist()
  }

  test("GraftALS default path trains on the auto grid (r17 verdict #3)") {
    // the estimator-surface default IS AutoBlocks on both sides...
    val defaults = GraftALS()
    assert(defaults.numUserBlocks == BlockedALS.AutoBlocks)
    assert(defaults.numItemBlocks == BlockedALS.AutoBlocks)

    // ...and a fit with NO grid params set resolves the same grid the auto
    // rule names: factors are bit-identical to an explicit fit at the
    // resolved count (distinguishes auto from any fixed default — the old
    // 10×10 default produces different block-local solve orders, hence
    // different float rounding, on this data).
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(13)
    val df = Seq.fill(350)(
      (rng.nextInt(40).toLong, rng.nextInt(30).toLong, rng.nextFloat() * 5))
      .toDF("user_id", "item_id", "rating")
    val resolved = BlockedALS.autoBlockCount(
      350L, 4, spark.sparkContext.defaultParallelism)
    def fitWith(u: Int, i: Int) = {
      val base = GraftALS(rank = 4, maxIter = 2, regParam = 0.1,
        userCol = "user_id", itemCol = "item_id", ratingCol = "rating", seed = 5L)
      val est =
        if (u == Int.MinValue) base // the default path: grid params untouched
        else base.copy(numUserBlocks = u, numItemBlocks = i)
      val m = est.fit(df)
      val fs = m.userFactors.orderBy("id").collect().map(_.toSeq).toSeq
      m.unpersist()
      fs
    }
    val viaDefault = fitWith(Int.MinValue, Int.MinValue)
    val viaExplicit = fitWith(resolved, resolved)
    assert(viaDefault == viaExplicit,
      "default-constructed fit must train on the auto-resolved grid")
  }

  test("invalid block counts are rejected up front") {
    val rdd = spark.sparkContext.parallelize(Seq(Rating(1L, 1L, 1f)), 1)
    val e = intercept[IllegalArgumentException] {
      BlockedALS.train(rdd, BlockedALS.Config(numUserBlocks = 0))
    }
    assert(e.getMessage.contains("AutoBlocks"))
    intercept[IllegalArgumentException] {
      BlockedALS.train(rdd, BlockedALS.Config(numItemBlocks = -2))
    }
  }
}
