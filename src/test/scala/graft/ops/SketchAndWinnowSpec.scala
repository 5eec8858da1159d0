package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchAndWinnowSpec extends AnyFunSuite with SparkFixture {

  test("HLL approximate distinct stays within 5% of exact on the fixtures") {
    val r = Tables.load(spark, "/root/testdata/sf0.01", "lineitem").agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("approximate median brackets the exact median") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val approx = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("mergeable sketches: partial HLL union and theta intersection stay within bounds") {
    import spark.implicits._
    // 40k ids split into 4 groups; purchasers = [0, 25k), viewers = [15k, 40k)
    // → true intersection = 10k
    val rows = (0L until 40000L).map(i => (i, (i % 4).toString))
    val df = rows.toDF("uid", "grp")

    // pre-aggregate per group, merge the sketches — the 100 TB shape
    val merged = df.groupBy("grp")
      .agg(expr("hll_sketch_agg(uid)").as("hll"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(hll))").as("est"))
      .head().getLong(0)
    assert(math.abs(merged - 40000.0) / 40000.0 < 0.05,
      s"merged HLL estimate $merged too far from 40000")

    val inter = df
      .agg(
        expr("theta_sketch_agg(CASE WHEN uid < 25000 THEN uid END)").as("p"),
        expr("theta_sketch_agg(CASE WHEN uid >= 15000 THEN uid END)").as("v"))
      .select(expr("theta_sketch_estimate(theta_intersection(p, v))"))
      .head().getLong(0).toDouble
    assert(math.abs(inter - 10000.0) / 10000.0 < 0.15,
      s"theta intersection estimate $inter too far from 10000")
  }

  test("approx_top_k surfaces the true heavy hitters on skewed keys") {
    import spark.implicits._
    // keys 0..99 appear once; keys 1000/1001/1002 appear 500/400/300 times
    val skew = Seq.fill(500)(1000L) ++ Seq.fill(400)(1001L) ++ Seq.fill(300)(1002L)
    val df = ((0L until 100L) ++ skew).toDF("k")
    val top = df.agg(expr("approx_top_k(k, 3)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(1000L, 1001L, 1002L), s"heavy hitters wrong: $top")
  }

  test("winnowing: shared token runs guarantee shared fingerprints") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = Seq(
      (1L, base),
      (2L, "prefix words here " + base + " suffix words there"), // shares a long run
      (3L, "totally different content with no overlap whatsoever at all ok"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // doc2 contains doc1's full token run -> must share fingerprints
    assert((fps(1L) & fps(2L)).nonEmpty, "embedded run must share fingerprints")
    val overlap12 = (fps(1L) & fps(2L)).size.toDouble / fps(1L).size
    assert(overlap12 > 0.5, s"overlap only $overlap12")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs must not collide")
  }

  test("winnowing handles docs shorter than the window") {
    import spark.implicits._
    val fps = TextOps.winnowFingerprints(
      Seq((1L, "a b c")).toDF("doc_id", "text"), window = 4)
      .head().getSeq[Long](1)
    assert(fps.length == 1)
  }
}
