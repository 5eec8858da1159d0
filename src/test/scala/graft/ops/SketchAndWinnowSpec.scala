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
