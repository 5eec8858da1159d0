package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite with SparkFixture {

  test("topK matches sort-and-take on random grouped data") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = Seq.fill(3000)((rng.nextInt(20).toLong, rng.nextLong(100000), rng.nextInt(1000).toDouble))
    val df = rows.toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(TopKAggregator.topK(5)(col("id"), col("score")).as("top"))
      .collect()
      .map(r => r.getLong(0) -> {
        val top = r.getStruct(1)
        top.getSeq[Long](0).zip(top.getSeq[Double](1))
      })
      .toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).distinct
        .sortBy { case (i, s) => (-s, i) }.take(5)
    }
    // NOTE: duplicates (same id+score) may occur in the random data; the
    // aggregator keeps duplicates as distinct rows, so compare per-position
    expected.keys.foreach { g =>
      val exp = rows.filter(_._1 == g).map(r => (r._2, r._3))
        .sortBy { case (i, s) => (-s, i) }.take(5)
      assert(got(g).toSeq == exp, s"group $g")
    }
  }

  test("ties broken by id ascending; short groups return all rows") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 7L, 5.0), (1L, 99L, 1.0)).toDF("g", "id", "score")
    val r = df.groupBy("g").agg(TopKAggregator.topK(2)(col("id"), col("score")).as("t"))
      .select("t.ids").head().getSeq[Long](0)
    assert(r == Seq(7L, 10L))
    val all = df.groupBy("g").agg(TopKAggregator.topK(10)(col("id"), col("score")).as("t"))
      .select("t.ids").head().getSeq[Long](0)
    assert(all == Seq(7L, 10L, 99L))
  }
}
