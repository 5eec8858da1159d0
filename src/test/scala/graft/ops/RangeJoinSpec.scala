package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed range join must produce EXACTLY the rows of the naive theta
  * join (`t BETWEEN start AND end`) for every interval shape: sub-bucket,
  * multi-bucket, point, boundary-touching, overlapping, and empty.
  */
class RangeJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("bucketed range join matches the theta join on adversarial intervals") {
    val probes = (0L until 500L).map(i => (i, ts(i * 37)))
      .toDF("event_id", "t")
    val intervals = Seq(
      (1L, ts(0), ts(10)),          // sub-bucket at origin
      (2L, ts(50), ts(5000)),       // spans many buckets
      (3L, ts(3600), ts(3600)),     // point interval ON a bucket boundary
      (4L, ts(7100), ts(7300)),     // straddles a bucket boundary
      (5L, ts(100), ts(200)),       // overlaps interval 2
      (6L, ts(1000000), ts(1000100)) // matches nothing
    ).toDF("win_id", "win_start", "win_end")

    val bucketed = RangeJoin
      .bucketedRangeJoin(probes, intervals, "t", "win_start", "win_end", bucketWidth = 3600)
      .select("event_id", "win_id")
    val theta = probes
      .join(intervals, col("t") >= col("win_start") && col("t") <= col("win_end"))
      .select("event_id", "win_id")

    val b = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val n = theta.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(b.sameElements(n), s"bucketed=${b.length} rows, theta=${n.length} rows")
    assert(n.nonEmpty)
    // overlapping intervals produce one row per matching interval: probes in
    // [100,200] match both window 2 and window 5
    assert(n.groupBy(_._1).exists(_._2.length >= 2))
  }

  test("disjoint intervals give at most one match per probe row") {
    val probes = (0L until 200L).map(i => (i, ts(i * 61))).toDF("event_id", "t")
    val intervals = (0L until 4L).map(d =>
      (d, ts(d * 3000), ts(d * 3000 + 999))).toDF("win_id", "win_start", "win_end")
    val out = RangeJoin
      .bucketedRangeJoin(probes, intervals, "t", "win_start", "win_end", bucketWidth = 500)
      .groupBy("event_id").count().where(col("count") > 1)
    assert(out.count() == 0)
  }
}
