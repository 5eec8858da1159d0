package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  test("salted join returns exactly the plain-join result on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"l$i")).toDF("k", "lv")
    val right = (1L to 2000L).map(k => (k, s"r$k")).toDF("k", "rv")
    val expected = left.join(right, "k").collect().map(_.toString).sorted
    val got = SkewJoin.saltedInnerJoin(left, right, "k", saltFactor = 8)
      .select("k", "lv", "rv")
      .collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("skew-aware join salts only hot keys and matches the plain join exactly") {
    import spark.implicits._
    // key 7 owns ~91% of left rows (heavily duplicated); right also carries
    // duplicates on the hot key so hot-slice multiplicity (3 left x 2 right
    // per key-instance pairing) is exercised, not just 1:1 lookup
    val left = ((1 to 20000).map(i => (7L, s"l$i")) ++
      (1 to 2000).map(i => (i.toLong, s"c$i"))).toDF("k", "lv")
    val right = ((1L to 2000L).map(k => (k, s"r$k")) ++
      Seq((7L, "rdup"))).toDF("k", "rv")
    val expected = left.join(right, "k").collect().map(_.toString).sorted
    // sample at 10% so the 20k-row hot key is found with certainty margin
    val got = SkewJoin.skewAwareInnerJoin(
      left, right, "k", saltFactor = 8,
      sampleFraction = 0.1, hotSampleCount = 100L)
      .select("k", "lv", "rv")
      .collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("skew-aware join with no hot keys degenerates to the plain join") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(k => (k, s"r$k")).toDF("k", "rv")
    val expected = left.join(right, "k").collect().map(_.toString).sorted
    val got = SkewJoin.skewAwareInnerJoin(left, right, "k")
      .select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("salting distributes even bit-identical hot rows across salt buckets") {
    import spark.implicits._
    val left = (1 to 1000).map(_ => (7L, "x")).toDF("k", "lv")
    val buckets = SkewJoin.withSalt(left, 8)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length > 1, "hot key must spread over multiple salts")
    assert(buckets.max < 1000, "no single salt bucket may hold everything")
  }
}
