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

  test("salting distributes even bit-identical hot rows across salt buckets") {
    import spark.implicits._
    val left = (1 to 1000).map(_ => (7L, "x")).toDF("k", "lv")
    val buckets = SkewJoin.withSalt(left, 8)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length > 1, "hot key must spread over multiple salts")
    assert(buckets.max < 1000, "no single salt bucket may hold everything")
  }
}
