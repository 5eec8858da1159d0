package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SparkFixture {

  test("as-of join attaches the latest right row at or before the left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "e1"),   // matches right t=5 (equality included)
      (1L, 7L, "e2"),   // matches right t=5
      (1L, 12L, "e3"),  // matches right t=10
      (2L, 3L, "e4"),   // no right row at or before -> null
      (2L, 9L, "e5"),   // matches right t=8
      (3L, 4L, "e6"))   // key with no right rows at all -> null
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, 5L, 100.0),
      (1L, 10L, 200.0),
      (2L, 8L, 300.0))
      .toDF("k", "t", "price")
      .withColumnRenamed("t", "rt")

    val got = AsofJoin.asofJoin(left, right,
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
      rightCols = Seq("price"))
      .select("name", "price")
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    assert(got == Map(
      "e1" -> Some(100.0),
      "e2" -> Some(100.0),
      "e3" -> Some(200.0),
      "e4" -> None,
      "e5" -> Some(300.0),
      "e6" -> None))
  }

  test("duplicate right timestamps resolve to the greatest tiebreak row consistently") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, 7L, 70.0), (1L, 5L, 9L, 90.0))
      .toDF("k", "rt", "rid", "price")
    val r = AsofJoin.asofJoin(left, right, "k", "k", "t", "rt", Seq("rid", "price"))
      .select("rid", "price").head()
    // both payload columns must come from the SAME winning row
    assert(r.getLong(0) == 9L && r.getDouble(1) == 90.0)
  }
}
