package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Parity of the codegen [[TopCellsExpr]] with the HOF formulation it
  * replaced (transform + array_sort(lambda) + slice) — same scores, same
  * score-desc / cell-id-asc tie-break, same null semantics.
  */
class TopCellsExprSpec extends AnyFunSuite with SparkFixture {

  private def topCellsNative(cells: Array[Array[Float]], ids: Array[Int], v: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      TopCellsExpr(org.apache.spark.sql.GraftSqlShims.expression(v), cells, ids, n))

  /** The pre-round-6 HOF reference implementation, verbatim semantics. */
  private def topCellsHof(cells: Array[Array[Float]], ids: Array[Int], v: Column, n: Int): Column = {
    val cellArr = array(ids.zip(cells).map { case (i, cv) =>
      struct(lit(i).as("cell"), array(cv.map(lit): _*).as("centroid"))
    }: _*)
    val scored = transform(
      cellArr,
      c => struct(
        c.getField("cell").as("cell"),
        VectorFunctions.dot(v, c.getField("centroid")).as("score")))
    slice(reverse(array_sort(scored, (a, b) =>
      when(a.getField("score") < b.getField("score"), -1)
        .when(a.getField("score") > b.getField("score"), 1)
        .when(a.getField("cell") > b.getField("cell"), -1)
        .when(a.getField("cell") < b.getField("cell"), 1)
        .otherwise(0))), 1, n).getField("cell")
  }

  private def vecDF(vs: Seq[Array[Float]]) =
    spark.createDataFrame(
      vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq) }.asJava,
      StructType(Seq(
        StructField("id", LongType),
        StructField("v", ArrayType(FloatType)))))

  test("matches the HOF form on random vectors and codebooks, all n") {
    val dim = 7
    val rng = new scala.util.Random(5)
    val cells = Array.fill(13)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val ids = cells.indices.toArray
    val df = vecDF(Seq.fill(200)(Array.fill(dim)(rng.nextFloat() * 2 - 1)))
    for (n <- Seq(1, 3, 13, 20)) {
      val both = df.select(
        topCellsNative(cells, ids, col("v"), n).as("a"),
        topCellsHof(cells, ids, col("v"), n).as("b")).collect()
      both.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"n=$n"))
    }
  }

  test("tie-break picks the lowest cell id, like the HOF form") {
    val dim = 2
    // duplicate centroids force exact score ties in every position
    val cells = Array(Array(1f, 0f), Array(0f, 1f), Array(1f, 0f), Array(0f, 1f))
    val ids = Array(0, 1, 2, 3)
    val df = vecDF(Seq(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f)))
    val both = df.select(
      topCellsNative(cells, ids, col("v"), 4).as("a"),
      topCellsHof(cells, ids, col("v"), 4).as("b")).collect()
    both.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
    // explicit: for (1,0) the equal-score order must be 0,2 then 1,3
    val first = df.where(col("id") === 0)
      .select(topCellsNative(cells, ids, col("v"), 4)).head().getSeq[Int](0)
    assert(first == Seq(0, 2, 1, 3))
  }

  test("subset cell ids (occupied-cell probing) are carried through") {
    val cells = Array(Array(1f, 0f), Array(0f, 1f))
    val ids = Array(3, 11) // non-contiguous ids, as after occupancy filtering
    val df = vecDF(Seq(Array(2f, 1f)))
    val got = df.select(topCellsNative(cells, ids, col("v"), 2)).head().getSeq[Int](0)
    assert(got == Seq(3, 11))
  }

  test("null vector and dimension mismatch yield NULL") {
    val cells = Array(Array(1f, 0f, 0f))
    val df = spark.createDataFrame(
      Seq(Row(1L, null), Row(2L, Seq(1f, 2f))).asJava,
      StructType(Seq(
        StructField("id", LongType),
        StructField("v", ArrayType(FloatType)))))
    val got = df.select(topCellsNative(cells, Array(0), col("v"), 1).as("c")).collect()
    assert(got.forall(_.isNullAt(0)))
  }
}
