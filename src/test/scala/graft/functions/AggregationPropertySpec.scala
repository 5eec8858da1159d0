package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized properties for the two primitives whose MAP-SIDE
  * merge correctness the distributed plans rest on:
  *
  *  - [[TopKAggregator]]: Spark may split a group's rows across any number
  *    of partitions, partially reduce each, and merge in any tree shape —
  *    the result must equal the single-pass reduction of all rows.
  *  - [[TopCellsExpr]]: the bounded-insertion selection must equal the
  *    naive sort-everything reference for every vector/codebook, including
  *    duplicate scores (tie-breaks) and top-n larger than the codebook.
  */
class AggregationPropertySpec extends AnyFunSuite {

  test("TopKAggregator: any partition split + merge tree equals the single-pass reduce") {
    val rng = new scala.util.Random(1234)
    for (trial <- 0 until 200) {
      val k = 1 + rng.nextInt(5)
      val agg = new TopKAggregator(k)
      val n = rng.nextInt(40)
      // small id/score domains force duplicate scores (tie-break coverage)
      val rows = Seq.fill(n)((rng.nextInt(10).toLong, rng.nextInt(4).toDouble))
      val expected = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))

      // random split into 1..4 "partitions", each partially reduced, then
      // merged in a random fold order (Spark guarantees no more than this)
      val parts = rows.grouped(math.max(1, n / (1 + rng.nextInt(4))) max 1).toSeq
      val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val shuffled = rng.shuffle(partials)
      val merged = shuffled.foldLeft(agg.zero)(agg.merge)

      assert(merged == expected,
        s"trial $trial k=$k rows=$rows parts=${parts.map(_.size)}")
    }
  }

  test("TopKAggregator: merge with zero is identity and merge is commutative") {
    val rng = new scala.util.Random(99)
    val agg = new TopKAggregator(3)
    for (_ <- 0 until 100) {
      def buf() = Seq.fill(rng.nextInt(8))((rng.nextInt(6).toLong, rng.nextInt(3).toDouble))
        .foldLeft(agg.zero)(agg.reduce)
      val (a, b) = (buf(), buf())
      assert(agg.merge(a, agg.zero) == a)
      assert(agg.merge(agg.zero, a) == a)
      assert(agg.merge(a, b) == agg.merge(b, a))
    }
  }

  test("NormalEquation: any partition split + merge order equals single-pass accumulation") {
    // the fold-in aggregateByKey partially accumulates per partition and
    // merges buffers — Spark guarantees nothing about split or merge order
    val rng = new scala.util.Random(2024)
    for (trial <- 0 until 100) {
      val k = 1 + rng.nextInt(6)
      val rows = Seq.fill(1 + rng.nextInt(30))(
        (Array.fill(k)(rng.nextFloat() * 2 - 1), rng.nextDouble() * 4 - 2))
      val single = new graft.als.NormalEquation(k)
      rows.foreach { case (a, b) => single.add(a, b) }
      val parts = rng.shuffle(rows).grouped(1 + rng.nextInt(rows.size)).toSeq
      val partials = parts.map { p =>
        val ne = new graft.als.NormalEquation(k)
        p.foreach { case (a, b) => ne.add(a, b) }
        ne
      }
      val merged = rng.shuffle(partials).reduceLeft((x, y) => x.merge(y))
      def close(x: Array[Double], y: Array[Double]) =
        x.zip(y).forall { case (p, q) => math.abs(p - q) <= 1e-9 * (1 + math.abs(q)) }
      assert(close(merged.ata, single.ata) && close(merged.atb, single.atb),
        s"trial $trial k=$k parts=${parts.map(_.size)}")
    }
  }

  test("TopCellsExpr eval: equals the naive full-sort reference on random inputs") {
    val rng = new scala.util.Random(777)
    for (trial <- 0 until 200) {
      val dim = 1 + rng.nextInt(6)
      val numCells = 1 + rng.nextInt(10)
      // coarse values force score collisions
      val cells = Array.fill(numCells)(Array.fill(dim)(rng.nextInt(3).toFloat - 1f))
      val ids = {
        // sometimes non-contiguous (occupied-subset probing)
        var next = 0
        Array.fill(numCells) { next += 1 + rng.nextInt(3); next }
      }
      val n = 1 + rng.nextInt(numCells + 3)
      val v = Array.fill(dim)(rng.nextInt(3).toFloat - 1f)

      val expr = TopCellsExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v.toSeq, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        cells, ids, n)
      val got = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq

      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      // `s + 0.0` collapses -0.0 to +0.0: the expression (like Spark SQL
      // comparisons, pinned by the HOF-parity spec) treats signed zeros as
      // equal and tie-breaks by id, while Scala's sortBy total ordering
      // would put -0.0-keyed entries first — a reference artifact, not an
      // expression bug (found by this very property on a zero vector)
      val expected = cells.zip(ids)
        .map { case (c, id) => (id, dot(v, c) + 0.0) }
        .sortBy { case (id, s) => (-(s + 0.0), id) }
        .take(n).map(_._1).toSeq

      assert(got == expected,
        s"trial $trial dim=$dim n=$n v=${v.toSeq} ids=${ids.toSeq} cells=${cells.map(_.toSeq).toSeq}")
    }
  }
}
