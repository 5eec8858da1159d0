package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Pins the bucketed primitive-array IVF-PQ kernel ([[Similarity.ivfPqTopK]])
  * to its Catalyst twin ([[Similarity.ivfPqTopKPlan]]) — the twin is what the
  * sim_topk_ivfpq DuckDB oracle replays stage by stage, so EXACT equality
  * here (ids, ranks, and cosine bits) is what keeps the kernel hash-green
  * through the gate.
  */
class IvfPqKernelSpec extends AnyFunSuite with SparkFixture {

  private val dim = 16

  private def embDF(vs: Seq[(Long, Array[Float])]): DataFrame =
    spark.createDataFrame(
      vs.map { case (id, v) => Row(id, v.toSeq) }.asJava,
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  private def clusteredVecs(n: Int, nClusters: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    (0L until n.toLong).map { i =>
      val c = centers(rng.nextInt(nClusters))
      (i, c.map(x => x + (rng.nextFloat() - 0.5f) * 0.2f))
    }
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Int, Double)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Int]("rank"), r.getAs[Double]("cosine"))).toSeq.sorted

  test("kernel results equal the Catalyst twin bit-for-bit (trained index)") {
    val vs = clusteredVecs(400, 7, seed = 19)
    val df = embDF(vs)
    val cells = Similarity.trainCodebook(df, dim = dim, numCells = 8, iterations = 3)
    val pq = Similarity.trainPqCodebooks(
      Similarity.withCellResiduals(df, cells), vecCol = "residual", dim = dim,
      numSubspaces = 4, numCentroids = 16, iterations = 3)
    val kernel = rows(Similarity.ivfPqTopK(df, df, k = 5, rerank = 40, nProbe = 3,
      numSubspaces = 4, numCentroids = 16, dim = dim,
      trainedCells = Some(cells), trainedPq = Some(pq)))
    val plan = rows(Similarity.ivfPqTopKPlan(df, df, k = 5, rerank = 40, nProbe = 3,
      numSubspaces = 4, numCentroids = 16, dim = dim,
      trainedCells = Some(cells), trainedPq = Some(pq)))
    assert(kernel.nonEmpty)
    assert(kernel == plan,
      s"kernel/plan divergence: ${kernel.diff(plan).take(5)} vs ${plan.diff(kernel).take(5)}")
  }

  test("kernel equals twin under heavy ADC ties (duplicate vectors, untrained init)") {
    // many identical vectors → equal adc scores at the rerank boundary →
    // the (adc desc, id asc) tie-break must agree between kernel and twin
    val rng = new scala.util.Random(3)
    val base = Array.fill(4)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val vs = (0L until 120L).map(i => (i, base((i % 4).toInt).clone()))
    val df = embDF(vs)
    val kernel = rows(Similarity.ivfPqTopK(df, df, k = 4, rerank = 10, nProbe = 2,
      numCells = 4, numSubspaces = 4, numCentroids = 8, dim = dim))
    val plan = rows(Similarity.ivfPqTopKPlan(df, df, k = 4, rerank = 10, nProbe = 2,
      numCells = 4, numSubspaces = 4, numCentroids = 8, dim = dim))
    assert(kernel.nonEmpty)
    assert(kernel == plan)
  }
}
