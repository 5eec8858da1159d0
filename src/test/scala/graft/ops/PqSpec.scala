package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class PqSpec extends AnyFunSuite with SparkFixture {

  private val dim = 16

  private def embDF(vs: Seq[(Long, Array[Float])]): DataFrame =
    spark.createDataFrame(
      vs.map { case (id, v) => Row(id, v.toSeq) }.asJava,
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  /** Vectors clustered around `nClusters` random centers — the regime IVF
    * pruning and PQ quantization are built for.
    */
  private def clusteredVecs(n: Int, nClusters: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    (0L until n.toLong).map { i =>
      val c = centers(rng.nextInt(nClusters))
      (i, c.map(x => x + (rng.nextFloat() - 0.5f) * 0.2f))
    }
  }

  private def quantizationMse(
      vs: Seq[(Long, Array[Float])],
      codes: Map[Long, Seq[Int]],
      cb: Array[Array[Array[Float]]]): Double = {
    val subDim = cb.head.head.length
    val errs = vs.map { case (id, v) =>
      val recon = codes(id).zipWithIndex.flatMap { case (code, m) => cb(m)(code) }
      v.zip(recon).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
    }
    errs.sum / (errs.size * dim)
  }

  private def collectCodes(df: DataFrame): Map[Long, Seq[Int]] =
    df.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[collection.Seq[Int]]("codes").toList)
      .toMap

  test("PQ codes are well-formed and deterministic") {
    val vs = clusteredVecs(80, 4, seed = 11)
    val df = embDF(vs)
    val cb = Similarity.trainPqCodebooks(df, dim = dim,
      numSubspaces = 4, numCentroids = 8, iterations = 2, seed = 5L)
    val a = collectCodes(Similarity.withPqCodes(df, cb))
    val b = collectCodes(Similarity.withPqCodes(df, cb))
    assert(a == b, "encoding must be deterministic")
    assert(a.size == 80)
    a.values.foreach { codes =>
      assert(codes.length == 4)
      assert(codes.forall(c => c >= 0 && c < 8))
    }
  }

  test("trained codebooks quantize with lower error than the random init") {
    val vs = clusteredVecs(200, 5, seed = 23)
    val df = embDF(vs)
    val init = Similarity.pqInit(dim, 4, 8, seed = 7L)
    val trained = Similarity.trainPqCodebooks(df, dim = dim,
      numSubspaces = 4, numCentroids = 8, iterations = 3, seed = 7L)
    val mseInit = quantizationMse(vs, collectCodes(Similarity.withPqCodes(df, init)), init)
    val mseTrained = quantizationMse(vs, collectCodes(Similarity.withPqCodes(df, trained)), trained)
    assert(mseTrained < mseInit * 0.5,
      s"Lloyd iterations must at least halve quantization MSE: $mseInit -> $mseTrained")
  }

  test("above maxTrainRows the Lloyd fit runs on a deterministic hash sample") {
    val vs = clusteredVecs(200, 5, seed = 23)
    val df = embDF(vs)
    def fit() = Similarity.trainPqCodebooks(df, dim = dim,
      numSubspaces = 4, numCentroids = 8, iterations = 3, seed = 7L,
      maxTrainRows = 64)
    val a = fit()
    // deterministic: the seeded hash sample is order-independent
    assert(a.map(_.map(_.toList).toList).toList ==
      fit().map(_.map(_.toList).toList).toList)
    // sampled != full fit (the sample really is a subset)...
    val full = Similarity.trainPqCodebooks(df, dim = dim,
      numSubspaces = 4, numCentroids = 8, iterations = 3, seed = 7L)
    assert(a.map(_.map(_.toList).toList).toList !=
      full.map(_.map(_.toList).toList).toList)
    // ...and still fits the corpus far better than the random init
    val init = Similarity.pqInit(dim, 4, 8, seed = 7L)
    val mseInit = quantizationMse(vs, collectCodes(Similarity.withPqCodes(df, init)), init)
    val mseSampled = quantizationMse(vs, collectCodes(Similarity.withPqCodes(df, a)), a)
    assert(mseSampled < mseInit * 0.6,
      s"sampled fit should approach the full fit: $mseInit -> $mseSampled")
  }

  test("IVF-PQ top-k achieves high recall vs brute force on clustered data") {
    val vs = clusteredVecs(300, 6, seed = 31)
    val df = embDF(vs)
    val cells = Similarity.trainCodebook(df, dim = dim, numCells = 6, iterations = 3)
    val pq = Similarity.trainPqCodebooks(
      Similarity.withCellResiduals(df, cells), vecCol = "residual", dim = dim,
      numSubspaces = 4, numCentroids = 16, iterations = 3)
    val k = 5
    def hits(rerank: Int): Set[(Long, Long)] =
      Similarity.ivfPqTopK(df, df, k = k, rerank = rerank, nProbe = 2,
        numCells = 6, numSubspaces = 4, numCentroids = 16, dim = dim,
        trainedCells = Some(cells), trainedPq = Some(pq)).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = Similarity.bruteForceTopK(df, df, k = k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // ~144 in-probe candidates per query here; rerank=60 still prunes 2.4×
    // before the exact pass and must be near-exact
    val recall60 = (brute & hits(60)).size.toDouble / brute.size
    assert(recall60 >= 0.95, s"IVF-PQ recall@$k at rerank=60 too low: $recall60")
    // at rerank=30 random candidate selection would land ~30/144 ≈ 0.21 —
    // ADC ordering must clearly beat that even inside tight clusters where
    // one-sided quantization noise rivals the true cosine gaps
    val recall30 = (brute & hits(30)).size.toDouble / brute.size
    assert(recall30 >= 0.4, s"ADC ordering no better than random: $recall30")
    // exact re-rank: every reported cosine must equal the true cosine
    val byId = vs.toMap
    Similarity.ivfPqTopK(df, df, k = k, rerank = 60, nProbe = 2,
      numCells = 6, numSubspaces = 4, numCentroids = 16, dim = dim,
      trainedCells = Some(cells), trainedPq = Some(pq)).collect().foreach { r =>
      val q = byId(r.getAs[Long]("query_id"))
      val c = byId(r.getAs[Long]("neighbor_id"))
      val d = q.zip(c).map { case (x, y) => x.toDouble * y }.sum
      val expected = d / (math.sqrt(q.map(x => x.toDouble * x).sum) *
        math.sqrt(c.map(x => x.toDouble * x).sum))
      assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-6)
    }
  }
}
