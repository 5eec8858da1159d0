package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`).
  *
  * Three tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k via a blocked cross join +
  *     window rank. O(n·m); the correctness baseline and the right answer
  *     when one side is small enough to broadcast.
  *   - [[lshTopK]] — random-hyperplane LSH: candidates only from matching
  *     sign-buckets across several tables, then exact re-rank. The scale
  *     path: shuffle volume ∝ bucket occupancy, not n².
  *   - [[ivfTopK]] — IVF-style coarse quantization against a deterministic
  *     centroid codebook; queries probe the `nProbe` nearest cells. The
  *     100 TB pattern (partition pruning by cell).
  */
object Similarity {

  /** Deterministic pseudo-random unit hyperplanes: plane p component d =
    * a fixed hash-derived value in [−1, 1). Generated driver-side from the
    * seed only (no RNG state), so signatures are reproducible anywhere.
    */
  private[ops] def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Float]] = {
    Array.tabulate(numPlanes) { p =>
      val rng = new java.util.Random(seed * 1000003L + p)
      Array.fill(dim)((rng.nextFloat() * 2f) - 1f)
    }
  }

  /** Adds `sigs: ARRAY<STRUCT<table INT, sig BIGINT>>` — per LSH table, the
    * packed sign-bit signature of the vector against that table's planes.
    */
  private[ops] def withHyperplaneSignatures(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      planesPerTable: Int,
      numTables: Int,
      seed: Long): DataFrame = {
    val sigCols: Seq[Column] = (0 until numTables).map { t =>
      val planes = hyperplanes(dim, planesPerTable, seed + t)
      val bits: Seq[Column] = planes.zipWithIndex.map { case (plane, i) =>
        val planeCol = array(plane.map(v => lit(v)): _*)
        when(VectorFunctions.dot(col(vecCol), planeCol) >= 0.0, shiftleft(lit(1L), i))
          .otherwise(lit(0L))
      }
      struct(lit(t).as("table"), bits.reduce((a, b) => a.bitwiseOR(b)).as("sig"))
    }
    df.withColumn("sigs", array(sigCols: _*))
  }

  /** cosine(a,b) from a precomputed-norm pair: one dot per pair instead of
    * three (norms are per-ROW and must be computed before the pairwise join,
    * not inside it — n+m norm evals instead of n·m).
    */
  private def cosineWithNorms(qv: Column, cv: Column, qn: Column, cn: Column): Column =
    when(qn === 0.0 || cn === 0.0, 0.0)
      .otherwise(VectorFunctions.dot(qv, cv) / (qn * cn))

  /** Exact cosine top-k neighbors for every query vector. `queries` and
    * `corpus` must expose (idCol, vecCol). Self-matches excluded. Ties
    * broken by neighbor id, so results are fully deterministic.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // widen the probe side: below the (broadcast) pairwise join the output
    // keeps the probe's partitioning, so a single-split probe would score
    // all n·m pairs in one task
    val q = Parallelism.widen(queries).select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFunctions.norm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k: candidates = pairs sharing a bucket in
    * any table, exact cosine re-rank inside the candidate set.
    */
  def lshTopK(
      vectors: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      numPlanes: Int = 10,
      numTables: Int = 6,
      seed: Long = 42L): DataFrame = {
    val base = Parallelism.widen(vectors).select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.norm(col(vecCol)).as("n"))
    val sigs = withHyperplaneSignatures(base, "v", dim, numPlanes, numTables, seed)
    // bands carry ONLY ids — the dedup `distinct` then exchanges 16-byte
    // rows, not 64-float vectors; vectors re-attach after dedup
    val banded = sigs.select(col("id"), explode(col("sigs")).as("ts"))
      .select(col("id"), col("ts.table").as("t"), col("ts.sig").as("sig"))
    val candidatePairs = banded.as("x")
      .join(banded.as("y"),
        col("x.t") === col("y.t") &&
          col("x.sig") === col("y.sig") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("query_id"), col("y.id").as("neighbor_id"))
      .distinct()
    val candidates = candidatePairs
      .join(base.select(col("id").as("query_id"), col("v").as("qv"), col("n").as("qn")), "query_id")
      .join(base.select(col("id").as("neighbor_id"), col("v").as("cv"), col("n").as("cn")), "neighbor_id")
      .withColumn("cosine", cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic IVF codebook: `numCells` pseudo-random unit-ish
    * centroids. A production system would train these with k-means; the
    * query plan (assign → probe → re-rank) is identical either way.
    */
  private[ops] def codebook(dim: Int, numCells: Int, seed: Long): Array[Array[Float]] =
    hyperplanes(dim, numCells, seed * 7919L)

  /** IVF-style ANN: every corpus vector is assigned to its nearest centroid
    * cell (one narrow pass); each query probes its `nProbe` nearest cells
    * and re-ranks exactly inside them. The cell column is the partition-
    * pruning key at scale — a 100 TB corpus stored partitioned by cell only
    * scans `nProbe/numCells` of the data per query batch.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      nProbe: Int = 4,
      numCells: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val cells = codebook(dim, numCells, seed)
    val cellArr = array(cells.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("cell"), array(cv.map(lit): _*).as("centroid"))
    }: _*)

    def scoredCells(v: Column): Column = transform(
      cellArr,
      c => struct(
        c.getField("cell").as("cell"),
        VectorFunctions.dot(v, c.getField("centroid")).as("score")))

    def topCells(v: Column, n: Int): Column =
      slice(reverse(array_sort(scoredCells(v), (a, b) =>
        when(a.getField("score") < b.getField("score"), -1)
          .when(a.getField("score") > b.getField("score"), 1)
          .otherwise(0))), 1, n).getField("cell")

    val assignedCorpus = Parallelism.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        VectorFunctions.norm(col(vecCol)).as("cn"))
      .withColumn("cell", topCells(col("cv"), 1).getItem(0))

    val probedQueries = Parallelism.widen(queries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VectorFunctions.norm(col(vecCol)).as("qn"))
      .withColumn("cell", explode(topCells(col("qv"), nProbe)))

    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    probedQueries.join(assignedCorpus, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
