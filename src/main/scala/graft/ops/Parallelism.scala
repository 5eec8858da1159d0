package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-split parallelism guard for per-row-heavy operators.
  *
  * A small parquet file arrives as ONE input split, so every narrow stage
  * derived from it (shingling, hashing, norm computation, pairwise scoring
  * below a broadcast join) runs single-threaded until the first shuffle —
  * measured as `(0+1)/1` task counts dominating the dedup/similarity
  * timings on the fixtures. Repartitioning before the heavy per-row
  * compute costs one exchange of the raw rows and buys full-core
  * parallelism on everything above it.
  *
  * At cluster scale inputs already arrive in many splits (one per ~128 MB),
  * so the guard is a structural no-op there — it only fires when the split
  * count is far below the session's parallelism.
  */
object Parallelism {

  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }
}
