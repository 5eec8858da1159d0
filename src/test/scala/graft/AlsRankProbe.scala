package graft

import org.apache.spark.sql.SparkSession

/** THROWAWAY probe (test scope): the RANK axis of the blocked-ALS cost
  * model at a fixed data scale (SCALING §12.14). Every other scale probe
  * holds rank at the suite's 8; production factorizations run 32–256,
  * and rank moves each cost term differently: the factor-routing shuffle
  * is O(rank) bytes, the per-entry Gramian accumulation O(rank²) flops,
  * the per-entity Cholesky solve O(rank³) — so the curve says which term
  * owns the wall as rank grows.
  *
  * Run: runMain graft.AlsRankProbe <ratingsParquet> [ranks csv] [blocks]
  *   (suite protocol otherwise: maxIter=5, reg 0.1, seed 42,
  *    checkpointInterval=1 + checkpoint dir per §12.11)
  */
object AlsRankProbe {
  def main(args: Array[String]): Unit = {
    val ratingsPath = args(0)
    val ranks = args.lift(1).getOrElse("8,16,32,64").split(",").map(_.trim.toInt)
    val blocks = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.rdd.compress", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = s"/tmp/graft_rank_ckpt_${ProcessHandle.current().pid()}"
    spark.sparkContext.setCheckpointDir(ckpt)
    // round-15 verdict #8: the rank sweep was explicit-only; the implicit
    // path adds the O(rank²) broadcast YᵀY term per half-step
    val implicitPrefs = args.lift(3).contains("implicit")
    val ratings = spark.read.parquet(ratingsPath)
    val n = ratings.count()
    println(s"[rank-probe] $n ratings, blocks=$blocks x $blocks, " +
      s"ranks=${ranks.mkString(",")}, implicit=$implicitPrefs")
    for (rank <- ranks) {
      val t0 = System.nanoTime()
      val model = graft.als.GraftALS(
        rank = rank, maxIter = 5, regParam = 0.1,
        numUserBlocks = blocks, numItemBlocks = blocks,
        userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
        implicitPrefs = implicitPrefs,
        checkpointInterval = 1, seed = 42L).fit(ratings)
      model.userFactors.write.format("noop").mode("overwrite").save()
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      model.transform(ratings).write.format("noop").mode("overwrite").save()
      val tTransform = (System.nanoTime() - t1) / 1e9
      println(f"[rank-probe] rank=$rank%-3d train=$tTrain%.1f s transform=$tTransform%.1f s")
      model.unpersist()
    }
    graft.streaming.EventsStream.deleteRecursively(new java.io.File(ckpt))
    spark.stop()
  }
}
