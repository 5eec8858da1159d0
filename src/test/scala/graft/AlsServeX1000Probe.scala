package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THROWAWAY probe (test scope): extends the r14 serving-kernel evidence a
  * decade — CellIndex build + approx serves over the ×1000 model's
  * 20M-item / 15M-user factor tables (SCALING §12.12). Two phases so the
  * executor shape can differ where the walls differ:
  *
  *   train <ratingsPath> <modelDir>  — local[8]/24g (ALS wall 2: GB/core),
  *       maxIter=1 (factor VALUES don't affect serve timing; shapes do),
  *       checkpointInterval=1 (wall 4), then model.save
  *   serve <modelDir>                — local[32] (the ×100 serve protocol's
  *       core count), times: cosine+MIPS index builds, then
  *       itemNeighborsApprox / recommendForAllUsersApprox at shard
  *       fractions 1/64, 1/16, 1/4 (k=3, mirroring the bench's sharded
  *       rows). Shard-union==full is spec-pinned (GraftALSServingSpec), so
  *       the full-catalog cost is 4× the (·,4) shard by construction.
  */
object AlsServeX1000Probe {

  private def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.io.compression.codec", "zstd")
    .config("spark.rdd.compress", "true")
    .config("spark.cleaner.periodicGC.interval", "1min")
    .getOrCreate()

  private def timed(label: String)(f: => DataFrame): Unit = {
    val t = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"[serve-probe] $label: ${(System.nanoTime() - t) / 1e9}%.1f s")
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "train" =>
      val Array(_, ratingsPath, modelDir) = args.take(3)
      val spark = session(8)
      spark.sparkContext.setLogLevel("WARN")
      val ckpt = s"/tmp/graft_serve_ckpt_${ProcessHandle.current().pid()}"
      spark.sparkContext.setCheckpointDir(ckpt)
      val ratings = spark.read.parquet(ratingsPath)
      val t0 = System.nanoTime()
      val model = graft.als.GraftALS(
        rank = 8, maxIter = 1, regParam = 0.1,
        numUserBlocks = 64, numItemBlocks = 64,
        userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
        checkpointInterval = 1, seed = 7L).fit(ratings)
      model.save(modelDir)
      println(f"[serve-probe] train(maxIter=1)+save: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      model.unpersist()
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(ckpt))
      spark.stop()

    case "serve" =>
      val modelDir = args(1)
      val spark = session(32)
      spark.sparkContext.setLogLevel("WARN")
      val model = graft.als.GraftALSModel.load(spark, modelDir)
      println(s"[serve-probe] loaded: users=${model.userFactors.count()} " +
        s"items=${model.itemFactors.count()} rank=${model.rank}")
      // index BUILD, isolated on a ~20k-query shard (build dominates;
      // mirrors the bench's als_index_build build/serve split)
      timed("cosine_index_build+tiny_serve")(
        model.itemNeighborsApprox(3, itemShard = Some((1, 1024))))
      timed("mips_index_build+tiny_serve")(
        model.recommendForAllUsersApprox(3, userShard = Some((1, 1024))))
      println(f"[serve-probe] servingIndexBytes=${model.servingIndexBytes / 1e9}%.2f GB")
      // warmed sharded serves: 4x apart twice — the linear-in-shard axis
      // of the i·√i law; cell size (the √n axis) is fixed by the corpus
      for (den <- Seq(64, 16, 4)) {
        timed(s"item_neighbors_shard_1of$den")(
          model.itemNeighborsApprox(3, itemShard = Some((1, den))))
        timed(s"recommend_shard_1of$den")(
          model.recommendForAllUsersApprox(3, userShard = Some((1, den))))
      }
      model.unpersist()
      spark.stop()
  }
}
