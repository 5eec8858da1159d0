package graft

import org.apache.spark.sql.SparkSession

/** THROWAWAY comparator for [[AlsRankProbe]] (test scope): MLlib ALS at the
  * same ranks on the same ratings parquet, same session knobs (zstd,
  * rdd.compress, checkpoint interval 1 + dir), fresh JVM — answers whether
  * the hand-rolled NormalEquation Gramian loop stays competitive with
  * MLlib's netlib `spr` in the rank regime where that loop owns the wall
  * (SCALING §12.14).
  *
  * Run: runMain graft.MllibRankProbe <ratingsParquet> [ranks csv] [blocks]
  */
object MllibRankProbe {
  def main(args: Array[String]): Unit = {
    val ratingsPath = args(0)
    val ranks = args.lift(1).getOrElse("8,64").split(",").map(_.trim.toInt)
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
    val ckpt = s"/tmp/graft_mllib_rank_ckpt_${ProcessHandle.current().pid()}"
    spark.sparkContext.setCheckpointDir(ckpt)
    val implicitPrefs = args.lift(3).contains("implicit")
    val ratings = spark.read.parquet(ratingsPath)
    println(s"[mllib-rank-probe] ${ratings.count()} ratings, blocks=$blocks, " +
      s"ranks=${ranks.mkString(",")}, implicit=$implicitPrefs")
    for (rank <- ranks) {
      val t0 = System.nanoTime()
      val model = new org.apache.spark.ml.recommendation.ALS()
        .setRank(rank).setMaxIter(5).setRegParam(0.1)
        .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
        .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
        .setImplicitPrefs(implicitPrefs)
        .setCheckpointInterval(1)
        .setSeed(42L)
        .fit(ratings)
      model.userFactors.write.format("noop").mode("overwrite").save()
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      model.transform(ratings).write.format("noop").mode("overwrite").save()
      val tTransform = (System.nanoTime() - t1) / 1e9
      println(f"[mllib-rank-probe] rank=$rank%-3d train=$tTrain%.1f s transform=$tTransform%.1f s")
    }
    graft.streaming.EventsStream.deleteRecursively(new java.io.File(ckpt))
    spark.stop()
  }
}
