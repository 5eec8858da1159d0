package graft

import org.apache.spark.sql.SparkSession

/** THROWAWAY probe (test scope): trains blocked ALS on the ×1000 tier
  * (599M ratings) in one JVM, chasing the single-box walls one at a time
  * — results in `bench_artifacts/scale_probe_x1000_r15.json` and SCALING
  * §12.7. Walls found: (1) the blockify aggregateByKey holds O(ratings/
  * input-splits) of mutable tile-builder state per map task (growing
  * ArrayBuilders defeat spill size-estimation) — fixed by volume-scaled
  * input splits, which real file layouts provide for free; (2) the
  * in-block builders are unmanaged task-heap, so concurrency must match
  * GB/core (local[8] at 24g ≈ a cluster-typical 3 GB/core passes where
  * local[32] OOMs); (3) scratch DISK: the tile + two in-block shuffles
  * and the MEMORY_AND_DISK persists are each linear in ratings (~50-60 GB
  * at ×1000) — binding on this host, trivially provisioned per-node on a
  * cluster.
  *
  * Run: runMain graft.AlsBlocksX1000Probe <sfDir> [blocks] [inputParts]
  *   [ratingsParquetPath]   (with -Xmx24g and SPARK_GRAFT_CPUS=8)
  */
object AlsBlocksX1000Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_scale_full_x1000")
    // blocks <= 0 selects the volume-based auto rule (BlockedALS.AutoBlocks)
    val blocksArg = args.lift(1).map(_.toInt).getOrElse(64)
    val blocks = if (blocksArg <= 0) graft.als.BlockedALS.AutoBlocks else blocksArg
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Scratch-provisioning knobs for wall 3 (disk, not CPU, binds this
      // run): zstd shuffles (~25% under lz4) and compressed on-disk RDD
      // blocks — MEMORY_AND_DISK spill partitions are UNCOMPRESSED java
      // serialization by default, the single largest scratch line item at
      // ×1000. A scratch-constrained cluster node sets exactly these.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.rdd.compress", "true")
      // Wall 4 (this run's find): each computeFactors half-step shuffles
      // ~13 GB of routed factor messages at ×1000, and WITHOUT a checkpoint
      // dir the explicit path's lineage chain keeps every prior half-step's
      // ShuffleDependency reachable — 10 shuffles × 13 GB over 5 iterations
      // dwarfs the data-sized shuffles (~14 GB total) and ENOSPCs any box.
      // Checkpointing every iteration cuts the chain (the factor RDDs
      // themselves are ~600 MB — the cheap thing to write); the aggressive
      // periodicGC makes ContextCleaner actually DELETE the newly
      // unreachable shuffle files while the run still needs the space.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckptDir = s"/tmp/graft_x1000_ckpt_${ProcessHandle.current().pid()}"
    spark.sparkContext.setCheckpointDir(ckptDir)

    val inputParts = args.lift(2).map(_.toInt).getOrElse(256)
    val t0 = System.nanoTime()
    // Input splits must scale with volume: the sfDir derivation emits
    // spark.sql.shuffle.partitions (32) partitions, so at ×1000 each map
    // task of the blockify aggregateByKey holds ~19M ratings of mutable
    // tile-builder state — combiner spill can't save it (growing
    // ArrayBuilders defeat size estimation) and the probe OOMed exactly
    // there. On a real cluster 600M rows arrive in thousands of file
    // splits; repartition reproduces that.
    // Parquet roundtrip, not a cached DataFrame: each ACTION over the
    // derived frame recompiles to fresh RDDs, so count + fit + transform
    // would re-run the 600M-row join (and leave each run's shuffle files
    // on local disk for the app's lifetime — the first attempt filled the
    // volume exactly that way). A real pipeline trains from a materialized
    // ratings table too.
    val ratingsPath = args.lift(3).getOrElse(
      s"/tmp/graft_x1000_ratings_${ProcessHandle.current().pid()}")
    if (!new java.io.File(ratingsPath, "_SUCCESS").isFile) {
      graft.queries.Queries.ratingsDF(spark, sfDir)
        .repartition(inputParts)
        .write.mode("overwrite").parquet(ratingsPath)
      // drop the derivation's shuffle files NOW (ContextCleaner is
      // GC-driven; at x1000 they are ~34 GB of scratch the training needs)
      System.gc()
      Thread.sleep(3000)
    }
    // r18 wall-3 scratch ledger: a daemon sampler records (t, free bytes,
    // blockmgr bytes, ledger.reaped) every 5 s for the run's lifetime. The
    // reaped counter increments at each checkpoint cut, so the series
    // shows the per-half-step shuffle high-water BETWEEN cuts — flat
    // across iterations if the reap works, a staircase if it does not
    // (the r17 ENOSPC shape). Parsed into als_x1000_wall3_r18.json.
    val tmpFs = new java.io.File("/tmp")
    def blockmgrBytes: Long = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      Option(tmpFs.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
        .map(du).sum
    }
    val samplerStart = System.nanoTime()
    val sampler = new Thread(() => {
      while (true) {
        val t = (System.nanoTime() - samplerStart) / 1e9
        val reaped = Option(graft.als.BlockedALS.lastLedgerForTest)
          .map(_.reaped).getOrElse(0)
        println(f"[scratch] t=$t%.0f free_gb=${tmpFs.getUsableSpace / 1e9}%.1f " +
          f"blockmgr_gb=${blockmgrBytes / 1e9}%.1f reaped=$reaped")
        Thread.sleep(5000)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val ratings = spark.read.parquet(ratingsPath)
    val n = ratings.count()
    val tDerive = (System.nanoTime() - t0) / 1e9
    println(f"[probe] ratings derived: $n rows in $tDerive%.1f s ($inputParts input parts)")

    val t1 = System.nanoTime()
    val implicitPrefs = args.lift(4).contains("implicit")
    val model = graft.als.GraftALS(
      rank = 8, maxIter = 5, regParam = 0.1,
      numUserBlocks = blocks, numItemBlocks = blocks,
      userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
      implicitPrefs = implicitPrefs,
      checkpointInterval = 1, // cut the factor-shuffle lineage chain (wall 4)
      seed = 7L).fit(ratings)
    model.userFactors.write.format("noop").mode("overwrite").save()
    val tTrain = (System.nanoTime() - t1) / 1e9
    // r18 wall-3 fix observability: how many retired factor-routing
    // shuffles the ledger deleted mid-fit (deterministic, vs the GC-timed
    // ContextCleaner path that ENOSPC'd three of four r17 attempts)
    Option(graft.als.BlockedALS.lastLedgerForTest).foreach { ledger =>
      println(s"[probe] shuffle ledger: reaped ${ledger.reaped} retired " +
        "factor shuffles mid-fit")
    }
    val users = model.userFactors.count()
    val items = model.itemFactors.count()
    println(f"[probe] x1000 train blocks=$blocks implicit=$implicitPrefs: $tTrain%.1f s " +
      s"($n ratings, $users users, $items items)")

    val t2 = System.nanoTime()
    model.transform(ratings).write.format("noop").mode("overwrite").save()
    val tTransform = (System.nanoTime() - t2) / 1e9
    println(f"[probe] x1000 transform: $tTransform%.1f s")
    model.unpersist()
    if (args.lift(3).isEmpty)
      graft.streaming.EventsStream.deleteRecursively(new java.io.File(ratingsPath))
    graft.streaming.EventsStream.deleteRecursively(new java.io.File(ckptDir))
    spark.stop()
  }
}
