package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness for chasing cross-query JVM-state contamination: runs the
  * named queries in order inside ONE session (Bench's exact config +
  * between-query cleanup) and prints each timing. Not part of the driver
  * contract.
  */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill codec A/B knob (opt guide §2.3): default stays
      // Spark's lz4 so numbers remain comparable across rounds; zstd legs
      // measure the scratch-bytes/CPU trade for the 100 TB posture
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STAGE_MIN lowers the printed-stage threshold (seconds)
    // for fine-grained breakdowns; stage/job counters attribute per-query
    // scheduling overhead (many tiny stages = per-stage fixed cost bound).
    val stageMin = sys.env.get("SPARK_GRAFT_STAGE_MIN")
      .flatMap(_.toDoubleOption).getOrElse(1.0)
    val stageCount = new java.util.concurrent.atomic.AtomicInteger
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val taskCount = new java.util.concurrent.atomic.AtomicInteger
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_JOB_TRACE"))
          println(s"[job] ${j.jobId} ${j.stageInfos.map(_.name.takeWhile(_ != '(')).mkString("<-")}")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageCount.incrementAndGet()
        taskCount.addAndGet(si.numTasks)
        shufWrite.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(si.taskMetrics.shuffleReadMetrics.totalBytesRead)
        val dur = for {
          s <- si.submissionTime
          c <- si.completionTime
        } yield (c - s) / 1000.0
        if (dur.exists(_ > stageMin))
          println(f"[stage] ${si.stageId}%4d ${dur.getOrElse(0.0)}%7.2f s  tasks=${si.numTasks}  ${si.name.take(90)}")
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val s0 = stageCount.get(); val j0 = jobCount.get(); val k0 = taskCount.get()
      val w0 = shufWrite.get(); val r0 = shufRead.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events arrive asynchronously: drain before sampling so a
      // late stage completion is charged to THIS query, not the next
      org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
      println(f"[scratch] $name%-28s $sec%7.2f s  jobs=${jobCount.get() - j0}  stages=${stageCount.get() - s0}  tasks=${taskCount.get() - k0}  shufW=${(shufWrite.get() - w0) >> 20}MB shufR=${(shufRead.get() - r0) >> 20}MB")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
