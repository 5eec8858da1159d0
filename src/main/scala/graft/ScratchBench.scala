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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime
          c <- si.completionTime
        } yield (c - s) / 1000.0
        if (dur.exists(_ > 1.0))
          println(f"[stage] ${si.stageId}%4d ${dur.getOrElse(0.0)}%7.2f s  tasks=${si.numTasks}  ${si.name.take(90)}")
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
