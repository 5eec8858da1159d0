package graft

import org.apache.spark.sql.SparkSession

/** THROWAWAY probe (test scope): decompose stream_purchase_views' ~9s
  * fixed cost — flat across sf0.001..×100, so it is micro-batch machinery,
  * not data. Times the stream-stream interval join under varying
  * shuffle-partition counts (= state-store instances per stateful op) and
  * reports micro-batch count + per-batch durations from query progress.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.StreamProbe"
  */
object StreamProbe {
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

    // untimed warmup (parquet reader, codegen, noop sink)
    graft.Tables.load(spark, sfDir, "region")
      .write.format("noop").mode("overwrite").save()

    def run(tag: String, parts: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val df = graft.streaming.EventsStream.runToBatch(
        spark, sfDir, graft.streaming.EventsStream.purchaseViewJoin(_),
        s"probe_${tag}_$parts")
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] parts=$parts%3d rows=$n%8d  $sec%6.2f s")
      spark.streams.resetTerminated()
      spark.catalog.clearCache(); System.gc()
    }

    // batch-count visibility: listener prints each progress line
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(f"[probe]   batch=${p.batchId}%2d rows=${p.numInputRows}%8d " +
          f"durMs=${p.batchDuration}%6d addBatch=${p.durationMs.getOrDefault("addBatch", -1L)}%6d " +
          f"commit=${p.durationMs.getOrDefault("commitOffsets", -1L)}%5d " +
          f"getBatch=${p.durationMs.getOrDefault("getBatch", -1L)}%5d " +
          f"plan=${p.durationMs.getOrDefault("queryPlanning", -1L)}%5d")
      }
    })

    Seq(32, 32, 8, 8, 4, 64).foreach(p => run("pv", p))
    spark.stop()
  }
}
