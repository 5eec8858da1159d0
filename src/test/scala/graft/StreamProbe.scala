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

    // NOTE: runToBatch now runs the stream on a CLONED session pinned to
    // the statePartitions argument (the production fix this probe's first
    // sweep motivated), so the sweep passes the count explicitly — setting
    // the parent session's shuffle conf would be a silent no-op, and a
    // listener on the parent session would never see the cloned session's
    // progress events.
    def run(tag: String, parts: Int): Unit = {
      val t0 = System.nanoTime()
      val df = graft.streaming.EventsStream.runToBatch(
        spark, sfDir, graft.streaming.EventsStream.purchaseViewJoin(_),
        s"probe_${tag}_$parts", statePartitions = parts)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] parts=$parts%3d rows=$n%8d  $sec%6.2f s")
      spark.streams.resetTerminated()
      spark.catalog.clearCache(); System.gc()
    }

    Seq(32, 32, 8, 8, 4, 64).foreach(p => run("pv", p))
    spark.stop()
  }
}
