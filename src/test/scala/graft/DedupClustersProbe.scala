package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** THROWAWAY probe (test scope): decomposes the `dedup_clusters` row at a
  * scale tier into its two phases — exact pair generation
  * (`Dedup.ngramJaccardPairs`, threshold 0.05 / df cap 20, the query's
  * pinned parameters) and connected-components resolution — and prints
  * per-round edge counts for the large-star/small-star loop, chasing the
  * ×1000 superlinear slope recorded in SCALING §12.7 (23.8×/decade vs ~10×
  * input growth).
  *
  * Run: runjvm with test-classes on the cp:
  *   graft.DedupClustersProbe <docsDir> [ccOnly]
  */
object DedupClustersProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/gx/docs_x100")
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
        val dur = for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1000.0
        if (dur.exists(_ > 2.0)) {
          val tm = si.taskMetrics
          println(f"[stage] ${si.stageId}%4d ${dur.getOrElse(0.0)}%7.2f s  tasks=${si.numTasks}" +
            f"  cpu=${tm.executorCpuTime / 1e9}%8.1f  run=${tm.executorRunTime / 1e3}%8.1f" +
            f"  gc=${tm.jvmGCTime / 1e3}%6.1f  spillM=${tm.memoryBytesSpilled / 1e6}%8.0f" +
            f"  spillD=${tm.diskBytesSpilled / 1e6}%8.0f" +
            f"  sRead=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.0f" +
            f"  sWrite=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.0f  ${si.name.take(60)}")
        }
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.load(spark, dir, "documents")
    println(s"[probe] docs = ${docs.count()}")

    val pairs = time("pair_gen (shingle+verify)") {
      val p = Dedup.ngramJaccardPairs(docs, threshold = 0.05, maxDocFrequency = 20)
      println(s"[probe] pairs = ${p.count()}")
      p
    }

    time("pairs_recount_1") { pairs.count() }
    time("pairs_recount_2") { pairs.count() }
    println("[probe] persisted RDDs: " + spark.sparkContext.getPersistentRDDs.size)

    // pair-degree profile: how clique-y is the graph CC has to close?
    time("degree_profile") {
      val deg = pairs.select(col("id_a").as("id")).union(pairs.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      deg.agg(count(lit(1)).as("nodes"), max(col("d")).as("max_deg"),
          avg(col("d")).as("avg_deg"),
          expr("approx_percentile(d, array(0.5, 0.9, 0.99))").as("p"))
        .show(false)
    }

    // local-mode scratch meter: all shuffle/cache files live under the
    // session's /tmp/blockmgr-* dirs
    def blockmgrGb(): Double = {
      import java.nio.file._
      var total = 0L
      val it = Files.list(Paths.get("/tmp")).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("blockmgr-")) {
          val w = Files.walk(p)
          try w.iterator().forEachRemaining { f =>
            if (Files.isRegularFile(f)) total += Files.size(f)
          } finally w.close()
        }
      }
      total / 1e9
    }

    println(f"[probe] blockmgr before CC: ${blockmgrGb()}%.2f GB")
    val comp = time("connected_components") {
      val c = Dedup.connectedComponents(pairs)
      println(s"[probe] labeled nodes = ${c.count()}")
      c
    }
    val ledger = Dedup.lastCcLedgerForTest
    println(s"[probe] cc ledger: reaped ${ledger.reaped} retired round shuffles " +
      s"(${ledger.reapedIds.size} swept + ${ledger.reapedEagerIds.size} eager)")
    println(f"[probe] blockmgr after CC: ${blockmgrGb()}%.2f GB")

    time("cluster_sizes") {
      comp.groupBy("cluster_id").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("clusters"), max(col("n")).as("max_size"),
          avg(col("n")).as("avg_size"))
        .show(false)
    }

    spark.stop()
  }
}
