package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** THROWAWAY probe (test scope): the many-round connected-components
  * regime — a CHAIN of n nodes (worst diameter, so large-star/small-star
  * takes its full O(log n) round count, unlike the sf corpora's 1-2-round
  * star graphs) with a daemon sampler printing the blockmgr scratch
  * footprint every 2 s. On a binary without the round-18 ledger sweep the
  * series staircases up across rounds (each retired round's shuffle files
  * persist to JVM exit); with it the high-water stays one round's working
  * set. Deliberately references NOTHING round-18-specific so the same
  * source compiles against the pre-ledger binary for the A/B.
  *
  * Run: tools/runjvm_test.sh graft.CcChainProbe [nNodes]
  */
object CcChainProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // du over the session's blockmgr dirs; files are created/deleted
    // concurrently by executors and the sweep, so every touch tolerates
    // vanishing paths (walk into a snapshot list, size defensively)
    def blockmgrGb(): Double = {
      import java.io.File
      def du(f: File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.foldLeft(0L)(_ + du(_))).getOrElse(0L)
      Option(new File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("blockmgr-"))
        .foldLeft(0L)(_ + du(_)) / 1e9
    }

    @volatile var sampling = true
    val t0 = System.nanoTime()
    val sampler = new Thread(() => {
      while (sampling) {
        try println(f"[scratch] t=${(System.nanoTime() - t0) / 1e9}%.0f blockmgr_gb=${blockmgrGb()}%.2f")
        catch { case _: Throwable => () }
        Thread.sleep(2000)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val edges = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val comp = Dedup.connectedComponents(edges)
    val agg = comp.agg(count(lit(1)), max(col("cluster_id"))).head()
    sampling = false
    println(f"[probe] chain n=$n cc wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"labeled=${agg.getLong(0)} maxLabel=${agg.getLong(1)}")
    require(agg.getLong(0) == n && agg.getLong(1) == 0L,
      "every chain node must label to component 0")
    println(f"[probe] final blockmgr_gb=${blockmgrGb()}%.2f")
    spark.stop()
  }
}
