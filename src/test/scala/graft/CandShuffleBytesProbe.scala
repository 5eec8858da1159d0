package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope): MEASURE (not infer from plan shape) the
  * shuffle bytes each candidate path writes at a tier — the §15.8 scratch
  * claim. Builds the banded frame once (persisted + counted), then runs
  * each path's count with a task-metrics listener summing shuffle
  * write/read bytes between markers.
  *
  * Usage: runMain graft.CandShuffleBytesProbe <docsDir>
  */
object CandShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/tmp/graft_docs_x1000_r18")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val written = new LongAdder
    val read = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          written.add(m.shuffleWriteMetrics.bytesWritten)
          read.add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    val shingled = graft.ops.Dedup.shingleFrame(docs).persist()
    val withSig = graft.ops.Dedup.XxHash64Minhash.signatures(
      shingled.select(col("id"), explode(col("sh")).as("s")), 64)
    val banded = graft.ops.Dedup.bandedFrame(withSig, 16, 4).persist()
    banded.count()

    def measure(label: String, body: => Long): Unit = {
      Thread.sleep(500) // drain stragglers' metrics before the marker
      val w0 = written.sum(); val r0 = read.sum()
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[shuf] $label%-6s pairs=$n%-8d wall=$sec%7.2f s " +
        f"write=${(written.sum() - w0) / 1e9}%6.3f GB read=${(read.sum() - r0) / 1e9}%6.3f GB")
    }

    measure("group", graft.ops.Dedup.bandedCandidates(banded, None).count())
    measure("join", graft.ops.Dedup.bandedCandidatesJoin(banded, None).count())
    spark.stop()
  }
}
