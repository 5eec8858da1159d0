package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope): scale posture of the incremental
  * near-dup pair (`Dedup.minhashIndex` + `incrementalNearDupKeepers`,
  * round 18) — the claim under test is the daily-ingest shape: a FIXED
  * batch dedups against a stored index with O(batch) text reads, so the
  * recurring per-batch cost must grow only with the narrow index scan
  * (bucket keys + hashed shingles), never with corpus TEXT.
  *
  * Per tier (fresh JVM each — run via tools/inc_minhash_r18.sh):
  *   - corpus  = docs ids [2500, 2500+N) of the shared ×1000 fixture
  *   - batch   = docs ids [0, 5000) — CONSTANT across tiers; ids
  *     [2500, 5000) also live in every corpus tier, so ~2500 batch docs
  *     have an exact corpus twin and the verify path does real work at
  *     every tier (matched ≈ constant; only corpus-driven candidate
  *     noise grows)
  *   - index_build  — minhashIndex(corpus) written to parquet (the
  *     amortized-once O(corpus) cost a pipeline pays at ingest)
  *   - incremental  — incrementalNearDupKeepers(batch, read-back index)
  *     forced with a count (the recurring cost; the index enters from
  *     STORAGE, not lineage, exactly as the scaladoc's pipeline would)
  *
  * Usage: runMain graft.IncrementalMinhashProbe <docsDir> <corpusN> [indexDir]
  */
object IncrementalMinhashProbe {
  def main(args: Array[String]): Unit = {
    val docsDir = args(0)
    val corpusN = args(1).toLong
    val indexDir = args.lift(2).getOrElse("/tmp/graft_incmh_index")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[inc] $label%-12s $sec%8.2f s")
      (r, sec)
    }

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    val corpus = docs.where(col("doc_id") >= 2500L && col("doc_id") < 2500L + corpusN)
    val batch = docs.where(col("doc_id") < 5000L)

    timed("warmup")(docs.groupBy(length(col("text")).as("l")).count()
      .write.format("noop").mode("overwrite").save())

    val (_, buildSec) = timed("index_build") {
      graft.ops.Dedup.minhashIndex(corpus)
        .write.mode("overwrite").parquet(indexDir)
    }
    val indexBytes = {
      val dir = new java.io.File(indexDir)
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }

    val index = spark.read.parquet(indexDir)
    val (kept, incSec) = timed("incremental") {
      graft.ops.Dedup.incrementalNearDupKeepers(batch, index).count()
    }

    println(s"[inc] tier corpus=$corpusN index_build=$buildSec index_bytes=$indexBytes " +
      s"bytes_per_doc=${indexBytes / math.max(corpusN, 1L)} incremental=$incSec " +
      s"batch=5000 kept=$kept matched=${5000 - kept}")
    spark.stop()
  }
}
