package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope, like TransformProbe): band-bucket occupancy
  * of the dedup MinHash-LSH pipeline at a scale tier — answers round-10
  * verdict #6 ("is dedup_minhash_keepers' ×100 slope bucket-skew creeping
  * toward the pre-cap LSH failure mode?") with a measured histogram instead
  * of an argument. Prints bucket-count, occupancy percentiles, the largest
  * buckets, and the implied candidate-pair volume Σ n·(n−1)/2.
  *
  * Run: sbt "Test/runMain graft.MinhashBucketProbe [sfDir]"
  */
object MinhashBucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_full_x100"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
    val numHashes = 64
    val numBands = 16
    val rowsPerBand = numHashes / numBands
    // the exact banded frame minhashNearDups builds (XxHash64 family,
    // default shingle size) — one row per (doc, band)
    val sigs = graft.ops.Dedup.minhashSignatures(docs)
    val banded = sigs.select(
      col("id"),
      explode(
        transform(
          sequence(lit(0), lit(numBands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val occ = banded.groupBy("band", "bucket").count().persist()
    val stats = occ.agg(
      count(lit(1)).as("buckets"),
      sum("count").as("rows"),
      max("count").as("max_occ"),
      expr("percentile_approx(count, array(0.5, 0.9, 0.99, 0.999), 10000)").as("pcts"),
      sum(col("count") * (col("count") - 1)).as("cand_pairs_2x")).head()
    println(s"[minhash-probe] sfDir=$sfDir buckets=${stats.getLong(0)} " +
      s"bandedRows=${stats.getLong(1)} maxOcc=${stats.getLong(2)} " +
      s"p50/p90/p99/p999=${stats.getSeq[Long](3).mkString("/")} " +
      s"candidatePairs=${stats.getLong(4) / 2}")
    println("[minhash-probe] top 20 buckets:")
    occ.orderBy(desc("count")).limit(20).collect()
      .foreach(r => println(f"  band=${r.getInt(0)}%3d bucket=${r.getLong(1)}%20d occ=${r.getLong(2)}%8d"))
    // occupancy histogram by log2 size class
    println("[minhash-probe] occupancy histogram (log2 classes):")
    occ.withColumn("cls", floor(log2(col("count"))))
      .groupBy("cls").agg(count(lit(1)).as("buckets"),
        sum(col("count") * (col("count") - 1)).as("pairs2x"))
      .orderBy("cls").collect()
      .foreach(r => println(f"  2^${r.getLong(0)}%2d..: buckets=${r.getLong(1)}%10d pairs=${r.getLong(2) / 2}"))
    occ.unpersist()
    spark.stop()
  }
}
