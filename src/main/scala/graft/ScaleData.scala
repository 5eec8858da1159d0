package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic scale-tier generator for the measured scaling curve
  * (round-6 verdict #6): /root/testdata tops out at sf0.1, so the >sf0.1
  * evidence comes from deterministic synthetic documents/embeddings dirs
  * whose SHAPE mirrors the fixtures (same schemas, similar text-length and
  * cluster structure) at a chosen multiplier. Pairing an x1 dir with an
  * x10 dir gives an apples-to-apples within-distribution slope for the
  * document and ANN tiers (`graft.ScratchBench` runs the tier queries
  * against either dir).
  *
  * Content properties chosen so scaling is meaningful, not degenerate:
  * words are hash-drawn from a 1000-token vocabulary (shingle/minhash cost
  * scales with corpus, candidate pairs stay collision-driven); a fixed 2%
  * of documents are near-duplicates of their predecessor (id % 50 == 1
  * copies id-1's text plus a suffix token) so dedup tiers always have
  * genuine pairs to find at every scale; embeddings sit in 16 hash-derived
  * cluster centers with 20% noise so IVF has real structure to rout on.
  *
  * Usage: runMain graft.ScaleData <outDir> <nDocs> <nVecs>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/graft_scale_x10")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val nVecs = args.lift(2).map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeDocs(spark, out, nDocs)
    writeVecs(spark, out, nVecs)
    println(s"[scaledata] wrote $nDocs docs + $nVecs vecs to $out")
    spark.stop()
  }

  def writeDocs(spark: SparkSession, out: String, nDocs: Long): Unit = {
    val langs = array(Seq("en", "fr", "de", "es", "it", "pt", "nl", "pl").map(lit): _*)
    // near-dup seed: 2% of docs re-generate their predecessor's words
    val seed = when(pmod(col("doc_id"), lit(50)) === 1, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val nWords = (pmod(xxhash64(seed, lit(1)), lit(91)) + 10).cast("int")
    val body = concat_ws(" ",
      transform(sequence(lit(1), nWords),
        i => concat(lit("w"), pmod(xxhash64(seed, i), lit(1000)).cast("string"))))
    val text = when(pmod(col("doc_id"), lit(50)) === 1, concat(body, lit(" zz")))
      .otherwise(body)
    spark.range(nDocs).select(col("id").as("doc_id"))
      .select(
        col("doc_id"),
        text.as("text"),
        element_at(langs, (pmod(xxhash64(col("doc_id"), lit(7)), lit(8)) + 1).cast("int"))
          .as("lang"),
        concat(lit("src"), pmod(xxhash64(col("doc_id"), lit(11)), lit(5)).cast("string"))
          .as("source"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def writeVecs(spark: SparkSession, out: String, nVecs: Long): Unit = {
    spark.range(nVecs)
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(xxhash64(pmod(col("id"), lit(16)), d), lit(1000)).cast("double") / 1000.0) * 0.8
            + (pmod(xxhash64(col("id"), d, lit(99)), lit(1000)).cast("double") / 1000.0) * 0.2)
            .cast("float")).as("embedding"),
        pmod(col("id"), lit(16)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
