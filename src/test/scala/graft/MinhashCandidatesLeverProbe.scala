package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope, round 18): the core-count A/B
  * (`minhash_cores_ab_r18.json`) showed the LSH candidates stage is
  * shuffle-I/O-bound on one box (local[16] ≈ local[32] wall time), so the
  * lever worth measuring is SHUFFLE BYTES, not parallelism: today's
  * production shape self-joins the persisted banded frame on
  * (band, bucket) — two 80M-row shuffle sides at ×1000 plus a distinct —
  * while a groupBy(band, bucket) + sorted-id pair emission ships the same
  * 80M rows ONCE and emits each bucket's pairs directly. Same pair set by
  * construction (both enumerate intra-bucket id pairs, id_a < id_b,
  * distinct across bands). This probe times both over the SAME persisted
  * banded frame, join → grouped → join again (the repeat bounds same-JVM
  * drift), each forced with a count.
  *
  * Run: tools/runjvm_test.sh graft.MinhashCandidatesLeverProbe <docsDir>
  * (fresh JVM, -Xmx24g, SPARK_GRAFT_CPUS=32)
  */
object MinhashCandidatesLeverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_docs_x1000_r18")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val numHashes = 64
    val numBands = 16
    val rowsPerBand = numHashes / numBands

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lever] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    timed("warmup")(docs.groupBy(length(col("text")).as("l")).count()
      .write.format("noop").mode("overwrite").save())

    val shingled = graft.ops.Dedup.shingleFrame(docs).persist()
    val withSig = graft.ops.Dedup.XxHash64Minhash.signatures(
      shingled.select(col("id"), explode(col("sh")).as("s")), numHashes)
    val banded = withSig.select(
      col("id"),
      explode(
        transform(
          sequence(lit(0), lit(numBands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    timed("banded")(banded.count())

    def joinShape = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    def groupedShape = banded
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(
        flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
            struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

    val nJoin = timed("candidates_join")(joinShape.count())
    val nGrouped = timed("candidates_grouped")(groupedShape.count())
    val nJoin2 = timed("candidates_join_2")(joinShape.count())
    println(s"[lever] pairs join=$nJoin grouped=$nGrouped join2=$nJoin2")
    spark.stop()
  }
}
