package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY probe (test scope): does the minhash candidates self-join
  * reuse one exchange for both sides at SMJ scale (broadcast disabled),
  * or shuffle the banded frame twice? Decides whether a one-shuffle
  * group-by-bucket pair emission is worth building (§15.3 corrected law:
  * the candidates stage is shuffle-I/O-bound, so saved bytes ≈ saved wall).
  */
object CandPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
    val shingled = graft.ops.Dedup.shingleFrame(docs).persist()
    val withSig = graft.ops.Dedup.XxHash64Minhash.signatures(
      shingled.select(col("id"), explode(col("sh")).as("s")), 64)
    val banded = withSig.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(15)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    banded.count()
    def show(label: String, candidates: org.apache.spark.sql.DataFrame): Unit = {
      candidates.count() // run under AQE so the final plan is the real one
      println(s"==== $label ====")
      println(candidates.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Join") || l.contains("InMemory") ||
            l.contains("AQEShuffleRead") || l.contains("Aggregate") ||
            l.contains("Generate") || l.contains("Sort "))
        .mkString("\n"))
    }
    show("self-join (two exchanges of banded)",
      graft.ops.Dedup.bandedCandidatesJoin(banded, None))
    show("group-by emission (one exchange of banded)",
      graft.ops.Dedup.bandedCandidates(banded, None))
    spark.stop()
  }
}
