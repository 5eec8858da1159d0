package graft

import org.apache.spark.sql.SparkSession

/** THROWAWAY (test scope): print the candidate-path pivot's input-size
  * estimate for a tier's documents table, so "which branch runs at sf X"
  * is observed, not assumed.
  */
object PivotCheckProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = Tables.load(spark, dir, "documents")
      println(s"[pivot] $dir sizeInBytes=" +
        docs.queryExecution.optimizedPlan.stats.sizeInBytes +
        s" pivot=${graft.ops.Dedup.KernelMinBytes} " +
        s"branch=${if (docs.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(graft.ops.Dedup.KernelMinBytes)) "join" else "group"}")
    }
    spark.stop()
  }
}
