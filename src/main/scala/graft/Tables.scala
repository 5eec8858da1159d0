package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (see /root/repo/TESTDATA.md, FIXTURES.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read the
  * driver-generated parquet directly. Reads are plain `spark.read.parquet`
  * so Catalyst's parquet source handles column pruning / predicate pushdown;
  * at cluster scale the same code reads a partitioned table root.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all fixture tables as temp views so SQL-form queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
