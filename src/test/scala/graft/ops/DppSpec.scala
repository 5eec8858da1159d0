package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning: a join on the partition column against a
  * runtime-filtered dimension must inject a `dynamicpruning` expression
  * into the partitioned scan, so only the matching partition directories
  * are read.
  */
class DppSpec extends AnyFunSuite with SparkFixture {

  test("joining a filtered dim on the partition column prunes at runtime") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    (0L until 400L).map(i => (i, s"p${i % 8}", s"payload$i"))
      .toDF("id", "part", "payload")
      .write.partitionBy("part").parquet(s"$root/fact")
    Seq(("p1", "keep"), ("p5", "keep"), ("p2", "drop"))
      .toDF("part", "verdict")
      .write.parquet(s"$root/dim")
    val fact = spark.read.parquet(s"$root/fact")
    val dim = spark.read.parquet(s"$root/dim").where(col("verdict") === "keep")
    val joined = fact.join(dim, "part").select("id", "part")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 100 && got.forall(r => r._2 == "p1" || r._2 == "p5"))
    graft.streaming.EventsStream.deleteRecursively(new java.io.File(root))
  }
}
