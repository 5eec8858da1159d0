package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SparkFixture {

  private def facts() = {
    import spark.implicits._
    val left = (0L until 1000L)
      .map(i => (i % 97, i, s"v$i")).toDF("k", "seq", "payload")
    val right = (0L until 97L).map(i => (i, s"dim$i")).toDF("rk", "label")
    (left, right)
  }

  test("co-located join of bucketed tables has no shuffle exchange") {
    val (left, right) = facts()
    Bucketing.writeBucketed(left, "spec_fact_left", 4, "k")
    Bucketing.writeBucketed(right, "spec_fact_right", 4, "rk")
    val joined =
      Bucketing.coLocatedJoin(spark, "spec_fact_left", "spec_fact_right", "k", "rk")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
  }

  test("bucketed join result equals the plain join") {
    val (left, right) = facts()
    Bucketing.writeBucketed(left, "spec_fact_left", 4, "k")
    Bucketing.writeBucketed(right, "spec_fact_right", 4, "rk")
    val bucketed =
      Bucketing.coLocatedJoin(spark, "spec_fact_left", "spec_fact_right", "k", "rk")
        .select("seq", "label").orderBy("seq")
        .collect().map(r => (r.getLong(0), r.getString(1)))
    val plain = left.join(right, left("k") === right("rk"))
      .select("seq", "label").orderBy("seq")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(bucketed.length == 1000)
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("aggregate on the bucket key reuses the bucket partitioning") {
    val (left, _) = facts()
    Bucketing.writeBucketed(left, "spec_fact_agg", 4, "k")
    val agg = spark.table("spec_fact_agg").groupBy("k")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key must not shuffle:\n$plan")
    assert(agg.count() == 97)
  }

  test("autoBuckets scales power-of-two with source bytes within the clamp") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_autobuckets").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // tiny source: floor of the clamp
    assert(Bucketing.autoBuckets(spark, dir) == 8)
    // force the per-bucket target below the source size: count must rise
    // as a power of two and respect the ceiling
    val widthCap = math.max(64,
      Integer.highestOneBit(spark.sparkContext.defaultParallelism) * 8)
    val nb = Bucketing.autoBuckets(spark, dir, targetBytesPerBucket = 256L)
    assert(nb > 8 && (nb & (nb - 1)) == 0 && nb <= widthCap, s"got $nb")
    // the default cap is WIDTH-driven (8× defaultParallelism, pow-2), not
    // the old constant 64 that saturated at ~4 GB of source — and an
    // explicit cap still passes through for layout-compatibility pins
    assert(Bucketing.autoBuckets(spark, dir, targetBytesPerBucket = 1L) == widthCap)
    assert(widthCap > 64 || spark.sparkContext.defaultParallelism <= 8)
    assert(Bucketing.autoBuckets(spark, dir,
      maxBuckets = 64, targetBytesPerBucket = 1L) == 64)
    assert(Bucketing.autoBuckets(spark, dir,
      maxBuckets = 16, targetBytesPerBucket = 1L) == 16)
  }

  test("range-sorted layout yields disjoint per-file key ranges and pushes the range filter") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rs").toString
    val path = s"$root/sorted"
    val df = (0L until 1000L).map(i => (i, s"payload$i")).toDF("id", "payload")
    Bucketing.writeRangeSorted(df, path, numFiles = 4, sortCol = "id")
    // every parquet part file must cover an id range disjoint from the others
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("id")), max(col("id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.zip(ranges.drop(1)).foreach { case ((_, hi), (lo, _)) =>
      assert(hi < lo, s"file ranges overlap: ${ranges.mkString(", ")}")
    }
    // the range predicate reaches the scan as pushed filters (row-group
    // skipping via footer min/max needs both the stats AND the pushdown)
    val scan = spark.read.parquet(path).where(col("id").between(100L, 160L))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,100)") &&
      plan.contains("LessThanOrEqual(id,160)"),
      s"range filter must be pushed to the scan:\n$plan")
    assert(scan.count() == 61)
    graft.streaming.EventsStream.deleteRecursively(new java.io.File(root))
  }
}
