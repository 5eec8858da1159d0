package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (test scope): the width-driven [[graft.ops.Bucketing
  * .autoBuckets]] cap vs the retired constant-64 cap on the ×100 fact
  * table — round-12 verdict #6 ("maxBuckets=64 saturates at ~4 GB of
  * source; make the cap volume/width-driven and show the ×100 fact table
  * picking >64 where the math says so").
  *
  * Two measurements per bucket count (the old cap's pick and the new
  * cap's pick at a per-bucket target scaled so the math asks for >64):
  * bucketed INGEST (repartition + bucketBy write) and the steady-state
  * exchange-free JOIN against a same-count bucketed orders table. The
  * join plan is asserted Exchange-free at BOTH counts — the pow-2
  * divisibility contract the cap must preserve.
  *
  * Run: sbt "Test/runMain graft.BucketCapProbe /tmp/graft_scale_full_x100"
  */
object BucketCapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_full_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")

    // the ×100 lineitem's on-disk bytes, and the bucket counts the two cap
    // policies pick at a per-bucket target 1/16th of production (the ×100
    // fixture is ~1-2 GB where a real fact table is tens of TB; shrinking
    // the target is the volume stand-in that puts the MATH over 64)
    val target = (64L << 20) / 16
    val nbOld = graft.ops.Bucketing.autoBuckets(
      spark, s"$dir/lineitem.parquet", maxBuckets = 64,
      targetBytesPerBucket = target)
    val nbNew = graft.ops.Bucketing.autoBuckets(
      spark, s"$dir/lineitem.parquet", targetBytesPerBucket = target)
    println(s"[bucketcap] old-cap pick=$nbOld new-cap pick=$nbNew")

    def measure(nb: Int, tag: String): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      graft.ops.Bucketing.writeBucketed(li, s"bcap_li_$tag", nb, "l_orderkey")
      graft.ops.Bucketing.writeBucketed(
        ord.select(col("o_orderkey"), col("o_totalprice")),
        s"bcap_ord_$tag", nb, "o_orderkey")
      val ingest = (System.nanoTime() - t0) / 1e9
      val joined = graft.ops.Bucketing.coLocatedJoin(
        spark, s"bcap_li_$tag", s"bcap_ord_$tag", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"bucketed join at nb=$nb shuffled:\n$plan")
      val t1 = System.nanoTime()
      val rows = joined
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice") * col("o_totalprice")).as("x"))
        .count()
      val join = (System.nanoTime() - t1) / 1e9
      (ingest, join, rows)
    }
    val (iOld, jOld, rOld) = measure(nbOld, "old")
    val (iNew, jNew, rNew) = measure(nbNew, "new")
    require(rOld == rNew, s"result drift: $rOld vs $rNew")
    val line =
      f"""{"dir":"$dir","target_bytes_per_bucket":$target,""" +
      f""""nb_old_cap":$nbOld,"nb_new_cap":$nbNew,""" +
      f""""ingest_old_sec":$iOld%.2f,"join_old_sec":$jOld%.2f,""" +
      f""""ingest_new_sec":$iNew%.2f,"join_new_sec":$jNew%.2f}"""
    println(s"[bucketcap] $line")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
        "/root/repo/bench_artifacts/bucket_cap_probe_r13.json")),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
