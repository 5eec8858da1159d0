package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke/probe main: times one named query (or the flagship entry) at a
  * given sfDir. Usage:
  *   runMain graft.Smoke [queryName [sfDir]]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val t0 = System.nanoTime()
    args.lift(0) match {
      case Some(name) if name != "entry" =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(f"[smoke] $name @ $sfDir: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        df.show(5, truncate = false)
      case _ =>
        val df = SparkEntry.entry(spark)
        val n = df.count()
        println(f"[smoke] entry rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        df.show(5, truncate = false)
    }
    spark.stop()
  }
}
