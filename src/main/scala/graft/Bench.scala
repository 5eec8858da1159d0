package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every registered query at the sf pointed to by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Per VERDICT.md round-1 fixes:
  *   - a failing query is recorded in an `errors` map, never as a timing;
  *   - the timed action is a full materialization via the `noop` sink (all
  *     columns computed, rows fully produced), not `count()` — `count()`
  *     lets Catalyst prune every projected column.
  *
  * Also times MLlib's own ALS on the identical ratings/hyperparameters as
  * the in-repo baseline the BASELINE.md protocol asks for (`als_train_graft`
  * vs `als_train_mllib`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: spark.driver.memory cannot be set here — in local mode the
      // driver JVM already exists. Heap comes from the fork's -Xmx, which
      // build.sbt derives from SPARK_DRIVER_MEM (javaOptions).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        body
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      timed(name) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      // isolate queries: drop DataFrame caches left by bucketed operators
      // and nudge the ContextCleaner (broadcast/shuffle cleanup is
      // GC-driven; with a large heap nothing collects between queries and
      // accumulated state slows later queries by an order of magnitude)
      spark.catalog.clearCache()
      System.gc()
    }

    // head-to-head ALS baseline: same ratings, same hyperparameters, each
    // run from the same cleaned-state baseline (cached query-suite models
    // released first — their persisted factor RDDs otherwise skew the JVM)
    graft.queries.Queries.clearModels()
    spark.catalog.clearCache()
    System.gc()
    timed("als_train_graft") {
      graft.als.GraftALS(
        rank = 8, maxIter = 5, regParam = 0.1,
        numUserBlocks = 8, numItemBlocks = 8,
        userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
        seed = 7L)
        .fit(graft.queries.Queries.ratingsDF(spark, sfDir))
        .userFactors.write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    System.gc()
    timed("als_train_mllib") {
      import org.apache.spark.ml.recommendation.ALS
      new ALS()
        .setRank(8).setMaxIter(5).setRegParam(0.1)
        .setNumUserBlocks(8).setNumItemBlocks(8)
        .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
        .setSeed(7L)
        .fit(graft.queries.Queries.ratingsDF(spark, sfDir))
        .userFactors.write.format("noop").mode("overwrite").save()
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
