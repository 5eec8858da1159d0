package graft

import org.apache.spark.sql.SparkSession

/** Standalone ALS head-to-head (BASELINE.md protocol rows 2 and 3), run in
  * its OWN JVM so the timings are free of accumulated session state.
  *
  * Round-5 verdict: the in-suite head-to-head recorded `als_transform_graft`
  * at 85s vs MLlib's 10.8s purely because it ran as the last thing after 102
  * queries + two trainings in one JVM (codegen cache pressure + uncollected
  * broadcast/shuffle state); the same code in a fresh JVM measures ~1.0x.
  * `Bench` forks this main as a child process and merges the four rows into
  * its JSON, so the official record now measures the protocol, not JVM decay.
  *
  * Usage: graft.HeadToHead <outFile> [side] — writes one JSON object
  * {"als_train_graft":sec,...,"blas":"<impl>"} to outFile.
  *
  * `side` (round-10, verdict #2): `all` (default) runs the original
  * 4-row sequence; `graft` / `mllib` runs ONLY that engine's train +
  * transform, so a repeat harness ([[HeadToHeadRepeats]]) can give both
  * engines an IDENTICAL JVM history (warmup → train → settle → transform,
  * each side in its own fresh fork). The round-9 ×100 transform reading
  * (1.72×) rode a fixed fork order where graft's transform ran third and
  * MLlib's fourth in one JVM — per-side isolation removes that asymmetry
  * instead of arguing about it.
  */
object HeadToHead {
  /** JDK17 module opens Spark needs when launched outside spark-submit.
    * Mirrors build.sbt / org.apache.spark.launcher.JavaModuleOptions.
    */
  val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Which BLAS backend dev.ludovic.netlib actually loaded (native JNI vs
    * pure-Java fallback). Surfaced in bench output so a deployment knows
    * which path the solvers took (BASELINE.md "BLAS note"). Reflective so a
    * classpath without netlib degrades to "unavailable" instead of failing.
    */
  def blasImpl(): String =
    try {
      val cls = Class.forName("dev.ludovic.netlib.blas.BLAS")
      cls.getMethod("getInstance").invoke(null).getClass.getSimpleName
    } catch { case _: Throwable => "unavailable" }

  /** Forks `graft.HeadToHead` in a fresh JVM (optionally one `side`:
    * "graft" | "mllib") and returns its parsed numeric rows plus the BLAS
    * impl it reported. The ONE place the fork command line and output
    * parsing live — shared by [[Bench]]'s in-suite fork and
    * [[HeadToHeadRepeats]]' per-side alternation, so the two protocols
    * cannot silently diverge on JVM flags or format.
    */
  def forkAndParse(
      sfDir: String,
      cpus: String,
      xmx: String = "8g",
      side: Option[String] = None,
      rank: Int = 8): (Map[String, Double], Option[String]) = {
    val out = java.nio.file.Files.createTempFile(
      s"graft_h2h${side.fold("")("_" + _)}", ".json")
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cmd: Seq[String] =
      Seq(javaBin) ++ jdk17AddOpens ++ Seq(
        s"-Xmx$xmx", "-XX:ReservedCodeCacheSize=512m",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", System.getProperty("java.class.path"),
        "graft.HeadToHead", out.toString) ++ side.toSeq
    val pb = new ProcessBuilder(cmd: _*).inheritIO()
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.environment().put("SPARK_GRAFT_H2H_RANK", rank.toString)
    val exit = pb.start().waitFor()
    val text = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    try java.nio.file.Files.deleteIfExists(out) catch { case _: Throwable => () }
    if (exit != 0 || text.isEmpty)
      sys.error(s"head-to-head fork${side.fold("")(" (" + _ + ")")} " +
        s"exited $exit with ${text.length}B output")
    val num = """"(\w+)":([0-9.eE+-]+)""".r
    val rows = num.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val blas = """"blas":"(\w+)"""".r.findFirstMatchIn(text).map(_.group(1))
    (rows, blas)
  }

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/graft_headtohead.json")
    val side = args.lift(1).getOrElse("all")
    require(Set("all", "graft", "mllib")(side), s"side must be all|graft|mllib, got $side")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Rank axis (round-15 verdict #2): the rank-64 solver-scratch
    // regression was invisible to a protocol that only ever ran rank 8.
    // SPARK_GRAFT_H2H_RANK lets the repeat harness carry a second tier.
    val rank = sys.env.getOrElse("SPARK_GRAFT_H2H_RANK", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      timings(name) = (System.nanoTime() - t0) / 1e9
    }
    def settle(): Unit = { spark.catalog.clearCache(); System.gc() }

    // Untimed warmup (same as Bench): codegen compiler + noop sink + parquet
    // reader init are one-time JVM state that would otherwise bill to the
    // first timed row.
    Tables.load(spark, sfDir, "region").write.format("noop").mode("overwrite").save()
    spark.range(1 << 14).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()

    val ratings = graft.queries.Queries.ratingsDF(spark, sfDir)

    var graftModel: graft.als.GraftALSModel = null
    if (side != "mllib") timed("als_train_graft") {
      graftModel = graft.als.GraftALS(
        rank = rank, maxIter = 5, regParam = 0.1,
        numUserBlocks = 8, numItemBlocks = 8,
        userCol = "user_id", itemCol = "item_id", ratingCol = "rating",
        seed = 7L)
        .fit(ratings)
      graftModel.userFactors.write.format("noop").mode("overwrite").save()
    }
    if (side != "mllib") settle()
    var mllibModel: org.apache.spark.ml.recommendation.ALSModel = null
    if (side != "graft") timed("als_train_mllib") {
      import org.apache.spark.ml.recommendation.ALS
      mllibModel = new ALS()
        .setRank(rank).setMaxIter(5).setRegParam(0.1)
        .setNumUserBlocks(8).setNumItemBlocks(8)
        .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
        .setSeed(7L)
        .fit(ratings)
      mllibModel.userFactors.write.format("noop").mode("overwrite").save()
    }
    if (side != "graft") settle()
    if (side != "mllib") timed("als_transform_graft") {
      graftModel.transform(ratings)
        .write.format("noop").mode("overwrite").save()
    }
    if (side == "all") settle()
    if (side != "graft") timed("als_transform_mllib") {
      mllibModel.transform(ratings)
        .write.format("noop").mode("overwrite").save()
    }

    val body = timings.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val line = s"""{$body,"blas":"${blasImpl()}"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
