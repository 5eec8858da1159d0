package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of one or all registered
  * queries and a one-line audit summary (pushdown / codegen / join
  * strategies / shuffle count). Usage:
  *
  *   runMain graft.Explain [queryName [sfDir]]      // full formatted plan
  *   runMain graft.Explain __audit [sfDir]          // summary for all
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")

    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

    args.lift(0) match {
      case Some("__audit") | None =>
        // streaming + ALS-training queries excluded: their value is not in a
        // static batch plan (ALS trains eagerly; streaming has its own plan)
        val skip = Set("stream_events_daily", "als_user_factors", "als_item_factors",
          "als_predictions", "als_mse", "als_recommend")
        SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { name =>
          val p = plan(name)
          val audit = Seq(
            "scans" -> p.sliding("Scan parquet".length).count(_ == "Scan parquet"),
            "exchanges" -> p.linesIterator.count(_.contains("Exchange")),
            "codegen_ops" -> p.linesIterator.count(_.contains("[codegen id :")),
            "bhj" -> p.linesIterator.count(_.contains("BroadcastHashJoin")),
            "smj" -> p.linesIterator.count(_.contains("SortMergeJoin")),
            "pushed" -> p.linesIterator.count(l =>
              l.contains("PushedFilters: [") && !l.contains("PushedFilters: []")))
          println(f"$name%-26s " + audit.map { case (k, v) => s"$k=$v" }.mkString(" "))
        }
      case Some(names) =>
        // comma-separated names; optional args(2) = output dir, one
        // <dir>/<name>.txt per query (the plans/r18 before/after dumps)
        val outDir = args.lift(2)
        names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
          val p = plan(name)
          outDir match {
            case Some(d) =>
              // absolutize first: a bare relative dir like "out" has a null
              // getParent and createDirectories(null) NPEs (r18 ADVICE)
              val path = java.nio.file.Paths.get(d, s"$name.txt").toAbsolutePath
              java.nio.file.Files.createDirectories(path.getParent)
              java.nio.file.Files.write(path, p.getBytes("UTF-8"))
              println(s"[explain] wrote $path")
            case None => println(p)
          }
        }
    }
    spark.stop()
  }
}
