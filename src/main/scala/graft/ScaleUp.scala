package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-schema scale-tier generator (round-7 verdict #6): builds a
  * ×`factor` copy of an entire fixture dir — not just the document/ANN
  * tables [[ScaleData]] synthesizes — so the WHOLE bench suite can run one
  * tier past sf0.1 and extend the measured scaling curve to 4 points.
  *
  * Relational + events tables scale by KEY-SHIFTED REPLICATION: each
  * replica `i` adds `(maxKey+1)·i` to every primary/foreign key in
  * lockstep, so referential integrity, join fan-outs, and per-key
  * densities are IDENTICAL to the source tier — data volume grows ×factor
  * while the distribution stays fixed, which is exactly the
  * within-distribution slope the curve needs (a resampled tier would
  * confound volume with distribution drift). The dimension leaves
  * (region=5, nation=25) stay fixed, as in TPC-H scaling. The derived
  * ratings matrix becomes block-diagonal (each replica's users rate that
  * replica's items) — per-user/per-item degree constant, total entries
  * ×factor, the ALS-relevant growth mode.
  *
  * documents/embeddings use [[ScaleData]]'s within-distribution synthesis
  * at ×factor counts instead: replicating text verbatim would give every
  * doc `factor` exact clones and quadratically distort the near-dup pair
  * distribution the dedup tiers are measured on.
  *
  * Usage: runMain graft.ScaleUp <outDir> [srcDir] [factor]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/graft_scale_full_x10")
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, out, src, factor)
    println(s"[scaleup] wrote x$factor tier of $src to $out")
    spark.stop()
  }

  def run(spark: SparkSession, out: String, src: String, factor: Int): Unit = {
    // Tables.load, not raw read: the events fixture is TIMESTAMP(NANOS),
    // which the vectorized reader rejects — the scaled copy is written at
    // Spark-native micros, so downstream Tables.load passes it through.
    def table(name: String): DataFrame =
      Tables.load(spark, src, name)

    /** Shift stride per key column: max+1 over the SOURCE domain, so
      * replica key ranges never collide and dense ids stay dense.
      */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

    /** Replicate ×factor, adding `stride·replica` to each listed key
      * column (cast preserved via the original column type).
      */
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val reps = spark.range(factor).select(col("id").as("__rep"))
      shifts.foldLeft(df.crossJoin(reps)) { case (acc, (key, s)) =>
        val t = df.schema(key).dataType
        acc.withColumn(key, (col(key).cast("long") + col("__rep") * s).cast(t))
      }.drop("__rep")
    }

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // fixed dimension leaves — copied verbatim
    write(table("region"), "region")
    write(table("nation"), "nation")

    val custS = stride(table("customer"), "c_custkey")
    val suppS = stride(table("supplier"), "s_suppkey")
    val partS = stride(table("part"), "p_partkey")
    val ordS = stride(table("orders"), "o_orderkey")

    write(replicate(table("customer"), "c_custkey" -> custS), "customer")
    write(replicate(table("supplier"), "s_suppkey" -> suppS), "supplier")
    write(replicate(table("part"), "p_partkey" -> partS), "part")
    write(replicate(table("orders"),
      "o_orderkey" -> ordS, "o_custkey" -> custS), "orders")
    write(replicate(table("lineitem"),
      "l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS),
      "lineitem")

    val ev = table("events")
    write(replicate(ev,
      "event_id" -> stride(ev, "event_id"),
      "user_id" -> stride(ev, "user_id")), "events")

    // document/ANN tables: within-distribution synthesis (see Scaladoc)
    ScaleData.writeDocs(spark, out,
      table("documents").count() * factor)
    ScaleData.writeVecs(spark, out,
      table("embeddings").count() * factor)
  }
}
