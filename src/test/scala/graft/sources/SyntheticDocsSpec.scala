package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SyntheticDocsSpec extends AnyFunSuite with SparkFixture {

  private def read(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft.sources.SyntheticDocs")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("content matches the arithmetic model and splits into the requested partitions") {
    val df = read("rows" -> "100", "partitions" -> "5", "salt" -> "t1")
    assert(df.rdd.getNumPartitions == 5)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 100)
    got.foreach { case (id, h, n) =>
      assert(h == SyntheticDocs.bodyHash(id, "t1"))
      assert(n == SyntheticDocs.nTokens(id, "t1") && n >= 10 && n < 100)
    }
    assert(got.map(_._1).sorted.toSeq == (0L until 100L))
  }

  test("doc_id range filters push into partition planning") {
    val df = read("rows" -> "1000", "partitions" -> "4")
      .where(col("doc_id") >= 800L && col("doc_id") < 850L)
    // pushed bounds narrow the generated ranges BEFORE readers run: the
    // scan plans over [800,850), not [0,1000) — visible in its description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[800,850)"), s"bounds not pushed:\n$plan")
    assert(df.count() == 50)
    // non-pushable predicates are still applied by Spark above the scan
    val odd = read("rows" -> "100").where(col("doc_id") % 2 === 1)
    assert(odd.count() == 50)
  }

  test("column pruning reaches the reader") {
    val df = read("rows" -> "10").select("n_tokens")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=n_tokens"), s"pruned schema not pushed:\n$plan")
    assert(df.collect().map(_.getLong(0)).forall(n => n >= 10 && n < 100))
  }

  test("limit pushdown keeps a huge source from being scanned") {
    // a trillion-row table: only a pushed limit makes this tractable
    val df = read("rows" -> "1000000000000", "partitions" -> "4").limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,5)"), s"limit not pushed:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // composed with a pushed filter: bounds narrow first, then the limit
    val both = read("rows" -> "1000000000000")
      .where(col("doc_id") >= 777L).limit(3)
    assert(both.queryExecution.executedPlan.toString.contains("bounds=[777,780)"))
    assert(both.collect().map(_.getLong(0)).toSeq == Seq(777L, 778L, 779L))
  }

  test("count/min/max push down completely — O(1) over a trillion rows") {
    val big = read("rows" -> "1000000000000", "partitions" -> "4")
    val agg = big.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
    assert(agg.queryExecution.executedPlan.toString.contains("agg=count,min,max"))
    val r = agg.head()
    assert(r.getLong(0) == 1000000000000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 999999999999L)
    // composes with pushed filters: bounds narrow before the closed form
    val bounded = big.where(col("doc_id") >= 100L && col("doc_id") < 200L)
      .agg(count(lit(1))).head()
    assert(bounded.getLong(0) == 100L)
    // an unsupported aggregate is declined and still computed correctly
    val sum = read("rows" -> "100").agg(org.apache.spark.sql.functions.sum("doc_id")).head()
    assert(sum.getLong(0) == 4950L)
  }

  test("empty pushdown range plans zero partitions") {
    val df = read("rows" -> "100").where(col("doc_id") >= 500L)
    assert(df.count() == 0)
  }
}
