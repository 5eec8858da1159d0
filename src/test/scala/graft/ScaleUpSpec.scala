package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Key-shifted replication ([[ScaleUp]]) must preserve exactly the
  * invariants the scaling curve's apples-to-apples claim rests on:
  * referential integrity, key uniqueness, and per-key join densities at
  * ×factor volume.
  */
class ScaleUpSpec extends AnyFunSuite with SparkFixture {

  private val src = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleup_spec")
    ScaleUp.run(spark, dir.toString, src, factor = 3)
    dir.toString
  }

  private def t(dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  test("fact tables grow by exactly the factor; dimension leaves stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem", "events"))
      assert(t(out, n).count() == 3 * t(src, n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(out, n).count() == t(src, n).count(), n)
    assert(t(out, "documents").count() == 3 * t(src, "documents").count())
    assert(t(out, "embeddings").count() == 3 * t(src, "embeddings").count())
  }

  test("shifted primary keys stay unique") {
    for ((n, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "part" -> "p_partkey", "supplier" -> "s_suppkey", "events" -> "event_id"))
      assert(t(out, n).select(k).distinct().count() == t(out, n).count(), s"$n.$k")
  }

  test("referential integrity holds across every replicated FK edge") {
    def orphans(fact: String, fk: String, dim: String, pk: String): Long = {
      val f = t(out, fact).select(fk).distinct()
      val d = t(out, dim).select(pk)
      f.join(d, f(fk) === d(pk), "left_anti").count()
    }
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") == 0)
  }

  test("per-key join density is preserved (max lineitems per order unchanged)") {
    def maxPerOrder(dir: String): Long =
      t(dir, "lineitem").groupBy("l_orderkey").count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPerOrder(out) == maxPerOrder(src))
  }
}
