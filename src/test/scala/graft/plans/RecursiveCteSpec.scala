package graft.plans

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4's WITH RECURSIVE surface. The engine currently supports only
  * UNION ALL recursion (UNION — the frontier-dedup form that terminates
  * on cyclic graphs — is rejected at analysis, asserted below), so the
  * supported shape is bounded DAG traversal: ancestor closure here,
  * checked against a plain-Scala fixpoint. Cyclic closures (near-dup
  * components) stay on `Dedup.connectedComponents`, whose alternating
  * large-star/small-star rounds terminate regardless of cycles.
  */
class RecursiveCteSpec extends AnyFunSuite with SparkFixture {

  test("recursive CTE walks a DAG to the fixpoint; UNION recursion is rejected") {
    val spark2 = spark
    import spark2.implicits._
    // a small DAG: 1->2->3->5, 2->4, 6->4 (no cycles)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 5L), (2L, 4L), (6L, 4L))
    edges.toDF("src", "dst").createOrReplaceTempView("rc_edges")
    val viaSql = spark.sql(
      """WITH RECURSIVE reach(src, dst) AS (
        |  SELECT src, dst FROM rc_edges
        |  UNION ALL
        |  SELECT r.src, e.dst FROM reach r JOIN rc_edges e ON r.dst = e.src
        |)
        |SELECT DISTINCT src, dst FROM reach""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // plain-Scala transitive-closure oracle
    var closure = edges.toSet
    var grew = true
    while (grew) {
      val next = closure ++ (for {
        (a, b) <- closure; (c, d) <- closure if b == c
      } yield (a, d))
      grew = next.size > closure.size
      closure = next
    }
    assert(viaSql == closure)
    assert(viaSql.contains((1L, 5L)) && viaSql.contains((1L, 4L)))
    // the terminating-on-cycles UNION form is not supported yet: the
    // analyzer must say so rather than loop forever
    val err = intercept[Exception] {
      spark.sql(
        """WITH RECURSIVE r(u) AS (
          |  SELECT src FROM rc_edges
          |  UNION
          |  SELECT u FROM r)
          |SELECT * FROM r""".stripMargin).collect()
    }
    assert(err.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"))
  }
}
