package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension must make the codegen kernels reachable from the SQL
  * textual interface (not only the Column API).
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("graft_dot / graft_norm are SQL-callable via session extensions") {
    val base = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = extended.sql(
        """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
          |       graft_norm(array(3.0D, 4.0D)) AS n,
          |       graft_dot(array(1.0D), array(1.0D, 2.0D)) AS mismatch""".stripMargin).head()
      assert(row.getDouble(0) == 32.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.isNullAt(2)) // length mismatch -> NULL, same as the Column API
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
