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

  test("graft_chunks UDTF matches chunkDocuments through LATERAL VIEW") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import extended.implicits._
      val words = (1 to 75).map(i => s"w$i").mkString(" ")
      val docs = Seq((1L, words), (2L, "a b c")).toDF("doc_id", "text")
      docs.createOrReplaceTempView("gen_docs")
      val viaSql = extended.sql(
        """SELECT doc_id, c.chunk_id, c.chunk_tokens, c.chunk_text
          |FROM gen_docs
          |LATERAL VIEW graft_chunks(text, 32, 16) c""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      val viaColumnApi = graft.ops.PipelineOps
        .chunkDocuments(docs, window = 32, stride = 16)
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_id").toInt,
          r.getAs[Long]("chunk_tokens").toInt, r.getAs[String]("chunk_text")))
        .toSet
      assert(viaSql == viaColumnApi)
      assert(viaSql.count(_._1 == 1L) == 4) // 75 tokens @ 32/16 -> 4 windows
      // invalid stride is rejected at analysis, not at runtime
      val err = intercept[Exception] {
        extended.sql("SELECT * FROM gen_docs LATERAL VIEW graft_chunks(text, 8, 9) c")
          .collect()
      }
      assert(err.getMessage.contains("stride"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
