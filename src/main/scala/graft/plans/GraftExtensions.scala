package graft.plans

import graft.functions.{ChunkGenerator, DotProductExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

/** Session-extension entry point: registers the engine's custom Catalyst
  * expressions as SQL functions, so the textual interface reaches them too
  * (`spark.sql("SELECT graft_dot(a, b) ...")`), not only the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Deliberately thin: the engine expresses whole-operator semantics with
  * built-in operators (SURVEY.md §7.3's preference order), so no custom
  * LogicalPlan/Strategy is injected — the only thing the built-ins cannot
  * provide is the codegen'd scalar kernel, and function injection is the
  * idiomatic way to expose exactly that.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, null, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProductExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[DotProductExpr].getName, null, "graft_norm"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_norm takes exactly 1 argument")
        Sqrt(DotProductExpr(children.head, children.head))
      }))
    // table-generating function (UDTF surface): sliding-window chunking,
    // usable as `LATERAL VIEW graft_chunks(text, 32, 16)`
    ext.injectFunction((
      FunctionIdentifier("graft_chunks"),
      new ExpressionInfo(classOf[ChunkGenerator].getName, null, "graft_chunks"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_chunks takes (text, window, stride)")
        ChunkGenerator(children.head, children(1), children(2))
      }))
  }
}
