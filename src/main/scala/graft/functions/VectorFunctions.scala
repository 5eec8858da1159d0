package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `ArrayType(FloatType)` / `ArrayType(DoubleType)`
  * columns, built entirely from codegen'd Spark SQL builtins
  * (`zip_with` / `aggregate` / `transform`) — no UDFs, so the expressions
  * stay inside whole-stage codegen and work identically at any scale.
  *
  * Used for ALS scoring (the reference's `np.dot` at `ALS.py:625`) and for
  * the similarity-search operators over the `embeddings` table.
  */
object VectorFunctions {

  /** Σᵢ a(i)·b(i), accumulated in DOUBLE left-to-right (deterministic:
    * element order is the array order, not a shuffle order). Backed by the
    * codegen'd [[DotProductExpr]]; `dotHof` keeps the builtin higher-order
    * form as a semantic cross-check.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      DotProductExpr(exprOf(a), exprOf(b)))

  /** Builtin-HOF form of `dot` — interpreted, used in tests to pin the
    * custom expression's semantics.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlShims.expression(c)

  /** ‖a‖₂ in DOUBLE. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in DOUBLE; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Squared L2 distance in DOUBLE. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dxy = x.cast("double") - y.cast("double")
        dxy * dxy
      }),
      lit(0.0),
      (acc, x) => acc + x)
}
