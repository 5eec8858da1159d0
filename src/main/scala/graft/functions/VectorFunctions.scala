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
    * element order is the array order, not a shuffle order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ in DOUBLE. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

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
