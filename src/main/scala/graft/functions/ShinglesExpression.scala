package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column as a native codegen expression:
  * `STRING → ARRAY<STRING>` of every run of `n` consecutive
  * space-separated tokens, re-joined with a single space.
  *
  * Replaces the `transform(sequence(...), i → concat_ws(slice(split...)))`
  * higher-order-function composition that was the dedup tier's last
  * interpreted holdout: HOFs evaluate outside whole-stage codegen with a
  * lambda dispatch and a fresh token-array slice per SHINGLE per row —
  * the cold-JIT first touch of that island made `dedup_recall` the
  * noisiest row in the bench (4.2–16.9 s across same-binary runs).
  *
  * The kernel exploits the split/join identity: splitting on single
  * spaces (empties preserved, Java `split(" ", -1)` semantics — exactly
  * Spark's `split(text, " ")`) and re-joining `n` consecutive tokens
  * with `" "` reproduces the original BYTE SUBSTRING from the start of
  * token `i` to the end of token `i+n-1`. A space byte (0x20) never
  * occurs inside a multi-byte UTF-8 sequence, so one byte scan finds the
  * boundaries and each shingle is a zero-copy slice of the input's
  * bytes — no token array, no per-shingle concatenation. Output strings
  * are bit-identical to the HOF form it replaces (pinned by
  * ShinglesExprSpec's property test), so every downstream hash — minhash
  * signatures, the DuckDB shingle CTEs — is unchanged.
  *
  * Matches the HOF form's edges: fewer than `n` tokens (including the
  * empty string's single empty token) yields the whole text as one
  * shingle; null input yields null.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects STRING input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.shingle($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Standalone object so the generated Java calls a static forwarder. */
object ShingleKernel {
  def shingle(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var m = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) m += 1; i += 1 }
    val numToks = m + 1
    if (numToks < n) return new GenericArrayData(Array[Any](s))
    val sp = new Array[Int](m)
    var j = 0
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { sp(j) = i; j += 1 }; i += 1 }
    val out = new Array[Any](numToks - n + 1)
    var t = 0
    while (t < out.length) {
      val start = if (t == 0) 0 else sp(t - 1) + 1
      val last = t + n - 1
      val end = if (last == m) len else sp(last)
      out(t) = UTF8String.fromBytes(bytes, start, end - start)
      t += 1
    }
    new GenericArrayData(out)
  }
}
