package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Top-`n` codebook cells of a vector by dot score, as a native codegen
  * expression: `ARRAY<FLOAT|DOUBLE> → ARRAY<INT>` (cell ids, score
  * descending, cell id ascending on ties — the IVF assignment/probing rule
  * shared with the driver-side `probeCells`).
  *
  * Replaces the `transform` + `array_sort`(lambda) + `slice` composition:
  * higher-order functions evaluate interpreted with a lambda invocation
  * per comparison (O(c·log c) comparator evals per ROW over the whole
  * codebook), which made cell assignment the hot interpreted island inside
  * otherwise-codegen'd IVF stages. Here the codebook is a plan-constant
  * 2-D float array embedded as a reference object and the generated code
  * is one tight dot loop per cell plus an O(n) bounded insertion — no
  * allocation proportional to the codebook, no lambda frames.
  *
  * Null semantics match the HOF form built on [[DotProductExpr]]: null
  * input, a null element, or a vector/codebook dimension mismatch yields
  * NULL.
  */
case class TopCellsExpr(
    child: Expression,
    cells: Array[Array[Float]],
    cellIds: Array[Int],
    n: Int,
    bias: Array[Double] = Array.emptyDoubleArray)
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == cellIds.length && n > 0)
  require(cells.forall(_.length == cells(0).length))
  // optional per-cell additive bias (double, applied once AFTER the dot
  // loop): score = v·c + bias(c). With bias(c) = −‖c‖²/2 the ranking
  // becomes argmin-L2 (PQ code assignment) while reusing the same codegen
  // kernel; x + (−y) ≡ x − y in IEEE, so replays stay bit-identical.
  require(bias.isEmpty || bias.length == cells.length,
    "bias must be empty or one entry per cell")
  // the tie-break contract (equal scores → LOWEST cell id) relies on the
  // iteration order: ids must arrive ascending (zipWithIndex and the
  // occupancy filter both preserve this)
  require(cellIds.iterator.sliding(2).withPartial(false).forall(p => p(0) < p(1)),
    "cellIds must be strictly ascending")

  private def dim: Int = cells(0).length
  private def m: Int = math.min(n, cells.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_cells expects ARRAY<FLOAT|DOUBLE> input, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vv = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      vv(i) = if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val bestScore = new Array[Double](m)
    val bestId = new Array[Int](m)
    var size = 0
    var c = 0
    while (c < cells.length) {
      val row = cells(c)
      var s = 0.0
      i = 0
      while (i < dim) { s += vv(i) * row(i); i += 1 }
      if (bias.nonEmpty) s += bias(c)
      // insert AFTER equal scores: iteration order is ascending cell id,
      // so ties keep the lower id first (strict > displaces)
      if (size < m || s > bestScore(size - 1)) {
        var pos = if (size < m) size else size - 1
        while (pos > 0 && bestScore(pos - 1) < s) {
          if (pos < m) { bestScore(pos) = bestScore(pos - 1); bestId(pos) = bestId(pos - 1) }
          pos -= 1
        }
        bestScore(pos) = s
        bestId(pos) = cellIds(c)
        if (size < m) size += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bestId, size))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("topCells", cells, "float[][]")
    val idsRef = ctx.addReferenceObj("topCellIds", cellIds, "int[]")
    val biasRef =
      if (bias.isEmpty) null
      else ctx.addReferenceObj("topCellBias", bias, "double[]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val vv = ctx.freshName("vv")
      val bestScore = ctx.freshName("bestScore")
      val bestId = ctx.freshName("bestId")
      val size = ctx.freshName("size")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val pos = ctx.freshName("pos")
      val row = ctx.freshName("row")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $vv = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $vv[$i] = (double) $v.$getter($i);
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $bestScore = new double[$m];
         |    int[] $bestId = new int[$m];
         |    int $size = 0;
         |    for (int $c = 0; $c < ${cells.length}; $c++) {
         |      float[] $row = $cellsRef[$c];
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) { $s += $vv[$i] * $row[$i]; }
         |      ${if (biasRef == null) "" else s"$s += $biasRef[$c];"}
         |      if ($size < $m || $s > $bestScore[$size - 1]) {
         |        int $pos = ($size < $m) ? $size : $size - 1;
         |        while ($pos > 0 && $bestScore[$pos - 1] < $s) {
         |          if ($pos < $m) { $bestScore[$pos] = $bestScore[$pos - 1]; $bestId[$pos] = $bestId[$pos - 1]; }
         |          $pos--;
         |        }
         |        $bestScore[$pos] = $s;
         |        $bestId[$pos] = $idsRef[$c];
         |        if ($size < $m) $size++;
         |      }
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |      java.util.Arrays.copyOf($bestId, $size));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCellsExpr =
    copy(child = newChild)
}
