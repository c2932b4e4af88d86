package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder as one codegen'd expression: for each
  * of `subSpaces` sub-vectors, the argmin-L2 codeword index against a
  * flat broadcast codebook (m-major, cell-ascending, `subDim` doubles
  * per codeword — `cb[(m·nCells + cell)·subDim + j]`). Replaces the
  * interpreted nested-HOF encode on the hot corpus scan (ss10/ss14)
  * with a fused primitive loop; the arithmetic — double subtract,
  * square, left-to-right accumulate, STRICT `<` improvement so ties
  * keep the smallest cell — is identical to the HOF formulation, so
  * codes are bit-identical (the spec asserts it). nCells is derived
  * from the codebook length, so the expression works for any cell
  * count without a re-plan. */
case class PqEncode(left: Expression, right: Expression,
    subSpaces: Int = 8, subDim: Int = 8) extends VecBinaryExpression {

  override protected def fnName: String = "pq_encode"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(e: Any, c: Any): Any = {
    val a = e.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val nCells = cb.numElements() / (subSpaces * subDim)
    val codes = new Array[Int](subSpaces)
    var m = 0
    while (m < subSpaces) {
      var best = -1
      var bd = Double.PositiveInfinity
      var cell = 0
      while (cell < nCells) {
        var l2 = 0.0
        val base = (m * nCells + cell) * subDim
        var j = 0
        while (j < subDim) {
          val d = elem(a, leftElemType, m * subDim + j) -
            elem(cb, rightElemType, base + j)
          l2 += d * d
          j += 1
        }
        if (l2 < bd) { bd = l2; best = cell }
        cell += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val nCells = ctx.freshName("nCells")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val cell = ctx.freshName("cell")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val l2 = ctx.freshName("l2")
      val dd = ctx.freshName("dd")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      s"""
         |int $nCells = $c.numElements() / ${subSpaces * subDim};
         |int[] $codes = new int[$subSpaces];
         |for (int $m = 0; $m < $subSpaces; $m++) {
         |  int $best = -1;
         |  double $bd = Double.POSITIVE_INFINITY;
         |  for (int $cell = 0; $cell < $nCells; $cell++) {
         |    double $l2 = 0.0;
         |    int $base = ($m * $nCells + $cell) * $subDim;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      double $dd = ${elemCode(a, leftElemType, s"$m * $subDim + $j")}
         |        - ${elemCode(c, rightElemType, s"$base + $j")};
         |      $l2 += $dd * $dd;
         |    }
         |    if ($l2 < $bd) { $bd = $l2; $best = $cell; }
         |  }
         |  $codes[$m] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
