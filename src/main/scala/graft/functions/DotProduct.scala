package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Inner product over two vector columns as a native Catalyst
  * expression with whole-stage codegen — the maximum-inner-product
  * search (ss07) twin of [[CosineSim]]. Sequential left-to-right
  * double accumulation, matching the element order an engine-side
  * `list_sum(list_transform(...))` replay produces. Mismatched vector
  * lengths fail fast (no silent truncation).
  */
case class DotProduct(left: Expression, right: Expression)
  extends VecBinaryExpression {

  override protected def fnName: String = "dot_product"

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = checkLen(l, r)
    val (ldt, rdt) = (leftElemType, rightElemType)
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += elem(a, ldt, i) * elem(b, rdt, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |${lenCheckCode(a, b, n)}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${elemCode(a, leftElemType, i)} * ${elemCode(b, rightElemType, i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer inner product over two `array<bigint>` code columns —
  * the candidate-scoring loop of the SQ8 quantized ANN tier (ss08).
  * Codegen'd long arithmetic: the interpreted
  * `aggregate(zip_with(...))` HOF it replaces broke whole-stage
  * codegen on the hottest loop of the quantization scan. Accumulates
  * in long (|code| ≤ 127, dim 64 → |dot| ≤ 64·127² ≪ 2^63; also exact
  * when later widened to double for top-k selection, since ≪ 2^53).
  */
case class LongDotProduct(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"long_dot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) {
      throw new IllegalArgumentException(
        s"long_dot: vector length mismatch (${a.numElements()} vs ${b.numElements()})")
    }
    val n = a.numElements()
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "long_dot: vector length mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
