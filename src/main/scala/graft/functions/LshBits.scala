package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane sign bits for LSH bucketing, as one codegen'd
  * expression: all `planes.length` dot products run in a single fused
  * primitive loop per row (the planes matrix rides along as a codegen
  * reference object). Replaces a chain of interpreted higher-order
  * `aggregate` expressions — same arithmetic in the same order, so
  * bucket ids are bit-identical to the declarative formulation (the
  * spec asserts it), just compiled.
  */
case class LshBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val sb = new java.lang.StringBuilder(planes.length)
    planes.foreach { plane =>
      var dot = 0.0
      val n = math.min(a.numElements(), plane.length)
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * plane(i); i += 1 }
      sb.append(if (dot >= 0) '1' else '0')
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val mat = ctx.freshName("mat")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |double[][] $mat = $planesRef;
         |char[] $bits = new char[$mat.length];
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double $dot = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $mat[$p].length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * $mat[$p][$i];
         |  }
         |  $bits[$p] = $dot >= 0 ? '1' : '0';
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(new String($bits));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBits =
    copy(child = newChild)
}
