package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared typing/codegen helpers for the vector expressions: both sides
  * may be `array<float>` or `array<double>` (embeddings are float32 on
  * disk; derived centroids are double), every accumulation runs in
  * double, and mismatched lengths FAIL FAST — a silently truncated dot
  * product is a plausible-but-wrong score for a malformed embedding.
  */
private[functions] trait VecBinaryExpression extends BinaryExpression {

  protected def fnName: String

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$fnName expects two array<float>|array<double> columns, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  @inline protected final def elem(a: ArrayData, dt: DataType, i: Int): Double =
    dt match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  protected final def leftElemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  protected final def rightElemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  /** Java accessor snippet for one element of `arr`. */
  protected final def elemCode(arr: String, dt: DataType, i: String): String =
    dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  protected final def checkLen(a: Any, b: Any): (ArrayData, ArrayData) = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) {
      throw new IllegalArgumentException(
        s"$fnName: vector length mismatch (${x.numElements()} vs ${y.numElements()})")
    }
    (x, y)
  }

  /** Codegen prelude: strict length check + element count. */
  protected final def lenCheckCode(a: String, b: String, n: String): String =
    s"""
       |if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$fnName: vector length mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
       |}
       |int $n = $a.numElements();
     """.stripMargin
}

/** Cosine similarity over two vector columns as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`) — the hot inner
  * loop of ANN search (ss01/ss02) and embedding dedup (dd05) compiles
  * to a tight primitive Java loop instead of boxing through a Scala
  * UDF. Accumulates dot and both norms in double in a single pass,
  * each accumulator a sequential left-to-right fold — bit-identical to
  * the three-HOF `aggregate(...)` formulation it replaces (ss03/ss05
  * centroid cosine), so oracle hashes are unchanged.
  */
case class CosineSim(left: Expression, right: Expression)
  extends VecBinaryExpression {

  override protected def fnName: String = "cosine_sim"

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = checkLen(l, r)
    val (ldt, rdt) = (leftElemType, rightElemType)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, ldt, i)
      val y = elem(b, rdt, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |${lenCheckCode(a, b, n)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${elemCode(a, leftElemType, i)};
         |  double $y = ${elemCode(b, rightElemType, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration of graft's native expressions, making
  * them callable from both the Column API (`expr("cosine_sim(a,b)")`)
  * and plain `spark.sql`. Idempotent — safe to call per plan builder.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot", exprs => LongDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs =>
        // optional 3rd literal = sub-space count m (sub-vectors are
        // 64/m wide); 2-arg form keeps the shipped 8×8 geometry
        if (exprs.length >= 3) {
          val m = exprs(2) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(
              v: Int, org.apache.spark.sql.types.IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"pq_encode: third argument must be an int literal, got $other")
          }
          require(m >= 1 && 64 % m == 0,
            s"pq_encode: m must be a positive divisor of 64, got $m")
          PqEncode(exprs(0), exprs(1), m, 64 / m)
        } else PqEncode(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_boundaries", exprs => CdcBoundaries(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", exprs => DeflateLen(exprs(0)), "built-in")
  }
}
