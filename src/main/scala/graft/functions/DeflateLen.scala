package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string's UTF-8 encoding — the
  * classic compressibility signal: near-random prose compresses to
  * ~60% of its size, templated/repetitive text to a fraction of that,
  * so `deflate_len(text) / octet_length(text)` is a one-number
  * repetition detector that catches what token-level ratio rules
  * (tx23, tx27) miss — repetition at ANY granularity, including
  * sub-token and cross-line. Runs as a codegen'd primitive call (one
  * reused Deflater + thread-local output buffer, no per-row allocation
  * beyond the input bytes); raw DEFLATE (nowrap, fixed level) so the
  * length is a pure function of the input bytes for a given zlib
  * implementation — stable within a JVM, which is what the spec
  * asserts (no SQL oracle: DuckDB has no deflate — declared
  * rows-only).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    DeflateLen.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  def compute(s: UTF8String): Int = {
    val in = s.getBytes
    // fixed level + nowrap: output depends only on the input bytes
    val d = new Deflater(Deflater.BEST_SPEED, true)
    d.setInput(in)
    d.finish()
    val b = buf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(b)
    d.end()
    total
  }
}
