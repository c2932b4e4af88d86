package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scan as ONE codegen'd primitive
  * loop: returns every 1-based char position `i ∈ [8, numChars]` whose
  * trailing 8-char window hashes to a leading-zero md5 nibble —
  * bit-identical to the declarative
  * `filter(sequence(8, length(tx)), i -> substring(md5(cast(substring(tx, i-7, 8) as binary)), 1, 1) = '0')`
  * (the mm10 oracle replays exactly that SQL in DuckDB), but instead of
  * an interpreted lambda that allocates a position array, a per-window
  * UTF8String, a 16-byte digest AND a 32-char hex string per character
  * of corpus, this walks the UTF-8 byte buffer once (char-offset
  * table), feeds each window slice to ONE thread-local reused
  * MessageDigest, and tests `digest[0] & 0xF0` — no hex, no per-window
  * allocation. Below one window (numChars < 8) the boundary rule is
  * undefined: returns an empty array (the declarative form needs an
  * explicit guard because `sequence(8, n)` turns DESCENDING for n < 8).
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CdcBoundaries.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcBoundaries.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** UTF-8 sequence length from its first byte (continuation/invalid
    * bytes count 1, matching UTF8String's own walk — char positions
    * must agree exactly with Spark's `substring`/`length`). */
  private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  def compute(s: UTF8String): UnsafeArrayData = {
    val bytes = s.getBytes
    // char-offset table: off(k) = byte offset where char k starts;
    // off(nChars) = bytes.length — window k..k+7 is one byte slice
    val offs = new Array[Int](s.numChars() + 1)
    var k = 0
    var o = 0
    while (o < bytes.length) {
      offs(k) = o
      o += seqLen(bytes(o))
      k += 1
    }
    val nChars = k
    offs(nChars) = bytes.length
    val out = new Array[Int](math.max(0, nChars - 7))
    var n = 0
    val digest = md.get()
    var i = 8 // 1-based char position of the window END
    while (i <= nChars) {
      val from = offs(i - 8)
      digest.update(bytes, from, offs(i) - from)
      if ((digest.digest()(0) & 0xF0) == 0) { out(n) = i; n += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, n))
  }
}
