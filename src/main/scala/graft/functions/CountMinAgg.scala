package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count–min sketch heavy-hitter aggregate as a
  * `TypedImperativeAggregate` over Spark's public `CountMinSketch`
  * (org.apache.spark.util.sketch): each task folds its strings into a
  * fixed-size (depth × width) counter grid, partials merge cell-wise,
  * and the eval answers point queries for a compile-time probe list as
  * one `map<string,long>`.
  *
  * The 100 TB story: exact per-token counts shuffle every distinct
  * token; this ships one ~`depth×width×8`-byte grid per task
  * regardless of corpus size, with the classic CMS guarantee
  * `exact ≤ est ≤ exact + ε·N` (w.p. 1−δ) — asserted in the spec.
  */
case class CountMinAgg(
    child: Expression,
    probes: Seq[String],
    eps: Double = 0.0001,
    confidence: Double = 0.99,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, 42)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addBinary(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: CountMinSketch): Any =
    ArrayBasedMapData(
      probes.map(UTF8String.fromString).toArray,
      probes.map(p =>
        buf.estimateCount(UTF8String.fromString(p).getBytes): java.lang.Long).toArray)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}
