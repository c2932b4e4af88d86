package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build as a `TypedImperativeAggregate` over Spark's
  * public `BloomFilter` (org.apache.spark.util.sketch): tasks fold
  * their long keys into fixed-size bit arrays, partials OR together,
  * eval emits the serialized filter as one binary value — the
  * build side of semi-join pre-filtering: ship a few MB of bits
  * instead of shuffling the probe table against the full key set.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** Membership probe against a serialized BloomFilter column. The
  * deserialized filter is cached per (task, bytes reference) so the
  * broadcast single-filter case pays deserialization once per
  * partition, not per row. CodegenFallback: the probe sits on the
  * small post-filter path, not the scan hot loop. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"might_contain expects (binary, bigint), got ($l, $r)")
    }

  @transient private var cachedFp: Long = 0L
  @transient private var cachedFilter: BloomFilter = _

  /** O(1) change-detection fingerprint: length + 16 evenly-sampled
    * bytes FNV-folded. Rows hand back fresh arrays, so reference
    * equality never hits, and a full Arrays.equals would pay O(filter
    * size) per probed row — significant for multi-MB filters. A
    * sampled fingerprint keeps the per-row probe cost constant; for
    * the broadcast single-filter case (the intended shape) it is
    * exact, and distinct filters share it only on a ~2^-64 accident. */
  private def fingerprint(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L ^ b.length
    val step = math.max(1, b.length / 16)
    var i = 0
    while (i < b.length) {
      h = (h ^ b(i)) * 0x100000001b3L
      i += step
    }
    h
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val bytes = l.asInstanceOf[Array[Byte]]
    val fp = fingerprint(bytes)
    if (cachedFilter == null || fp != cachedFp) {
      cachedFilter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      cachedFp = fp
    }
    cachedFilter.mightContainLong(r.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
