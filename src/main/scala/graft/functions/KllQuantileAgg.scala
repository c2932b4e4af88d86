package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** KLL-style streaming quantile sketch (Karnin–Lang–Liberty, FOCS'16
  * family): a stack of compactors where level i holds items of weight
  * 2^i; a full level sorts and keeps alternating items (deterministic
  * alternating offset instead of the randomized coin — reproducible
  * runs, same O(k) space, error bounds checked empirically in the
  * spec). Mergeable: level-wise concatenation + re-compaction, so it
  * partial-aggregates map-side like any Spark aggregate — the
  * exchange carries one ~k·levels-sized buffer per (group, task)
  * instead of every value.
  */
class KllSketch(val k: Int) extends Serializable {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  /** per-level compaction offsets (as in the KLL paper) — serialized
    * with the buffer, so the alternation survives shuffle round-trips
    * instead of resetting to 0 (which would systematically keep the
    * same half and bias ranks). */
  val parities: ArrayBuffer[Int] = ArrayBuffer(0)
  var count: Long = 0L

  def update(x: Double): Unit = {
    levels(0) += x
    count += 1
    var i = 0
    while (i < levels.length && levels(i).length >= capacity(i)) {
      compact(i)
      i += 1
    }
  }

  /** geometric capacities: deeper (higher-weight) levels get most of k */
  private def capacity(i: Int): Int =
    math.max(8, (k * math.pow(2.0 / 3.0, levels.length - 1 - i)).toInt)

  private def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) { levels += ArrayBuffer.empty[Double]; parities += 0 }
    val lvl = levels(i).sortInPlace()
    val keep = ArrayBuffer.empty[Double]
    var j = parities(i)
    parities(i) ^= 1
    while (j < lvl.length) { keep += lvl(j); j += 2 }
    // an odd leftover item (when parity skips the last) is dropped with
    // its weight accounted by the alternating offset across compactions
    levels(i + 1) ++= keep
    levels(i).clear()
  }

  def merge(other: KllSketch): Unit = {
    while (levels.length < other.levels.length) {
      levels += ArrayBuffer.empty[Double]; parities += 0
    }
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    count += other.count
    i = 0
    while (i < levels.length) {
      if (levels(i).length >= capacity(i)) compact(i)
      i += 1
    }
  }

  /** weighted-rank query over all retained (value, 2^level) pairs. */
  def quantile(q: Double): Double = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    var total = 0L
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach { v => items += ((v, w)); total += w }
      i += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val target = q * total
    var cum = 0L
    var idx = 0
    while (idx < sorted.length - 1 && cum + sorted(idx)._2 < target) {
      cum += sorted(idx)._2
      idx += 1
    }
    sorted(idx)._1
  }
}

/** Catalyst aggregate wrapper: `KllQuantileAgg(col, Seq(0.5, 0.9))`
  * evaluates to `array<double>` of the requested quantiles. */
case class KllQuantileAgg(
    child: Expression,
    quantiles: Seq[Double],
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllSketch, b: KllSketch): KllSketch = { a.merge(b); a }

  override def eval(buf: KllSketch): Any =
    new GenericArrayData(quantiles.map(buf.quantile).toArray)

  override def serialize(buf: KllSketch): Array[Byte] = {
    val n = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buf.levels.length * 8 + n * 8)
    bb.putInt(buf.k)
    bb.putLong(buf.count)
    bb.putInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      val lvl = buf.levels(i)
      bb.putInt(buf.parities(i))
      bb.putInt(lvl.length)
      lvl.foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new KllSketch(bb.getInt)
    sk.count = bb.getLong
    val nLevels = bb.getInt
    while (sk.levels.length < nLevels) {
      sk.levels += ArrayBuffer.empty[Double]; sk.parities += 0
    }
    var i = 0
    while (i < nLevels) {
      sk.parities(i) = bb.getInt
      val len = bb.getInt
      var j = 0
      while (j < len) { sk.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantileAgg =
    copy(child = newChildren.head)
}
