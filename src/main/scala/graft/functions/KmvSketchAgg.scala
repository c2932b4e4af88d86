package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV ("k minimum values") theta sketch: keeps the k smallest 64-bit
  * hashes of the values seen; the k-th smallest hash estimates the
  * distinct count as (k−1)·2⁶⁴/kth (standard error ≈ 1/√k). The
  * property HLL lacks and set-expression workloads need: two KMV
  * sketches UNION by merging hash lists (keep k smallest of both), so
  * |A∪B| is directly estimable and |A∩B| falls out by
  * inclusion–exclusion — the sketch algebra behind audience-overlap /
  * segment-intersection queries. Fixed O(k) state, mergeable ⇒
  * partial-aggregates map-side like any Spark aggregate.
  *
  * Hashes are stored sign-FLIPPED (h ^ Long.MinValue) so signed
  * ordering equals unsigned ordering of the raw hash.
  */
class KmvSketch(val k: Int) extends Serializable {
  /** ascending flipped hashes, ≤ k entries, no duplicates */
  val hashes: ArrayBuffer[Long] = ArrayBuffer.empty

  def update(value: Long): Unit = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(value, 42L) ^ Long.MinValue
    insert(h)
  }

  private def insert(h: Long): Unit = {
    if (hashes.length == k && h >= hashes.last) return
    val idx = {
      var lo = 0; var hi = hashes.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (hashes(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
    if (idx < hashes.length && hashes(idx) == h) return
    hashes.insert(idx, h)
    if (hashes.length > k) hashes.remove(hashes.length - 1): Unit
  }

  def merge(other: KmvSketch): Unit = other.hashes.foreach(insert)

  /** distinct-count estimate; exact while fewer than k hashes kept. */
  def estimate: Double =
    if (hashes.length < k) hashes.length.toDouble
    else {
      val u = hashes.last.toDouble + 9.223372036854776e18 // unflip to unsigned
      (k - 1).toDouble * 1.8446744073709552e19 / u
    }
}

/** Catalyst aggregate wrapper: evaluates to the distinct-count
  * estimate (double). Null child values are skipped, so
  * `kmv(CASE WHEN <segment> THEN key END)` sketches one segment and
  * three such aggregates in ONE pass give |A|, |B|, |A∪B|. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(buf: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = { a.merge(b); a }

  override def eval(buf: KmvSketch): Any = buf.estimate

  override def serialize(buf: KmvSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + buf.hashes.length * 8)
    bb.putInt(buf.k)
    bb.putInt(buf.hashes.length)
    buf.hashes.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new KmvSketch(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { sk.hashes += bb.getLong; i += 1 }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
