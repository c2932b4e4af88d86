package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV ("k minimum values") theta sketch: keeps the k smallest 60-bit
  * hashes of the values seen; the k-th smallest hash estimates the
  * distinct count as ⌊(k−1)·2⁶⁰/kth⌋ (standard error ≈ 1/√k). The
  * property HLL lacks and set-expression workloads need: two KMV
  * sketches UNION by merging hash lists (keep k smallest of both), so
  * |A∪B| is directly estimable and |A∩B| falls out by
  * inclusion–exclusion — the sketch algebra behind audience-overlap /
  * segment-intersection queries. Fixed O(k) state, mergeable ⇒
  * partial-aggregates map-side like any Spark aggregate.
  *
  * The hash is the top 60 bits of md5(decimal string of the value) —
  * engine-PORTABLE (DuckDB: `('0x' || substring(md5(v::VARCHAR), 1,
  * 15))::BIGINT`) and the estimate is exact integer arithmetic, which
  * is what promotes sk06 from rows-only to a full hash-checked
  * oracle: both engines replay the identical hashes, k-th order
  * statistic, and floor-divided estimate.
  */
class KmvSketch(val k: Int) extends Serializable {
  /** ascending 60-bit hashes (always ≥ 0), ≤ k entries, no duplicates */
  val hashes: ArrayBuffer[Long] = ArrayBuffer.empty

  def update(value: Long): Unit = insert(KmvSketch.hash60(value))

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

  /** distinct-count estimate; exact while fewer than k hashes kept.
    * Integer-exact: ⌊(k−1)·2⁶⁰ / kth⌋ via BigInt (the product is
    * ~2⁷⁰, past int64), floor-division — identical to DuckDB's
    * HUGEINT replay. */
  def estimate: Long =
    if (hashes.length < k) hashes.length.toLong
    else ((BigInt(k - 1) << 60) / BigInt(hashes.last)).toLong
}

object KmvSketch {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 of the value's decimal string = the first 15
    * hex digits, always ≥ 0 (matches the SQL replay exactly). */
  def hash60(value: Long): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(java.lang.Long.toString(value)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top64 =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
        ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
        ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
        ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    top64 >>> 4
  }
}

/** Catalyst aggregate wrapper: evaluates to the distinct-count
  * estimate (long, integer-exact). Null child values are skipped, so
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
  override def dataType: DataType = LongType

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
