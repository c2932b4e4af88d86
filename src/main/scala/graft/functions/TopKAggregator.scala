package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k values as a single-pass typed Aggregator: each partition
  * keeps only its k best (partial aggregation), merge keeps k of 2k —
  * so a per-group top-k never sorts a group's full value set, unlike
  * the window row_number formulation which must. Buffer is a sorted
  * descending Seq of ≤k elements.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Seq.empty

  private def trim(s: Seq[Double]): Seq[Double] =
    if (s.length <= k) s else s.take(k)

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.length == k && v <= buf.last) buf
    else trim((buf :+ v).sortBy(-_))
  }

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    trim((a ++ b).sortBy(-_))

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
