package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k of (score, id) pairs as a single-pass typed
  * Aggregator — the scale-safe replacement for the
  * `row_number().over(Window.partitionBy(qid).orderBy(score.desc, id))`
  * formulation used by ANN top-k selection. The window shape funnels a
  * query's ENTIRE candidate set (the whole corpus, for brute-force
  * tiers) through one Exchange into a single partition per query; this
  * aggregator instead rides partial aggregation: every map task keeps
  * only its k best pairs per query, the exchange carries ≤k pairs per
  * (query, task), and the final merge keeps k of 2k. O(k) state, no
  * per-query single-reducer sort — the plan at 100 TB is a
  * partial/final HashAggregate pair over the corpus scan.
  *
  * Ordering is (score DESC, id ASC) — bit-identical to the window
  * `orderBy(col(score).desc, col(id))` tie-break it replaces, so
  * oracle hashes are unchanged.
  */
class TopKPairAggregator(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  /** (s1,i1) ranks strictly better than (s2,i2). */
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def sorted(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (s.length <= k) s else s.take(k)

  /** Duplicate (score,id) pairs are kept once — candidate generators
    * that surface the same neighbor via several routes (e.g. two LSH
    * tables) need no corpus-wide `distinct()` shuffle before top-k. A
    * pair's score is a pure function of the id, so equal ids always
    * arrive as equal pairs. */
  override def reduce(
      buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length == k && better(buf.last, v)) buf
    else if (buf.contains(v)) buf
    else trim(sorted(buf :+ v))
  }

  override def merge(
      a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(sorted((a ++ b).distinct))

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
