package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed Aggregator: ≤ k
  * counters; every token with true frequency > N/(k+1) is GUARANTEED
  * to survive (no false negatives), and a counter undercounts its
  * token by at most N/(k+1). Fixed O(k) state and a pairwise merge
  * (sum counters, then subtract the (k+1)-th largest count and drop
  * non-positive ones — Agarwal et al.'s mergeable-summaries result),
  * so it partial-aggregates map-side like every sketch in this
  * module: the shuffle carries ≤ k counters per task, never the
  * token stream.
  *
  * Counter VALUES depend on merge order (any MG implementation's do),
  * so sk09 treats the survivors as a candidate set only and recounts
  * them exactly in a second bounded pass — the output is
  * deterministic and oracle-checkable; the no-false-negative property
  * is what makes the two-pass answer exact.
  */
class MisraGriesAggregator(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] = {
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None =>
        // decrement-all step: every counter pays one, zeros drop out
        buf.collect { case (t, c) if c > 1 => (t, c - 1) }
    }
  }

  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.collect { case (t, c) if c > cut => (t, c - cut) }
    }
  }

  /** Survivor tokens, sorted for a stable array layout. */
  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
