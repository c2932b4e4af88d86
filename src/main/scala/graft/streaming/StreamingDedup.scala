package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** st03: streaming exact dedup — drop replayed events by id while the
  * watermark bounds the dedup state (ids older than the horizon are
  * evicted; an at-least-once upstream only ever replays recent data).
  * Without the watermark variant the state grows without bound — the
  * difference between a demo and something that survives 100 TB/day.
  */
object StreamingDedup {

  /** Bounded-state dedup on (event_id) within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Downstream consumer: per-type counts of the deduped stream. */
  def dedupedCounts(events: DataFrame): DataFrame =
    dedupWithinWatermark(events)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
}
