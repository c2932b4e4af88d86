package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation (SURVEY.md §2) — the 100 TB
  * answer to "exact is too expensive": mergeable, fixed-size sketches
  * that partial-aggregate map-side, so the shuffle carries one sketch
  * per group per task instead of the raw values. Approximate results
  * cannot hash-match a DuckDB oracle, so these are rows-only entries
  * whose error bounds are asserted against the exact operators in
  * SketchesSpec.
  */
object Sketches {

  /** sk01: HyperLogLog++ approximate distinct users per event type.
    * The exact twin is a countDistinct (expands to a two-phase
    * distinct-then-count shuffle of every distinct pair); the sketch
    * ships one ~1.5 KB HLL per (type, task). rsd 0.02 → ±2% typical. */
  def sk01HllUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** sk02: quantile sketch (Greenwald–Khanna via percentile_approx,
    * accuracy 10000) per order status — the exact twin (q23's
    * percentile) must co-locate every value of a group; the sketch is
    * bounded-size and mergeable. */
  def sk02QuantileSketch(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_approx"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("p90_approx"),
        count(lit(1)).as("cnt"))

  /** sk04: graft's own KLL-style quantile sketch (custom
    * TypedImperativeAggregate, see functions.KllQuantileAgg) — unlike
    * sk02's built-in GK this one is fully owned: compactor stack,
    * level-wise merge, weighted-rank query. Error vs the exact
    * percentile is asserted in the spec. */
  def sk04KllQuantiles(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val priceAttr = o.queryExecution.analyzed.output
      .find(_.name == "o_totalprice").get
    val kll = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.KllQuantileAgg(priceAttr, Seq(0.5, 0.9)).toAggregateExpression())
    o.groupBy(col("o_orderstatus"))
      .agg(kll.as("qs"), count(lit(1)).as("cnt"))
      .select(col("o_orderstatus"),
        col("qs").getItem(0).as("p50_kll"),
        col("qs").getItem(1).as("p90_kll"),
        col("cnt"))
  }

  /** Probe list for sk03: the stopwords + common corpus terms. */
  private[graft] val cmsProbes: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "table", "query", "data", "spark",
    "value", "scan", "row", "fast", "key", "part", "line", "sort",
    "window", "batch")

  /** sk03: count–min heavy-hitter estimates over the token stream via
    * the custom CountMinAgg (TypedImperativeAggregate around Spark's
    * public CountMinSketch). One pass, one fixed-size grid per task on
    * the exchange — never a per-token shuffle. Error bound
    * (exact ≤ est ≤ exact + ε·N) asserted in the spec. */
  def sk03CmsTokenCounts(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("tok"))
    val tokAttr = toks.queryExecution.analyzed.output.find(_.name == "tok").get
    val cms = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.CountMinAgg(tokAttr, cmsProbes).toAggregateExpression())
    toks.agg(cms.as("est_map"))
      .select(explode(col("est_map")).as(Seq("token", "est_count")))
  }
}
