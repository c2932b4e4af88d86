package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event / time-series operators (SURVEY.md §2). All plans are
  * shuffle-minimal: everything that needs per-user ordering
  * (sessionize, funnel, as-of) partitions by `user_id` ONCE and runs
  * the whole chain of window functions inside that single exchange —
  * at 100 TB the sort is per-user-partition, never global.
  *
  * Output timestamps are truncated to whole seconds on both the Spark
  * and oracle side: the raw column is nanosecond-precision parquet,
  * which Spark reads at microsecond precision while DuckDB keeps ns.
  */
object Events {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  private def sec(c: String, as: String) =
    date_trunc("second", col(c)).cast("timestamp").as(as)

  /** ev01: tumbling 1-hour window aggregation over event time — the
    * batch twin of streaming st01 (same `window()` operator). */
  def ev01TumblingCounts(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("timestamp").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** ev02: gap-based sessionization (30-minute inactivity gap). One
    * shuffle on user_id; lag + cumulative-sum windows share the sort. */
  def ev02Sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_trunc("second", min(col("ts"))).cast("timestamp").as("session_start"),
        date_trunc("second", max(col("ts"))).cast("timestamp").as("session_end"))
  }

  /** ev03: ordered conversion funnel signup → purchase. */
  def ev03Funnel(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_raw_ts"))
    val converted = purchases
      .join(signups, col("p_user") === col("user_id") && col("p_raw_ts") >= col("s_ts"))
      .groupBy(col("user_id").as("u")).agg(min(col("p_raw_ts")).as("p_ts"))
    signups.join(converted, col("user_id") === col("u"), "left_outer")
      .agg(count(lit(1)).as("n_signup"), count(col("p_ts")).as("n_converted"))
  }

  /** ev04: cohort retention — users bucketed by first-seen day, counted
    * on each later activity day offset. */
  def ev04Retention(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val first = e.groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).cast("date").as("cohort"))
    e.join(first, Seq("user_id"))
      .withColumn("day_offset",
        datediff(date_trunc("day", col("ts")).cast("date"), col("cohort")))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** ev05: semi-structured JSON property extraction + aggregation.
    * Spark side uses the native JSON path operator; the oracle uses a
    * regex so it stays portable — values agree because props is the
    * single-key object {"k": <int>}. */
  def ev05JsonProps(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))

  /** ev06: as-of join — for every purchase, the most recent strictly
    * earlier `view` of the same user. Composed scalably: tag both
    * streams, union, ONE shuffle+sort on (user_id, ts), then a
    * last-ignoring-nulls window over the preceding frame. Never the
    * quadratic per-key join a naive as-of would be at 100 TB. */
  def ev06AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
    // side DESC: at equal ts a purchase (side=1) sorts BEFORE the views,
    // so same-timestamp views stay out of its preceding frame — the
    // strictly-earlier (v.ts < p.ts) semantics of the oracle and ev09
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    views.unionByName(purch)
      .withColumn("prior_view_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        sec("ts", "p_ts"),
        date_trunc("second", col("prior_view_ts")).cast("timestamp").as("prior_view_ts"))
  }

  /** ev08: explicit two-phase (salted) aggregation — the skew-proof
    * shape for hot keys at 100 TB: phase 1 aggregates on
    * (user_id, salt) spreading a hot user over 16 reducers; phase 2
    * combines the 16 partials per user. Same result as a direct
    * groupBy, immune to single-reducer hot spots. */
  def ev08SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val partial = ev(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("value")).as("pv"))
    partial
      .groupBy(col("user_id"))
      .agg(sum(col("pc")).as("n_events"), round(sum(col("pv")), 2).as("total_value"))
  }

  /** ev09: the same as-of semantics as ev06, but through graft's NATIVE
    * as-of join operator (AsOfJoinPlan → AsOfJoinStrategy →
    * AsOfJoinExec merge-scan; see graft.plans.AsOfJoin). One shuffle +
    * sort per side, O(1) state per partition — vs ev06's union+window
    * composition which carries both streams through one window sort.
    * Shares ev06's oracle. */
  def ev09AsofNative(s: SparkSession, d: String): DataFrame = {
    if (!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev(s, d).filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    graft.plans.AsOf.asofJoin(purchases, views, "user_id", "ts", "v_user", "v_ts")
      .select(col("event_id"), col("user_id"),
        sec("ts", "p_ts"),
        date_trunc("second", col("v_ts")).cast("timestamp").as("prior_view_ts"))
  }

  /** ev18: as-of join with a STALENESS TOLERANCE — ev09's native
    * operator bounded to views at most 1 hour before the purchase
    * (attribution windows, sensor freshness). Same one-shuffle
    * merge-scan plan; the tolerance is an O(1) check on the buffered
    * match, not an extra join. */
  def ev18AsofTolerance(s: SparkSession, d: String): DataFrame = {
    if (!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev(s, d).filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    graft.plans.AsOf.asofJoin(purchases, views, "user_id", "ts", "v_user", "v_ts",
        toleranceUs = 3600L * 1000000)
      .select(col("event_id"), col("user_id"),
        sec("ts", "p_ts"),
        date_trunc("second", col("v_ts")).cast("timestamp").as("prior_view_ts"))
  }

  /** ev10: SLIDING window aggregation (2-hour window, 1-hour slide) —
    * each event lands in two windows; Spark's window() expands them
    * natively, the oracle replays the expansion with an explicit
    * 2-element unnest. */
  def ev10SlidingWindows(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").cast("timestamp").as("window_start"),
        col("n_events"), col("n_users"))

  /** ev11: CDC-style merge/upsert without a table format — a "snapshot"
    * (events before Jan 15) merged with a "changes" batch (events
    * after): per (user_id, event_type) key the latest record wins.
    * Union + one keyed window, the merge shape that needs no
    * per-key state and shuffles each side exactly once. */
  def ev11UpsertMerge(s: SparkSession, d: String): DataFrame = {
    val split = to_timestamp(lit("2024-01-15 00:00:00"))
    val e = ev(s, d)
    val snapshot = e.filter(col("ts") < split)
    val changes = e.filter(col("ts") >= split)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    snapshot.unionByName(changes)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("latest_event_id"),
        sec("ts", "latest_ts"), round(col("value"), 2).as("latest_value"))
  }

  /** ev12: per-user behavioral feature table — the feature-engineering
    * shape for downstream ML: event-type counts (wide conditional
    * aggs), monetary aggregates, and recency, all in ONE groupBy pass
    * over the fact table. */
  def ev12UserFeatures(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))), 2).as("purchase_value"),
        date_trunc("second", max(col("ts"))).cast("timestamp").as("last_seen"),
        countDistinct(date_trunc("day", col("ts"))).as("active_days"))

  /** ev07: keep-first dedup for idempotent replay — collapse duplicate
    * (user, type, minute) triples to the earliest event. */
  def ev07EventDedup(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).cast("timestamp").as("bucket"))
      .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** ev13: event-type transition matrix (1st-order Markov counts) —
    * lag over the per-user timeline, then one aggregate. Shares the
    * single (user_id)-partitioned sort with every other per-user
    * window op; the output is |types|² rows regardless of input size. */
  def ev13Transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** ev14: rolling 7-day distinct active users per day. Distinct counts
    * don't decompose over sliding windows, so the scalable shape is:
    * collapse to (day, user) once — the big shuffle, input-sized — then
    * range-join the tiny day spine against that (days × 7 fan-out,
    * trivial) and count distinct per day. */
  def ev14Rolling7dActive(s: SparkSession, d: String): DataFrame = {
    val du = ev(s, d)
      .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
      .distinct()
    val spine = du.select(col("day")).distinct().select(col("day").as("d0"))
    du.join(broadcast(spine),
        col("day") >= date_sub(col("d0"), 6) && col("day") <= col("d0"))
      .groupBy(col("d0").as("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
  }

  /** ev27: cohort LTV matrix — the VALUE twin of ev04's retention
    * counts: per (signup-month cohort × months-since) cell, cumulative
    * purchase value and payer counts. One first-seen aggregate + one
    * fact pass. */
  def ev27CohortLtv(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val first = e.groupBy(col("user_id"))
      .agg(min(date_trunc("month", col("ts"))).cast("date").as("cohort_month"))
    e.filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .withColumn("month_offset",
        months_between(date_trunc("month", col("ts")).cast("date"),
          col("cohort_month")).cast("int"))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(countDistinct(col("user_id")).as("n_payers"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Exact linearly-interpolated percentiles of an integer column, in
    * CENTI-units (value × 100) as BIGINT — float-free end to end. The
    * percentile_cont definition interpolates at pos = p·(n−1); with p
    * given in hundredths, pos·100 is an integer, so v[⌊pos⌋] and
    * v[⌈pos⌉] weighted by the integer remainder give the exact result
    * on a ×100 grid — no IEEE interpolation, no rounding, and no
    * true-half hazard (rounding an interpolated double was the latent
    * cross-engine hash risk). Order statistics come from a value
    * HISTOGRAM with a cumulative count: the one partition-less window
    * runs over |distinct values| rows (bounded by the value domain,
    * e.g. seconds of lateness — never by row count). */
  private def centiPercentiles(vals: DataFrame, c: String, nName: String,
      ps: Seq[(Int, String)], maxName: Option[String]): DataFrame = {
    val stats = vals.agg(count(lit(1)).as("_n"))
    val hist = vals.groupBy(col(c)).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(Window.orderBy(col(c))))
      .crossJoin(broadcast(stats))
    // coalesce: an EMPTY input (e.g. no late events at tiny SFs) must
    // report n = 0 with NULL percentiles, not a NULL count
    val aggs: Seq[Column] = Seq(coalesce(max(col("_n")), lit(0L)).as(nName)) ++
      ps.flatMap { case (p, out) => Seq(
        min(when(expr(s"_cum >= ($p*(_n-1)) div 100 + 1"), col(c)))
          .as(s"_${out}_lo"),
        min(when(expr(s"_cum >= ($p*(_n-1)+99) div 100 + 1"), col(c)))
          .as(s"_${out}_hi"))
      } ++ maxName.map(m => max(col(c)).as(m)).toSeq
    val agged = hist.agg(aggs.head, aggs.tail: _*)
    val outs: Seq[Column] = Seq(col(nName)) ++ ps.map { case (p, out) =>
      expr(s"_${out}_lo * (100 - ($p*($nName-1)) % 100) + " +
        s"_${out}_hi * (($p*($nName-1)) % 100)").as(out)
    } ++ maxName.map(col).toSeq
    agged.select(outs: _*)
  }

  /** ev26: watermark-horizon recommendation — the lateness
    * distribution of out-of-order events (ev19's signal) reduced to
    * the p50/p95/max a streaming job needs to pick its watermark:
    * a horizon at p95 lateness bounds state while admitting 95% of
    * stragglers. Integer seconds end-to-end; percentiles exact in
    * centi-seconds (no float interpolation on either engine). */
  def ev26WatermarkHorizon(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lateness = ev(s, d)
      .withColumn("ts_s", col("ts").cast("long"))
      .withColumn("prior_max_s", max(col("ts_s")).over(w))
      .filter(col("ts_s") < col("prior_max_s"))
      .select((col("prior_max_s") - col("ts_s")).as("late_s"))
    centiPercentiles(lateness, "late_s", "n_late",
      Seq(50 -> "p50_late_cs", 95 -> "p95_late_cs"), Some("max_late_s"))
  }

  /** ev25: daily volume-deviation monitor — each full-window day's
    * event count against its trailing 7-day baseline, with an
    * anomaly flag at the +20% line. All comparisons are integer
    * CROSS-MULTIPLICATION (n·window vs k·trailing_sum) — no division,
    * no floats, engine-exact. The ingest-spike alarm a pipeline runs
    * before trusting a day's data. */
  def ev25AnomalyDays(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("trail_sum", sum(col("n")).over(w))
      .withColumn("trail_n", count(lit(1)).over(w))
      .filter(col("trail_n") === 7)
      .select(col("day"), col("n"), col("trail_sum"),
        (col("n") * 7 - col("trail_sum")).as("dev7"),
        (col("n") * 70 > col("trail_sum") * 12).as("is_spike"))
  }

  /** ev24: big-big TIME-RANGE join via bin bucketization — for every
    * purchase, the count of views (any user) in the preceding 5
    * minutes. There is NO equi-key, so a naive plan is a quadratic
    * nested-loop; binning both sides by the window width and exploding
    * each probe into its two candidate bins turns it into a plain
    * equi-join on `bin` + a residual filter — shuffle ∝ input, exact
    * result, the composed-operator answer to interval joins at 100 TB. */
  def ev24TimeRangeJoin(s: SparkSession, d: String): DataFrame = {
    val win = 300L
    val e = ev(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").cast("long").as("ts_s"))
    val views = e.filter(col("event_type") === "view")
      .select(col("ts").cast("long").as("v_s"))
      .withColumn("bin", expr(s"v_s div $win"))
    val probes = purchases
      .withColumn("bin0", expr(s"ts_s div $win"))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"))))
    val counts = probes.join(views, Seq("bin"))
      .filter(col("v_s") >= col("ts_s") - win && col("v_s") < col("ts_s"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
    purchases.join(counts, Seq("event_id"), "left_outer")
      .select(col("event_id"), coalesce(col("n"), lit(0L)).as("n_recent_views"))
  }

  /** ev23: behavioral lift profile — each user's event-type mix (in
    * exact basis points) beside the corpus-wide mix, the
    * over/under-indexing table a segmentation model consumes. The
    * global mix is a 5-row broadcast; everything stays integer. */
  def ev23TypeLift(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val user = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_ut"))
    val userTot = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_u"))
    val global = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val total = e.agg(count(lit(1)).as("n_all"))
    user.join(userTot, Seq("user_id"))
      .join(broadcast(global), Seq("event_type"))
      .crossJoin(broadcast(total))
      .select(col("user_id"), col("event_type"),
        expr("n_ut * 10000 div n_u").as("user_bp"),
        expr("n_t * 10000 div n_all").as("global_bp"))
  }

  /** ev22: top session paths — the 10 most common session-opening
    * event-type sequences (first 3 events per session), the
    * sequence-mining summary product teams read. Reuses the ev02
    * sessionization windows; the per-session sequence is assembled
    * with an explicit (ts, event_id) sort, never collection order. */
  def ev22TopPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
    sessions
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(array_join(
        expr("transform(slice(evs, 1, 3), x -> x.event_type)"), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  /** ev21: funnel latency distribution — seconds from signup to FIRST
    * subsequent purchase per converted user, summarized as exact
    * p50/p90 (integer-second deltas → percentile interpolation is
    * engine-stable). The per-user reduction happens in one agg; the
    * percentile runs on the (tiny) converted-user frame. */
  def ev21FunnelLatency(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts").cast("long")).as("s_s"))
    val latencies = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("long").as("p_s"))
      .join(signups, Seq("user_id"))
      .filter(col("p_s") >= col("s_s"))
      .groupBy(col("user_id")).agg(min(col("p_s") - col("s_s")).as("latency_s"))
    centiPercentiles(latencies.select(col("latency_s")), "latency_s",
      "n_converted", Seq(50 -> "p50_cs", 90 -> "p90_cs"), None)
  }

  /** ev20: SCD2-style validity intervals — each (user, type) state
    * change becomes a [valid_from, valid_to) row, open-ended for the
    * current state (the temporal-table shape a warehouse keeps for
    * point-in-time joins). One keyed window; lead() closes each
    * interval with the next change's timestamp. */
  def ev20ValidityIntervals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("valid_to_raw", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("event_id"),
        sec("ts", "valid_from"),
        date_trunc("second", col("valid_to_raw")).cast("timestamp").as("valid_to"),
        col("valid_to_raw").isNull.as("is_current"))
  }

  /** ev19: out-of-order ingestion audit — per user, how many events
    * arrived with a timestamp BELOW the running maximum (i.e. would be
    * "late" to a streaming watermark), and the worst lateness. The
    * data-quality pass you run before choosing a watermark horizon.
    * One per-user window, integer-exact output. */
  def ev19OutOfOrder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(s, d)
      // whole-second event time on both engines (the raw column's
      // ns-vs-us precision must not decide orderings)
      .withColumn("ts_s", col("ts").cast("long"))
      .withColumn("prior_max_s", max(col("ts_s")).over(w))
      .withColumn("late_s",
        when(col("ts_s") < col("prior_max_s"), col("prior_max_s") - col("ts_s")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("late_s")).as("n_late"),
        coalesce(max(col("late_s")), lit(0L)).as("max_late_s"))
  }

  /** ev16: time-bounded conversion funnel — signup → purchase within
    * 7 days (ev03 without a bound over-credits late conversions). The
    * join predicate carries the window, so Spark can still plan it as
    * one shuffled equi-join on user with a range residual. */
  def ev16WindowedFunnel(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val converted = purchases
      .join(signups, col("p_user") === col("user_id") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .select(col("user_id")).distinct()
    signups.join(converted.withColumnRenamed("user_id", "c_user"),
        col("user_id") === col("c_user"), "left_outer")
      .agg(count(lit(1)).as("n_signup"), count(col("c_user")).as("n_converted_7d"))
  }

  /** Exact DISTRIBUTED ntile(4) over a unique (key, user_id) order —
    * the scale-safe replacement for `ntile(4).over(Window.orderBy(…))`,
    * which funnels the whole frame through ONE sort partition. The
    * classic two-phase distributed rank: (1) sketch quantile boundaries
    * split the key space into ≤8 contiguous range buckets — the
    * boundaries are approximate, but they only affect LOAD BALANCE:
    * any contiguous bucketization yields the same final ranks;
    * (2) exact per-bucket counts prefix-sum into bucket offsets (a
    * ≤8-row frame — constant-sized, not data-sized); (3) a per-BUCKET
    * window rank plus the bucket offset is the exact global rank, and
    * ntile's bucket assignment is closed-form in (rank, n). Output is
    * bit-identical to the single-partition ntile it replaces. */
  private def exactNtile4(df0: DataFrame, key: Column, out: String): DataFrame = {
    // cache the input frame: it feeds the boundary agg, the bucket
    // counts, AND the final rank join (≥3 plan references) — and when
    // ntiles chain (ev17 runs three), an uncached level would be
    // re-executed by every reference of the next level, compounding
    // ~3× per level. The frame is per-entity (≪ raw events).
    val df = CacheScope.cached(df0)
    val keyed = df.withColumn("_k", key.cast("double"))
    val bnds = keyed.agg(percentile_approx(col("_k"),
      array((1 to 7).map(i => lit(i / 8.0)): _*), lit(1000)).as("_bnds"))
    val bucketed = keyed.crossJoin(broadcast(bnds))
      .withColumn("_b", expr(
        "aggregate(_bnds, 0, (acc, b) -> acc + CASE WHEN _k > b THEN 1 ELSE 0 END)"))
      .drop("_bnds")
    val counts = bucketed.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
    // ≤8 rows: the only partition-less window runs over a frame whose
    // size is bounded by the boundary count, never by the data
    val offs = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(
        Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c")).over())
    // per-level lazy truncation: when ntiles CHAIN (ev17/ev57 run
    // three), each level references its input ≥3×, so the analyzed
    // tree grows ~3× per level — the flat leaf keeps the chain's
    // analysis cost linear (the rfmFrom base-truncation finding, one
    // level deeper). Ranks are pure functions of the input values, so
    // the output rows are bit-identical.
    import graft.ops.Checkpoints.TruncateOps
    bucketed
      .join(broadcast(offs.select(col("_b"), col("_off"), col("_n"))), Seq("_b"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("_b")).orderBy(col("_k"), col("user_id")))
        .cast("long") + col("_off"))
      .withColumn(out, expr(
        """CAST(CASE WHEN (_r - 1) < (_n % 4) * (_n div 4 + 1)
          |  THEN (_r - 1) div (_n div 4 + 1)
          |  ELSE (_n % 4) + (_r - 1 - (_n % 4) * (_n div 4 + 1)) div (_n div 4)
          |END + 1 AS INT)""".stripMargin))
      .drop("_k", "_b", "_off", "_n", "_r")
      .truncated
  }

  /** ev17: RFM segmentation — recency / frequency / monetary quartile
    * scores per user, the classic behavioral-segmentation feature. All
    * three metrics come from ONE groupBy pass; the corpus max-day
    * scalar broadcasts; quartile ties are made deterministic by a
    * (metric, user_id) total order. Each quartile assignment runs in
    * the exact distributed ntile above (range-bucketed rank, no
    * |users|-sized single-partition sort); descending metrics are
    * ranked on the negated key — an exact order flip. */
  def ev17RfmScores(s: SparkSession, d: String): DataFrame =
    rfmFrom(ev(s, d))

  /** ev17 parameterized by its event frame — the RFM scores are
    * POPULATION-RELATIVE (quartile boundaries and the corpus horizon
    * both derive from the input), so the bot gate must run BEFORE
    * this aggregation, not as an output filter (contrast pp42, where
    * per-user closure makes post-aggregate gating exact). */
  private def rfmFrom(e: DataFrame): DataFrame = {
    val perUser = e.groupBy(col("user_id")).agg(
      max(date_trunc("day", col("ts")).cast("date")).as("last_day"),
      count(when(col("event_type") === "purchase", 1)).as("frequency"),
      round(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0))), 2).as("monetary"))
    val maxDay = e.agg(max(date_trunc("day", col("ts")).cast("date")).as("corpus_max"))
    // TRUNCATE the per-user base before the ntile chain: each
    // exactNtile4 level references its input ≥3 times and the chain is
    // three deep, so the analyzed tree repeats the base subtree ~27× —
    // with a gated event source (ev57: the whole ev54 detection chain
    // under every leaf) the composed plan reached ~2 MB of formatted
    // text and ANALYSIS time, not data, dominated the query (measured
    // 6.9 s steady-state vs 0.3 s for the detection chain itself).
    // A lazy localCheckpoint flattens the base to one LogicalRDD leaf;
    // ntile output is bit-identical (ranks depend only on values).
    import graft.ops.Checkpoints.TruncateOps
    val base = perUser.crossJoin(broadcast(maxDay))
      .withColumn("recency_days", datediff(col("corpus_max"), col("last_day")))
      .truncated
    exactNtile4(
      exactNtile4(
        exactNtile4(base, col("recency_days"), "r_score"),
        negate(col("frequency")), "f_score"),
      negate(col("monetary")), "m_score")
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"))
  }

  /** ev29: session-duration distribution — ev02's sessions reduced to
    * a log₂-bucketed duration histogram (bucket = ⌊log₂(dur_s+1)⌋ via
    * the engine-portable `length(bin(x))−1`, no float log): the
    * constant-size summary a session-quality dashboard reads instead
    * of |sessions| rows. Buckets partial-aggregate; the only shuffle
    * beyond ev02's is the ≤~35-group histogram agg. */
  def ev29SessionDurations(s: SparkSession, d: String): DataFrame =
    ev02Sessionize(s, d)
      .withColumn("dur_s",
        col("session_end").cast("long") - col("session_start").cast("long"))
      .withColumn("bucket", (length(expr("bin(dur_s + 1)")) - 1).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        min(col("dur_s")).as("min_s"), max(col("dur_s")).as("max_s"))

  /** ev32: hour-of-day seasonality profile — event volume and value
    * by (hour-of-day × weekday/weekend), with each cell's share of the
    * total in exact basis points. The load-shaping profile capacity
    * planning reads. One partial-agg'd groupBy (≤48 cells) plus a
    * broadcast total. */
  def ev32Seasonality(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
      .withColumn("hour", hour(col("ts")))
      .withColumn("is_weekend", dayofweek(col("ts")).isin(1, 7))
    val cells = e.groupBy(col("hour"), col("is_weekend"))
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)")
          .as("value_c"))
    val total = cells.agg(sum(col("n_events")).as("n_total"))
    cells.crossJoin(broadcast(total))
      .withColumn("share_bp", expr("n_events * 10000 div n_total"))
      .drop("n_total")
  }

  /** ev31: strict THREE-step ordered funnel — signup, then a view
    * strictly after the first signup, then a purchase strictly after
    * that first qualifying view (first-occurrence semantics per step,
    * so each user counts at most once per stage). Two keyed joins on
    * |users|-sized frames — the raw event stream is scanned once per
    * step filter, never self-joined. */
  def ev31MultiStepFunnel(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("user_id"), col("event_type"),
      col("ts").cast("long").as("ts_s"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t1"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, Seq("user_id"))
      .filter(col("ts_s") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts_s") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_viewed_after")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchased_after")))
  }

  /** ev30: DAU/MAU stickiness — per day, the distinct daily actives
    * against the trailing-28-day actives, ratio in exact basis points.
    * The ev14 collapse-then-range-join shape: events collapse to
    * (day, user) ONCE (the only input-sized shuffle); the 28× fan-out
    * joins the collapsed frame against the broadcast day spine, never
    * the raw events. */
  def ev30Stickiness(s: SparkSession, d: String): DataFrame = {
    val du = ev(s, d)
      .select(date_trunc("day", col("ts")).cast("date").as("day"),
        col("user_id")).distinct()
    val days = du.select(col("day").as("d")).distinct()
    val dau = du.groupBy(col("day").as("d"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val mau = du.join(broadcast(days),
        col("day") <= col("d") && col("day") >= date_sub(col("d"), 27))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("mau"),
        expr("dau * 10000 div mau").as("stickiness_bp"))
  }

  /** ev28: exponentially-decayed engagement score per user — the
    * freshness-weighted activity feature a ranking pipeline maintains:
    * each event contributes value·2^−age_weeks, computed EXACTLY as
    * value_cents·2^(5−age_weeks) (one shared ×2⁵ scaling, events older
    * than 5 weeks contribute 0) — pure integer shift arithmetic, no
    * float pow, so both engines agree bit-for-bit. One groupBy pass;
    * the corpus max-day scalar broadcasts. */
  def ev28DecayScores(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val maxDay = e.agg(
      max(date_trunc("day", col("ts")).cast("date")).as("corpus_max"))
    e.crossJoin(broadcast(maxDay))
      .withColumn("age_w", expr(
        "datediff(corpus_max, CAST(date_trunc('day', ts) AS DATE)) div 7"))
      .withColumn("w", expr(
        "CASE WHEN age_w <= 5 THEN shiftleft(CAST(1 AS BIGINT), CAST(5 - age_w AS INT)) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("value_c", expr("CAST(round(value * 100, 0) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(sum(col("value_c") * col("w")).as("decay_score_c32"),
        count(lit(1)).as("n_events"))
  }

  /** ev15: top-20 longest per-user inactivity gaps — lag diff inside
    * the per-user window, then TakeOrderedAndProject (per-partition
    * partial top-k, only k rows per task reach the driver merge). */
  def ev15TopGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("gap_s", col("ts").cast("long") - col("prev_ts").cast("long"))
      .select(col("user_id"), col("gap_s"),
        date_trunc("second", col("prev_ts")).cast("timestamp").as("gap_start"))
      .orderBy(col("gap_s").desc, col("user_id"), col("gap_start"))
      .limit(20)
  }

  /** ev33: inter-arrival gap distribution per event type — lag gaps
    * inside each (user, type) stream, then exact ×100-grid order
    * statistics per type via the value HISTOGRAM (the ev21/ev26
    * pattern, grouped): the cumulative window runs over the tiny
    * (type, gap) histogram — never the raw gap stream — so no
    * per-type single-partition sort exists at any scale. */
  def ev33InterArrival(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = ev(s, d)
      .withColumn("prev_t", lag(col("ts").cast("long"), 1).over(w))
      .filter(col("prev_t").isNotNull)
      .select(col("event_type"),
        (col("ts").cast("long") - col("prev_t")).as("gap_s"))
    val hist = gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c"))
        .over(Window.partitionBy(col("event_type")).orderBy(col("gap_s"))))
    val tot = gaps.groupBy(col("event_type")).agg(count(lit(1)).as("_n"))
    def pCol(p: Int, out: String): Seq[Column] = Seq(
      min(when(expr(s"_cum >= ($p*(_n-1)) div 100 + 1"), col("gap_s")))
        .as(s"_${out}_lo"),
      min(when(expr(s"_cum >= ($p*(_n-1)+99) div 100 + 1"), col("gap_s")))
        .as(s"_${out}_hi"))
    val aggs: Seq[Column] = Seq(max(col("_n")).as("n_gaps"),
      min(col("gap_s")).as("min_gap_s"),
      max(col("gap_s")).as("max_gap_s")) ++ pCol(50, "p50") ++ pCol(90, "p90")
    val agged = hist.join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
    agged.select(col("event_type"), col("n_gaps"), col("min_gap_s"),
      col("max_gap_s"),
      expr("_p50_lo * (100 - (50*(n_gaps-1)) % 100) + " +
        "_p50_hi * ((50*(n_gaps-1)) % 100)").as("p50_cs"),
      expr("_p90_lo * (100 - (90*(n_gaps-1)) % 100) + " +
        "_p90_hi * ((90*(n_gaps-1)) % 100)").as("p90_cs"))
  }

  /** ev34: weekday-profile anomaly — each day's volume against the
    * MEDIAN of its own weekday (Mondays vs Mondays), catching the
    * weekly-seasonality false-positives a flat global baseline (ev25)
    * raises on every weekend. Lower-median order statistic keeps it
    * on the integer grid. The whole computation happens on the
    * one-row-per-day frame — ~365 rows per year at ANY event volume
    * — so the windows here are bounded by the calendar, not the
    * data. */
  def ev34WeekdayAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("weekday", dayofweek(col("day")))
    val wWd = Window.partitionBy(col("weekday"))
      .orderBy(col("n_events"), col("day"))
    val med = daily
      .withColumn("rn", row_number().over(wWd))
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy(col("weekday"))))
      .filter(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("weekday"), col("n_events").as("wd_median"))
    daily.join(broadcast(med), Seq("weekday"))
      .withColumn("dev_bp",
        expr("abs(n_events - wd_median) * 10000 div wd_median"))
      .withColumn("is_anomaly", (col("dev_bp") > 3000).cast("int"))
      .select(col("day"), col("weekday"), col("n_events"),
        col("wd_median"), col("dev_bp"), col("is_anomaly"))
  }

  /** ev35: last-touch purchase attribution — for every purchase, the
    * user's most recent preceding non-purchase event is the credited
    * channel ('direct' when the purchase is the user's first event).
    * One per-user window (partitioned by user_id — distributes
    * cleanly; no global sort), ordered on (ts, event_id) so same-
    * timestamp events resolve identically on both engines; revenue
    * rounded to cents only at the final per-channel aggregate. */
  def ev35Attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(s, d)
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
  }

  /** ev36: peak session concurrency per day — the interval sweep-line
    * (+1 at session start, −1 one second after it ends; −1 sorts
    * before +1 at the same instant so back-to-back sessions never
    * double-count), DISTRIBUTED two-phase instead of one partition-
    * less running sum: deltas bucket by hour-of-day, each (day, hour)
    * bucket computes its internal running max, and a ≤25-row per-day
    * prefix sum over bucket nets turns local maxima into the exact
    * global peak (the ev17/pp08 pattern — at 100 TB the bucket
    * granularity is the knob, never the algorithm). Sessions crossing
    * midnight are clipped into per-day segments first, so every day
    * counts exactly the sessions live within it. */
  def ev36PeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val sess = ev02Sessionize(s, d)
      .select(col("session_start"), col("session_end"))
    val segs = sess
      .withColumn("day",
        explode(expr("sequence(to_date(session_start), to_date(session_end))")))
      .select(col("day"),
        greatest(col("session_start"), col("day").cast("timestamp"))
          .as("seg_start"),
        least(col("session_end"),
          expr("to_timestamp(day) + INTERVAL 1 DAY - INTERVAL 1 SECOND"))
          .as("seg_end"))
    val deltas = segs
      .select(col("day"), col("seg_start").as("ts"), lit(1).as("delta"))
      .unionByName(segs.select(col("day"),
        expr("seg_end + INTERVAL 1 SECOND").as("ts"), lit(-1).as("delta")))
      // bucket index from the day's own midnight: the −1 emitted at
      // next-day 00:00:00 lands in bucket 24 and keeps bucket order
      // aligned with timestamp order inside the day frame
      .withColumn("hr",
        expr("(CAST(ts AS LONG) - CAST(to_timestamp(day) AS LONG)) div 3600"))
    val wIn = Window.partitionBy(col("day"), col("hr"))
      .orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = deltas
      .withColumn("run", sum(col("delta")).over(wIn))
      .groupBy(col("day"), col("hr"))
      .agg(sum(col("delta")).as("net"), max(col("run")).as("hi"),
        sum(when(col("delta") === 1, 1).otherwise(0)).as("n_starts"))
    val wDay = Window.partitionBy(col("day")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    buckets
      .withColumn("offset", coalesce(sum(col("net")).over(wDay), lit(0L)))
      .groupBy(col("day"))
      .agg(max(col("offset") + col("hi")).as("peak_concurrency"),
        sum(col("n_starts")).as("n_sessions"))
  }

  /** ev37: burst-day detection — a day is a burst when its event count
    * exceeds the mean of its up-to-7 preceding observed days by more
    * than 5%, compared in cross-multiplied integers
    * (20·n·n_prev > 21·Σprev) so no float mean exists to disagree on;
    * ≥3 prior days required to suppress cold-start noise. (The 5%
    * sensitivity is a config knob; day-volume noise shrinks as √N, so
    * larger corpora fire it on genuinely smaller relative spikes.)
    * The raw scan partial-aggregates to the (type, day) frame —
    * days×types rows — and the trailing window runs on THAT frame,
    * partitioned by type: window cost is bounded by the calendar,
    * never by event volume. */
  def ev37BurstDays(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("sum_prev", sum(col("n_events")).over(w))
      .withColumn("n_prev", count(col("n_events")).over(w))
      .filter(col("n_prev") >= 3 &&
        lit(20L) * col("n_events") * col("n_prev") >
          lit(21L) * col("sum_prev"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("n_prev"), col("sum_prev"))
  }

  /** ev38: linear (equal-credit) multi-touch attribution — every
    * view/click in the 7 days up to a purchase shares the purchase
    * and its revenue equally; purchases with no touches credit a
    * 'direct' channel. Credits live on an exact integer micro-grid:
    * each touch gets 10⁶·(1/n) floor-divided once, so channel sums
    * are bit-stable across engines (documented floor remainder ≤
    * n−1 µunits per purchase). Complements ev35's last-touch rule.
    * Scale: the purchase×touch range join is keyed on user_id (the
    * ev24 shape — per-user frames bound the expansion; a hot user is
    * the q43/ev08 salting case); everything after is two bounded
    * aggregations. */
  def ev38LinearAttribution(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
        col("event_type").as("channel"))
    val perChannel = purchases
      .join(touches,
        col("p_user") === col("t_user") && col("t_ts") <= col("p_ts") &&
          col("t_ts") > col("p_ts") - expr("INTERVAL 7 DAYS"),
        "left_outer")
      .groupBy(col("p_id"), col("cents"), col("channel"))
      .agg(count(col("t_user")).as("n_ch"))
    val perPurchase = perChannel.groupBy(col("p_id"), col("cents"))
      .agg(sum(col("n_ch")).as("n_tot"))
    val touched = perChannel.filter(col("n_ch") > 0)
      .join(perPurchase.select(col("p_id"), col("n_tot")), Seq("p_id"))
      .select(col("channel"),
        (col("n_ch") * expr("1000000 div n_tot")).as("p_micro"),
        (col("n_ch") * expr("(cents * 1000000) div n_tot")).as("r_micro"))
    val direct = perPurchase.filter(col("n_tot") === 0)
      .select(lit("direct").as("channel"),
        lit(1000000L).as("p_micro"),
        (col("cents") * 1000000L).as("r_micro"))
    touched.unionByName(direct)
      .groupBy(col("channel"))
      .agg(sum(col("p_micro")).as("purchases_micro"),
        sum(col("r_micro")).as("revenue_micro"))
  }

  /** ev39: time-weighted average value per user (the TWAP / average-
    * position shape): each event's value counts for the SECONDS until
    * the user's next event, so a reading held for an hour weighs 3600×
    * one held for a second — the correct average for state-like series
    * (sensor levels, account balances) where plain avg() overweights
    * chatty bursts. One per-user lead() window (partitioned, scales
    * with the user-hash shuffle) + one aggregate; cents × seconds stay
    * on exact integer grids, the final ratio is integer division both
    * engines replay identically. Last event per user holds nothing. */
  def ev39Twap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("ts").cast("long").as("t_s"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("vc"))
      .withColumn("next_t", lead(col("t_s"), 1).over(w))
      .filter(col("next_t").isNotNull)
      .withColumn("dur_s", col("next_t") - col("t_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_s")).as("held_s"),
        sum(col("vc") * col("dur_s")).as("vsum_cs"))
      .filter(col("held_s") > 0)
      .withColumn("twap_c", expr("vsum_cs div held_s"))
  }

  /** ev40: OHLC bars — per day × event type: first (open), highest,
    * lowest and last (close) value, the candlestick primitive every
    * monitoring/market surface draws. open/close are min_by/max_by on
    * the (ts, event_id) struct — deterministic under ts ties, one
    * partial-aggregable pass, no window, no sort: at 100 TB this is a
    * single map-side-combined shuffle on (day, type), not a per-group
    * ordering. Cents grid throughout. */
  def ev40Ohlc(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .select(date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("vc"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("vc"), struct(col("ts"), col("event_id"))).as("open_c"),
        max(col("vc")).as("high_c"),
        min(col("vc")).as("low_c"),
        max_by(col("vc"), struct(col("ts"), col("event_id"))).as("close_c"))

  /** ev41: LOCF gap-fill (last observation carried forward) — every
    * event annotated with the user's most recent purchase value at
    * that moment, the standard way to densify a sparse state series
    * (prices, sensor readings, account balances) onto an event grid.
    * The engine primitive is `last(..., ignoreNulls)` over the
    * preceding frame — one partitioned window, no self-join, no
    * per-row subquery (the naive correlated formulation); -1 marks
    * "no observation yet" so the filled column stays a non-null
    * BIGINT on both engines. */
  def ev41Locf(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase",
          expr("CAST(round(value * 100, 0) AS BIGINT)")).as("pv"))
      .withColumn("last_purchase_c",
        coalesce(last(col("pv"), ignoreNulls = true).over(w), lit(-1L)))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("last_purchase_c"))
  }

  /** ev42: cumulative-deviation drift detection (CUSUM family) — per
    * event_type, is the running daily volume drifting away from the
    * type's overall mean rate? dev = cum_events·n_days − day_idx·total
    * is the cumulative deviation cross-multiplied onto an exact
    * integer grid (no mean division, no floats), positive = running
    * hot. A day drifts when |dev| exceeds 5% of total volume
    * (|dev|·20 > total·n_days, again cross-multiplied). One exchange:
    * the daily rollup keys on (type, day); the running sum, row index,
    * and per-type totals are all frames over the SAME (type, day)
    * sort — calendar-sized per type, never event-sized, at 100 TB. */
  def ev42CusumDrift(s: SparkSession, d: String): DataFrame = {
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    ev(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("cum_events",
        sum(col("n_events")).over(wRun.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("day_idx", row_number().over(wRun).cast("long"))
      .withColumn("total_events", sum(col("n_events")).over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .select(col("event_type"), col("day"), col("n_events"),
        col("cum_events"),
        (col("cum_events") * col("n_days") - col("day_idx") * col("total_events"))
          .as("dev"),
        (abs(col("cum_events") * col("n_days") - col("day_idx") * col("total_events")) * 20
          > col("total_events") * col("n_days")).as("is_drift"))
  }

  /** ev43: activity streaks — per user, the longest and the current
    * run of CONSECUTIVE active days (the retention/engagement streak
    * every product surface shows). Classic gaps-and-islands on the
    * calendar: distinct active days → day − dense row index is
    * constant within a consecutive run → group by that anchor. The
    * frames are per-user DAY counts (≤ calendar-sized — thousands of
    * rows per user at most, never event-sized), so the two stacked
    * per-user windows ride one (user_id) shuffle and no global sort
    * exists anywhere; the current streak is the run that touches the
    * corpus max day (one single-row broadcast). */
  def ev43Streaks(s: SparkSession, d: String): DataFrame = {
    val days = ev(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = days.agg(max(col("day")).as("max_day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("anchor",
        date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("streak_len"), max(col("day")).as("streak_end"))
      .join(broadcast(maxDay))
      .groupBy(col("user_id"))
      .agg(sum(col("streak_len")).as("n_active_days"),
        max(col("streak_len")).as("longest_streak"),
        max(when(col("streak_end") === col("max_day"), col("streak_len"))
          .otherwise(0L)).as("current_streak"))
  }

  /** ev44: activity concentration (the Pareto/Lorenz point) — how many
    * of the most-active users generate 80% of all events. The naive
    * formulation sorts EVERY user by activity (a global sort of
    * |users| rows); the scale-safe one is the grouped value-histogram
    * trick (ev33's move): collapse users to (events-per-user → user
    * count) buckets, walk the ≤|distinct activity levels| histogram
    * rows in one bounded partition-less window, and resolve the
    * crossing bucket's fractional membership in closed form
    * (users within a bucket are interchangeable, so the COUNT of users
    * needed is exact even though which users is arbitrary). The 80%
    * threshold is cross-multiplied (5·cum ≥ 4·total) — no division
    * until the final bp share. */
  def ev44Pareto(s: SparkSession, d: String): DataFrame = {
    val uc = ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val hist = uc.groupBy(col("c"))
      .agg(count(lit(1)).as("m"), sum(col("c")).as("bucket_events"))
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = uc.agg(count(lit(1)).as("total_users"),
      sum(col("c")).as("total_events"))
    hist
      .withColumn("cum_events", sum(col("bucket_events")).over(w))
      .withColumn("cum_users", sum(col("m")).over(w))
      .crossJoin(broadcast(totals))
      .filter(col("cum_events") * 5 >= col("total_events") * 4 &&
        (col("cum_events") - col("bucket_events")) * 5 <
          col("total_events") * 4)
      .select(col("total_users"), col("total_events"),
        (col("cum_users") - col("m") +
          expr("""(total_events * 4 - (cum_events - bucket_events) * 5
                 |  + 5 * c - 1) div (5 * c)""".stripMargin))
          .as("users_p80"))
      .withColumn("top_share_bp",
        expr("users_p80 * 10000 div total_users"))
  }

  /** ev45: Markov stationary drift — where does user attention settle?
    * The per-step transition matrix (ev13's counts, row-normalized to
    * an exact ppm grid with integer division) is applied FIVE times to
    * the observed type distribution: v₅ ≈ the stationary mix, v₅ − v₀
    * the drift each product surface gains/loses as sessions run on.
    * The kernel point: an iterative fixed-point computation expressed
    * as five unrolled lazy joins over a |types|²-row frame — matrix
    * state stays METADATA-sized no matter how many billions of events
    * produced it (the one big input scan is the ev13 pair count), so
    * the iteration costs scheduler overhead only. Each step divides
    * ONCE after the sum (ppm grid), which both engines replay exactly. */
  def ev45Markov(s: SparkSession, d: String): DataFrame = {
    val trans = ev13Transitions(s, d)
    val rowTot = trans.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_n"))
    val m = trans.join(rowTot, Seq("prev_type"))
      .select(col("prev_type").as("src"), col("next_type").as("dst"),
        expr("n * 1000000 div row_n").as("m_ppm"))
    val v0 = ev(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(
        ev(s, d).agg(count(lit(1)).as("tot"))))
      .select(col("event_type"), expr("c * 1000000 div tot").as("v_ppm"))
    val v5 = (1 to 5).foldLeft(v0) { (v, _) =>
      v.join(m, col("event_type") === col("src"))
        .groupBy(col("dst"))
        .agg(expr("sum(v_ppm * m_ppm) div 1000000").as("v_ppm"))
        .withColumnRenamed("dst", "event_type")
    }
    v0.withColumnRenamed("v_ppm", "v0_ppm")
      .join(v5.withColumnRenamed("v_ppm", "v5_ppm"), Seq("event_type"))
      .withColumn("drift_ppm", col("v5_ppm") - col("v0_ppm"))
  }

  /** ev46: alert episodes with debounce — the monitoring state machine
    * over daily volumes: a type's day is HOT when it runs ≥20% above
    * the type's own mean daily rate (5·n·days > 6·total, cross-
    * multiplied — no float mean), and an ALERT EPISODE is ≥3
    * CONSECUTIVE hot days (the debounce that keeps one-day blips from
    * paging anyone). Hot-day runs come from the ev43 gaps-and-islands
    * anchor on the flagged-day subsequence; all frames are per-type
    * calendar-sized. Types that never alert still report a zero row
    * (left join from the type roster) — silence and health must be
    * distinguishable in a dashboard feed. */
  def ev46AlertEpisodes(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val wAll = Window.partitionBy(col("event_type"))
    val hot = daily
      .withColumn("total", sum(col("n_events")).over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .filter(col("n_events") * lit(5L) * col("n_days") >
        col("total") * lit(6L))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val episodes = hot
      .withColumn("anchor", date_sub(col("day"), row_number().over(wRun)))
      .groupBy(col("event_type"), col("anchor"))
      .agg(count(lit(1)).as("run_len"))
      .filter(col("run_len") >= 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_episodes"),
        sum(col("run_len")).as("alert_days"),
        max(col("run_len")).as("longest_episode"))
    ev(s, d).select(col("event_type")).distinct()
      .join(episodes, Seq("event_type"), "left_outer")
      .select(col("event_type"),
        coalesce(col("n_episodes"), lit(0L)).as("n_episodes"),
        coalesce(col("alert_days"), lit(0L)).as("alert_days"),
        coalesce(col("longest_episode"), lit(0L)).as("longest_episode"))
  }

  /** ev47: growth accounting — the canonical weekly user ledger every
    * growth team keeps: each active (user, week) is NEW (first week
    * ever), RETAINED (also active the prior week) or RESURRECTED
    * (returning after ≥1 silent week), and a CHURN is booked to the
    * week after a user's active week when they do not return in it.
    * The identity new + retained + resurrected = actives (per week)
    * is spec-asserted. One distinct (user, week) collapse — the only
    * input-sized shuffle — then per-user lag/lead over weekly frames
    * (≤ calendar-sized) and a week-keyed rollup; churn weeks beyond
    * the corpus horizon are clipped by a single-row max-week
    * broadcast. */
  def ev47GrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val uw = ev(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val statused = uw
      .withColumn("prev_w", lag(col("week"), 1).over(w))
      .withColumn("status",
        when(col("prev_w").isNull, lit("new"))
          .when(col("prev_w") === date_sub(col("week"), 7), lit("retained"))
          .otherwise(lit("resurrected")))
    val byWeek = statused.groupBy(col("week"))
      .agg(sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val maxWeek = uw.agg(max(col("week")).as("max_week"))
    val churns = uw
      .withColumn("next_w", lead(col("week"), 1).over(w))
      .filter(col("next_w").isNull ||
        col("next_w") > date_add(col("week"), 7))
      .select(date_add(col("week"), 7).as("week"))
      .join(broadcast(maxWeek), col("week") <= col("max_week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_churned"))
    byWeek.join(churns, Seq("week"), "full_outer")
      .select(col("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** ev48: autocorrelation moment sums — is a type's daily volume
    * self-similar at lag 1 (momentum) and lag 7 (weekly rhythm)?
    * Same discipline as q59/gr11: emit the EXACT integer sufficient
    * statistics of (xₜ, xₜ₊ₖ) pairs over the per-type daily series —
    * the Pearson autocorrelation is a closed form of them — plus the
    * cross-multiplied autocovariance sign, so nothing floats and the
    * hash compares. Row-lag over the observed (dense) daily sequence;
    * the series frames are calendar-sized per type, the lead() windows
    * ride one (type) shuffle, and the daily rollup is the only
    * input-sized pass. */
  def ev48Autocorr(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = Seq(1, 7).map { k =>
      daily.withColumn("y", lead(col("x"), k).over(w))
        .filter(col("y").isNotNull)
        .withColumn("lag_k", lit(k.toLong))
    }.reduce(_ unionByName _)
    lagged.groupBy(col("event_type"), col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("y") * col("y")).as("sum_yy"))
      .withColumn("cov_sign",
        signum(col("n_pairs") * col("sum_xy") - col("sum_x") * col("sum_y"))
          .cast("long"))
  }

  /** ev49: browse-no-buy (abandonment) rate per day — users who both
    * viewed AND clicked that day but never purchased, as a share of
    * the engaged users (ev03's funnel measures who converts; this
    * measures who leaks, per day). Two aggregations: the user-day
    * flag rollup (one input-sized shuffle on a high-cardinality key —
    * even partial-agg'd flags, never a distinct per type), then the
    * calendar-sized daily frame. Rate on an exact ppm integer grid;
    * engaged=0 days emit 0 (guarded — integer div by zero differs
    * across engines). */
  def ev49BrowseNoBuy(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day"), col("user_id"))
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("b"))
      .groupBy(col("day"))
      .agg(
        sum(when(col("v") === 1 && col("c") === 1, 1L).otherwise(0L))
          .as("engaged"),
        sum(when(col("v") === 1 && col("c") === 1 && col("b") === 0, 1L)
          .otherwise(0L)).as("abandoned"))
      .withColumn("abandon_ppm",
        when(col("engaged") === 0, 0L)
          .otherwise(expr("abandoned * 1000000 div engaged")))
  }

  /** ev50: per-user behavioral diversity — Simpson concentration of
    * each user's event-type distribution on an exact basis-point grid
    * (Σc(c−1) ·10⁴ div n(n−1), the unbiased pair-collision form): the
    * cheap bot/spam discriminator — scripted accounts hammer one type
    * (bp → 10⁴), organic users spread (low bp). The tx37 lexical
    * Simpson applied to the behavioral axis. Two aggregations: the
    * (user, type) rollup (one input-sized shuffle, partial-agg'd) then
    * the per-user frame (|users| rows); all arithmetic exact integer.
    * The ×10⁴ grid (pp26's rationale) keeps pair_sum·10⁴ inside int64
    * up to n ≈ 3·10⁷ events per user — 10× the headroom a ppm grid
    * gave, and past any plausible single-account volume; the bound is
    * asserted in the spec. n<2 users emit 0 (guarded — the pair form
    * is undefined there and integer ÷0 differs across engines). */
  def ev50UserDiversity(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(expr("c * (c - 1)")).as("pair_sum"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        when(col("n_events") < 2, lit(0L))
          .otherwise(expr("pair_sum * 10000 div (n_events * (n_events - 1))"))
          .as("simpson_bp"))

  /** ev51: CEP pattern with NEGATION — "view followed by purchase
    * within 2 h with NO error in between", per user. The funnels
    * (ev03/ev16/ev31) can only require steps to OCCUR; real CEP
    * engines (FlinkCEP's notFollowedBy) also require an event NOT to
    * intervene — the absence constraint a join can't express without
    * an anti-join per candidate pair. Here it costs nothing extra:
    * one per-user ordered window computes, for every event, the
    * EARLIEST following purchase and error times (conditional min
    * over the [1 FOLLOWING, ∞) frame — both engines support the
    * identical frame), and the per-view match rule is then row-local
    * integer logic on epoch seconds: next purchase exists ∧ within
    * 7200 s ∧ ¬(next error ≤ it). Blocking rule is deliberately
    * conservative and total: an error sharing the purchase's second
    * blocks — deterministic on both engines with no sub-second
    * tie-break needed. Scale: ONE user-keyed exchange+sort shared by
    * both conditional mins; everything after is a partial-agg'd
    * per-user rollup on exact bp. */
  def ev51PatternNegation(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("s"))
      .withColumn("np", min(when(col("event_type") === "purchase", col("s"))).over(w))
      .withColumn("ne", min(when(col("event_type") === "error", col("s"))).over(w))
      .filter(col("event_type") === "view")
      .withColumn("m",
        when(col("np").isNotNull && col("np") - col("s") <= 7200L &&
          !(col("ne").isNotNull && col("ne") <= col("np")), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_views"), sum(col("m")).as("n_matches"))
      .withColumn("match_bp", expr("n_matches * 10000 div n_views"))
  }

  /** ev52: signup→purchase conversion curve — for each day offset
    * k ∈ [0, 7], the share of signed-up users whose FIRST purchase
    * after (or at) their first signup lands within k days, in exact
    * bp (the time-to-convert CDF; its complement is the retention
    * funnel's survival curve). One pass collapses events to per-user
    * (first signup, first purchase ≥ signup) — min-aggregates, no
    * window — then an 8-row broadcast offset spine counts
    * cumulatively; denominators stay the full signup cohort, so the
    * curve is monotone and ends at the overall conversion rate.
    * Calendar-bounded output; all integer arithmetic. */
  def ev52ConversionCurve(s: SparkSession, d: String): DataFrame = {
    val ev0 = ev(s, d)
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("ts_s"))
    val su = ev0.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("su"))
    // first purchase AT-or-AFTER the first signup: the signup time must
    // join in BEFORE the min, or a user with purchases on both sides of
    // signup would be scored by the pre-signup one and dropped
    val conv = ev0.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("ts_s") >= col("su"))
      .groupBy(col("user_id")).agg(min(col("ts_s") - col("su")).as("delta_s"))
    val cohort = su.join(conv, Seq("user_id"), "left_outer")
      .select(col("user_id"), expr("delta_s div 86400").as("off_days"))
    val spine = s.range(0, 8).select(col("id").as("k"))
    cohort.crossJoin(broadcast(spine))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("off_days").isNotNull && col("off_days") <= col("k"), 1L)
          .otherwise(0L)).as("n_converted"))
      .withColumn("conv_bp", expr("n_converted * 10000 div n_signups"))
  }

  /** ev53: seasonal-naive forecast backtest — the capacity-planning
    * baseline every on-call dashboard runs: predict each day's event
    * count as the integer mean of all PRIOR same-weekday days (the
    * causal trailing window — ev34's weekday median is a full-sample
    * diagnostic; this is an honest walk-forward forecast), and score
    * |actual − forecast| per day plus the deviation in bp. Days with
    * no same-weekday history (the first week) are excluded — a
    * forecast needs a past. The daily frame is calendar-bounded, so
    * the per-weekday ordered window costs nothing at any corpus
    * scale; the only corpus-sized work is the one groupBy(day) scan. */
  def ev53SeasonalNaive(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("weekday", dayofweek(col("day")))
    // calendar-bounded frame: one row per day — the trailing window and
    // its sort never touch the event table
    val wTrail = Window.partitionBy(col("weekday")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("hist_sum", sum(col("n_events")).over(wTrail))
      .withColumn("hist_n", count(lit(1)).over(wTrail))
      .filter(col("hist_n") >= 1)
      .withColumn("forecast", expr("hist_sum div hist_n"))
      .withColumn("abs_err", abs(col("n_events") - col("forecast")))
      .withColumn("err_bp", expr("abs_err * 10000 div forecast"))
      .select(col("day"), col("weekday"), col("n_events"),
        col("forecast"), col("abs_err"), col("err_bp"))
  }

  /** ev54: BOT / timer-traffic detection — flag users whose
    * inter-arrival pattern is too regular to be human (cron scrapers
    * and synthetic-load timers emit events on a fixed period; at crawl
    * scale they dominate raw volume, so the gate runs BEFORE
    * sessionization/feature ops to protect every per-user aggregate
    * downstream). Per-user gap histogram on the integer second grid
    * (ev33's proven cross-engine timestamp convention): gaps are
    * consecutive deltas in (ts, event_id) order; the MODAL gap (most
    * frequent delta, ties to the smallest) and its ppm share of all
    * gaps measure regularity, n_distinct_gaps measures repertoire.
    * is_bot when ≥ 20 events and (modal share ≥ 50% or ≤ 2 distinct
    * deltas) — a human's gaps never concentrate like that; a timer's
    * always do. Scale: one per-user-ordered window (the same shuffle
    * every session op pays), one (user, gap) partial agg whose frame
    * is bounded per user by that user's event count, and a per-user
    * top-1 window over DISTINCT deltas only — never the event table.
    * Flagged or not, every qualifying user's regularity row is graded
    * (the thresholds live in one place, the data decides). */
  def ev54BotDetect(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = ev(s, d)
      .withColumn("prev_t", lag(col("ts").cast("long"), 1).over(w))
      .filter(col("prev_t").isNotNull)
      .select(col("user_id"),
        (col("ts").cast("long") - col("prev_t")).as("gap_s"))
    val hist = gaps.groupBy(col("user_id"), col("gap_s"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hist.groupBy(col("user_id"))
      .agg(sum(col("cnt")).as("n_gaps"),
        count(lit(1)).as("n_distinct_gaps"))
    // per-user frame here is the DISTINCT-gap histogram, not events
    val wTop = Window.partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("gap_s"))
    val modal = hist.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("gap_s").as("modal_gap_s"),
        col("cnt").as("modal_cnt"))
    stats.join(modal, Seq("user_id"))
      .filter(col("n_gaps") >= 19) // ≥ 20 events
      .withColumn("modal_share_ppm",
        expr("modal_cnt * 1000000 div n_gaps"))
      .withColumn("is_bot",
        col("modal_share_ppm") >= 500000 || col("n_distinct_gaps") <= 2)
      .select(col("user_id"), (col("n_gaps") + 1).as("n_events"),
        col("n_distinct_gaps"), col("modal_gap_s"),
        col("modal_share_ppm"), col("is_bot"))
  }

  /** ev55: CHURN accounting by signup cohort — the retention board's
    * flip side (ev04 asks "who came back", this asks "who has gone
    * quiet"): a user is churned when their LAST event predates the
    * observed horizon (corpus max day) by more than 14 days —
    * recency-based churn, the definition that works without a
    * subscription table. Per signup cohort week (the corpus spans
    * weeks, not years — a month grid collapses to one row): users,
    * churned
    * users, churn share in exact bp, and the lower-median days-silent
    * (order statistic on the integer day grid, the ev34 discipline)
    * — read together, a rising churn_bp with a high
    * median silence means the cohort decayed long ago, not recently.
    * Scale: two per-user aggregates off one scan (first/last event),
    * the 1-row horizon broadcast via crossJoin, and a per-cohort
    * median over the DISTINCT silent-day values histogram — frames ∝
    * users then ∝ cohorts×days, never event-sized windows. */
  def ev55ChurnCohorts(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val horizon = e.agg(max(to_date(col("ts"))).as("h"))
    val users = e.groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).cast("date")
          .as("cohort_week"),
        max(to_date(col("ts"))).as("last_day"))
      .crossJoin(broadcast(horizon))
      .withColumn("days_silent", datediff(col("h"), col("last_day")))
      .withColumn("churned", col("days_silent") > 14)
    // per-cohort lower-median of days_silent via the value histogram
    // (frames ∝ cohorts × distinct silence values, never users)
    val hist = users.groupBy(col("cohort_week"), col("days_silent"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("days_silent"))))
    val tot = users.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"))
    val med = hist.join(tot, Seq("cohort_week"))
      .groupBy(col("cohort_week"))
      .agg(min(when(col("cum") * 2 >= col("n_users"), col("days_silent")))
        .as("median_days_silent"))
    tot.join(med, Seq("cohort_week"))
      .withColumn("churn_bp", expr("n_churned * 10000 div n_users"))
      .select(col("cohort_week"), col("n_users"), col("n_churned"),
        col("churn_bp"), col("median_days_silent").cast("long")
          .as("median_days_silent"))
  }

  /** ev56: BOT-GATED user features — wires ev54's detector into the
    * feature pipeline it exists to protect (the consumer-closure rule:
    * a detection tier nobody reads is a table, not a gate): ev12's
    * per-user feature rows minus every user ev54 flags as a bot, so
    * timer traffic never contaminates per-user training features or
    * the RFM tiers built on them. The bot list is ∝ flagged users —
    * small in practice but USER-scale in the worst case, so the
    * anti-join is left to AQE (both sides already hash-partition on
    * user_id, so the sort-merge fallback is exchange-free); ev12's
    * single-scan shape is otherwise untouched. The batch twin of
    * running st30's gate ahead of st14's feature stream. */
  def ev56GatedFeatures(s: SparkSession, d: String): DataFrame =
    ev12UserFeatures(s, d)
      .join(flaggedBots(s, d), Seq("user_id"), "left_anti")

  /** ev54's flagged user list (∝ bots — broadcastable by nature) —
    * the shared gate list ev56/ev57/pp42 consume, factored so every
    * gated consumer applies the IDENTICAL detection rule. The
    * detector output (|users| rows) is CacheScope'd: FOUR operators
    * (ev54 itself via plan identity, ev56, ev57, pp42) read it, so a
    * session running several pays the per-user gap histogram once. */
  private[graft] def flaggedBots(s: SparkSession, d: String): DataFrame =
    CacheScope.cached(ev54BotDetect(s, d))
      .filter(col("is_bot")).select(col("user_id"))

  /** The event stream with every flagged bot's traffic removed — the
    * gate run BEFORE aggregation, for consumers whose statistics are
    * population-relative (ev57's quartiles, the corpus horizon). The
    * bot list is ∝ flagged users and broadcasts into one anti-join;
    * the event scan shape is untouched. */
  private[graft] def gatedEvents(s: SparkSession, d: String): DataFrame =
    ev(s, d).join(broadcast(flaggedBots(s, d)), Seq("user_id"), "left_anti")

  /** ev57: BOT-GATED RFM tiers — ev54's detector wired in front of
    * ev17 (the round-7 verdict's remaining ungated consumer): a
    * 60 s-metronome scraper in the event stream otherwise lands in
    * the top frequency quartile AND drags every human's quartile
    * boundary. RFM is population-relative, so unlike ev56's output
    * anti-join the gate must remove the bot's events BEFORE the
    * per-user aggregate — recency's corpus horizon, the quartile
    * boundaries and every score recompute over the HUMAN population.
    * Oracle replays the detection chain and the gated ntile in SQL. */
  def ev57GatedRfm(s: SparkSession, d: String): DataFrame =
    rfmFrom(gatedEvents(s, d))

  /** ev58: SECOND-ORDER path transitions — P(next | prev2 → prev1)
    * over each user's (ts, event_id)-ordered stream. ev13/ev45's
    * first-order chain is blind to order-2 structure (view→view→
    * purchase vs signup→view→purchase condition on different
    * contexts), which is exactly what funnel and bot models key on.
    * TWO lags in the one window pass (no second shuffle — both lags
    * share the (user, ts) sort), context counts ∝ |event types|²,
    * conditional probability on the ppm integer grid (cnt·10⁶ div
    * context count — hash-exact), top-25 deterministic under
    * (cnt desc, prev2, prev1, next). */
  def ev58SecondOrderPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tri = ev(s, d)
      .withColumn("prev1", lag(col("event_type"), 1).over(w))
      .withColumn("prev2", lag(col("event_type"), 2).over(w))
      .filter(col("prev2").isNotNull)
    val ctx = tri.groupBy(col("prev2"), col("prev1"))
      .agg(count(lit(1)).as("ctx_n"))
    tri.groupBy(col("prev2"), col("prev1"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(ctx, Seq("prev2", "prev1"))
      .withColumn("cond_ppm", expr("cnt * 1000000 div ctx_n"))
      .orderBy(col("cnt").desc, col("prev2"), col("prev1"), col("next_type"))
      .limit(25)
  }

  /** ev59: ROBUST anomaly days — median/MAD instead of ev25's trailing
    * mean: a launch-week traffic step or a single 100× spike day
    * poisons a mean-based detector's own baseline (the spike inflates
    * the mean that judges the next week), while the median and the
    * median-absolute-deviation ignore up to half the days being wild.
    * Flag = |n − median| > 3·MAD, compared as integers scaled ×1
    * (daily counts are integers, percentile_disc is an exact order
    * statistic, so med/MAD/deviation are all integer-exact — no float
    * in the hash). Degenerate corpus guard: MAD = 0 (over half the
    * days identical) flags any deviation, which is the strictest
    * consistent reading of the rule. Scale: two aggregates over the
    * day-count frame (one row per day — tiny at any corpus size); the
    * global median is a 1-row broadcast. */
  def ev59MadAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = CacheScope.cached(ev(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n")))
    val med = daily.agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT)")
        .as("med"))
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("adev", abs(col("n") - col("med")))
    val mad = dev.agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT)")
        .as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("n"), col("med"), col("mad"),
        col("adev").as("deviation"),
        (col("adev") > col("mad") * 3).as("is_anomaly"))
  }

  /** ev60: CUPED experiment readout — variance-reduced A/B metrics
    * (Deng, Xu, Kohavi & Walker, WSDM 2013: adjust each unit's
    * post-period metric by its PRE-period metric, Y' = Y − θ(X − X̄),
    * which strips the covariate variance θ²·var(X) without biasing
    * the arm contrast because assignment is independent of X). The
    * missing piece of the events family: funnels/retention/attribution
    * READ behavior, this op GRADES an intervention on it. Deterministic
    * surrogate assignment arm = user_id % 2 and a calendar split
    * (first half of the corpus day-span = pre, rest = post) keep the
    * whole readout engine-replayable. All arithmetic is exact int64 on
    * the bp grid: θ comes from the pooled sufficient statistics
    * (n·Sxy − Sx·Sy) / (n·Sxx − Sx²) — q59's discipline — with every
    * possibly-negative division spelled truncate-toward-zero in BOTH
    * engines (ss15's sign-explicit CASE). Scale: one pass over events
    * into a per-user frame (one shuffle on user_id), then two
    * broadcast scalars; nothing downstream is ever corpus-sized. The
    * raw sufficient stats hold to ~10⁹ users at these magnitudes
    * (n·Sxy ≲ 10¹⁴ ≪ 2⁶³); past that a production run would center
    * x,y by a first-pass mean before the quadratic sums — the plan
    * shape (per-user agg + broadcast scalars) is unchanged. */
  def ev60Cuped(s: SparkSession, d: String): DataFrame = {
    val perUser = expPerUser(s, d)
    val theta = perUser
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"), col("sx"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        greatest(lit(1L),
          col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .select(col("n"), col("sx"), expr(
        "CASE WHEN num >= 0 THEN (num * 10000) div den" +
          " ELSE -(((-num) * 10000) div den) END").as("theta_bp"))
    perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sum_pre"), sum(col("y")).as("sum_post"))
      .crossJoin(broadcast(theta))
      .withColumn("mean_post_bp", expr("sum_post * 10000 div n_users"))
      .withColumn("dx_bp", expr(
        "sum_pre * 10000 div n_users - sx * 10000 div n"))
      .withColumn("corr", col("theta_bp") * col("dx_bp"))
      .select(col("arm"), col("n_users"), col("sum_pre"), col("sum_post"),
        col("mean_post_bp"), col("theta_bp"),
        (col("mean_post_bp") - expr(
          "CASE WHEN corr >= 0 THEN corr div 10000" +
            " ELSE -((-corr) div 10000) END")).as("mean_adj_bp"))
  }

  /** The experiment-readout substrate shared by ev60/ev62: one pass
    * over events into per-user (pre-count x, post-count y, arm) under
    * the deterministic calendar split (first half of the corpus
    * day-span = pre) and surrogate assignment arm = user_id % 2 — one
    * shuffle on user_id, cached because both readouts and their
    * pooled scalars re-scan it. */
  private def expPerUser(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val span = e.agg(
      min(to_date(col("ts"))).as("d0"),
      max(to_date(col("ts"))).as("d1"))
    CacheScope.cached(e.crossJoin(broadcast(span))
      .withColumn("pre",
        (datediff(to_date(col("ts")), col("d0")) * 2 <
          datediff(col("d1"), col("d0"))).cast("long"))
      .groupBy(col("user_id"))
      .agg(sum(col("pre")).as("x"),
        sum(lit(1L) - col("pre")).as("y"))
      .withColumn("arm", col("user_id") % 2))
  }

  /** ev61: sample-ratio-mismatch (SRM) check — the first gate every
    * experimentation platform runs before reading ANY metric: with
    * arm = user_id % 2 the two arms should split users ~50/50, and a
    * skewed split means the assignment (or the logging) is broken and
    * every downstream readout (ev60/ev62) is invalid. One chi-square
    * cell pair collapses to stat = (n₀−n₁)²/n (df=1); graded on the
    * exact milli grid (×1000 integer floor — dividend is a square, so
    * no sign case needed) with the standard p<0.05 cut 3.841 → 3841.
    * Emitted per event_type (a per-type skew catches conditional
    * logging loss — e.g. one arm's client dropping purchase events —
    * that the overall row hides) plus the `_overall` assignment row.
    * Scale: one distinct over (type, user) — a shuffle bounded by
    * |types|·|users|, nothing corpus-sized downstream. */
  def ev61SrmCheck(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    // a (hypothetical) real type named '_overall' is excluded on BOTH
    // engines: Spark's union keeps cross-branch duplicates while SQL
    // UNION drops them, so without the guard the two engines would
    // disagree exactly on that degenerate input
    val byType = e.select(col("event_type"), col("user_id"))
      .filter(col("event_type") =!= "_overall").distinct()
    val overall = e.select(lit("_overall").as("event_type"),
      col("user_id")).distinct()
    byType.unionByName(overall)
      .withColumn("arm", col("user_id") % 2)
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
      .withColumn("stat_milli", expr(
        "(n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000" +
          " div greatest(1L, n_arm0 + n_arm1)"))
      .withColumn("srm_flag", col("stat_milli") > 3841L)
  }

  /** ev62: difference-in-differences readout — the second classic
    * causal contrast on ev60's substrate: each arm's post-minus-pre
    * mean change, and the between-arm difference of those changes
    * (did_bp). Where ev60 shrinks variance under randomized
    * assignment, DiD is the readout you trust when assignment is NOT
    * randomized (a rollout by region/cohort): the pre-period delta
    * absorbs any fixed between-group level difference. Same exact
    * int64 bp grid; the only subtractions happen AFTER the
    * non-negative floor divisions, so no sign-case spelling is needed
    * anywhere. Scale: ev60's cached per-user frame + one 2-row agg. */
  def ev62DiffInDiff(s: SparkSession, d: String): DataFrame = {
    val arms = expPerUser(s, d)
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sum_pre"), sum(col("y")).as("sum_post"))
      .withColumn("mean_pre_bp", expr("sum_pre * 10000 div n_users"))
      .withColumn("mean_post_bp", expr("sum_post * 10000 div n_users"))
      .withColumn("delta_bp", col("mean_post_bp") - col("mean_pre_bp"))
    val did = arms.agg(sum(
      when(col("arm") === 1, col("delta_bp"))
        .otherwise(-col("delta_bp"))).as("did_bp"))
    arms.crossJoin(broadcast(did))
  }
}
