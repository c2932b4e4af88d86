package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming jobs (SURVEY.md §2 st01/st02). Each takes the
  * input DataFrame/Dataset rather than a path so the same logic runs
  * against `readStream` sources in production, `MemoryStream` in specs,
  * and the batch `events` table for backfill — the Kappa-architecture
  * property Structured Streaming gives for free.
  */
object StreamingJobs {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Int)

  /** st01: tumbling 1-hour event-time aggregation with a 1-hour
    * watermark. Late events beyond the watermark are dropped; state is
    * bounded by (watermark horizon × groups). Identical logic to batch
    * ev01. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** st05: micro-batch parquet SINK — each batch appends to `dir` via
    * `foreachBatch` (the escape hatch for sinks Structured Streaming
    * lacks natively; here it also enables per-batch atomicity
    * options). `audited = true` writes each batch to its own
    * `dir/batch-<id>` through the DSv2 `graft-manifest` two-phase
    * sink in OVERWRITE mode — st13's landing-zone layout: a replayed
    * batch (crash between sink commit and checkpoint advance,
    * foreachBatch's at-least-once window) re-publishes the SAME dir
    * instead of appending twice, making delivery effectively-once;
    * the per-dir `_MANIFEST.json` is the reconciliation record.
    * `audited = false` is the plain st05 shape — parquet append to
    * one dir; a replay appends twice there (dedupe downstream on a
    * key, st03's job). Lifted from the round-8 spec-inline capability
    * into the library API (VERDICT r8 #4). */
  def parquetBatchSink(stream: DataFrame, dir: String,
      audited: Boolean = false, checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (audited)
          batch.write.format("graft-manifest")
            .option("path", s"$dir/batch-$id").mode("overwrite").save()
        else batch.write.mode("append").parquet(dir)
      }
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** st04: stream-stream interval join — purchases matched to same-user
    * views at most 30 minutes older. Both sides are watermarked so
    * Spark can bound the join state (views older than the watermark +
    * interval are evicted); the time-bound predicate is what makes the
    * state finite — an unbounded stream-stream join never GCs. */
  def purchaseAttribution(events: DataFrame): DataFrame =
    attributionJoin(events, "inner")

  /** st15: the LEFT OUTER form of st04 — purchases with NO qualifying
    * view are also emitted (v_id null), i.e. attribution including
    * organic purchases. Outer emission is watermark-driven: the null
    * row for a purchase appears only once the watermark proves no
    * in-window view can still arrive, which is the same bound that
    * lets the state store evict it — completeness and bounded state
    * come from the one mechanism. */
  def purchaseAttributionOuter(events: DataFrame): DataFrame =
    attributionJoin(events, "left_outer")

  private def attributionJoin(events: DataFrame, joinType: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") < col("p_ts"),
      joinType)
      .select(col("p_id"), col("p_user"), col("p_ts"), col("v_id"), col("v_ts"))
  }

  /** st06: streaming upsert — a continuously-maintained latest-record
    * view per (user, type) key, the streaming twin of batch ev11.
    * Declarative max_by keeps O(1) state per key (one champion row);
    * emitted in Update mode so each micro-batch only re-emits keys it
    * touched. The Kappa property: identical semantics replayed batch
    * or streamed. */
  def latestPerKey(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("value")),
        struct(col("ts"), col("event_id"))).as("latest"))
      .select(col("user_id"), col("event_type"),
        col("latest.event_id").as("latest_event_id"),
        col("latest.ts").as("latest_ts"),
        col("latest.value").as("latest_value"))

  /** st07: stream–static enrichment join — the streaming fact joined
    * to a batch dimension (re-read per micro-batch, so slowly-changing
    * dims stay fresh). Stateless: no watermark or join state needed on
    * the static side; Spark broadcasts the dim into each batch. */
  def enrichedCounts(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))

  /** st08: streaming quantiles through graft's own KLL sketch — the
    * custom TypedImperativeAggregate serializes its compactor stack
    * into the streaming state store like any built-in agg, so a
    * continuously-updated p50/p90 per event type costs O(k·levels)
    * state per group instead of retaining the stream. */
  def streamingQuantiles(events: DataFrame): DataFrame = {
    val valueAttr = events.queryExecution.analyzed.output
      .find(_.name == "value").get
    val kll = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.KllQuantileAgg(valueAttr, Seq(0.5, 0.9))
        .toAggregateExpression())
    events.groupBy(col("event_type"))
      .agg(kll.as("qs"), count(lit(1)).as("n"))
      .select(col("event_type"),
        col("qs").getItem(0).as("p50"), col("qs").getItem(1).as("p90"), col("n"))
  }

  /** st09: file-source END-TO-END pipeline — the production wiring the
    * MemoryStream specs abstract away: a JSONL drop directory consumed
    * incrementally by `readStream` (EXPLICIT schema — never infer on a
    * stream: inference reads data twice and can flip types between
    * runs), the st01 tumbling aggregation reused unchanged (the Kappa
    * property), and an append-mode parquet sink with checkpointed
    * source offsets + sink manifest — re-runs resume from the
    * checkpoint, so each input file is aggregated exactly once across
    * restarts. `Trigger.AvailableNow` drains everything present and
    * stops: the incremental-batch deployment mode (a nightly catch-up
    * run and a 24/7 stream share this one code path). Windows close
    * via the watermark; no-data micro-batches flush closed windows
    * before the trigger stops. */
  def fileSourcePipeline(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(inDir)
    tumblingCounts(in)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** st13: AUDITED streaming publish — every micro-batch lands
    * through the graft-manifest two-phase sink into its own
    * `batch-<id>/` directory with a counts manifest. The batchId-keyed
    * directory is what makes the publish exactly-once across
    * restarts: Structured Streaming replays an unacknowledged batch
    * with the SAME id, and the sink's truncate-mode write makes the
    * replay overwrite its own directory instead of appending a
    * duplicate. Downstream consumers admit a batch directory only
    * once `_MANIFEST.json` exists (the sink writes it last, after the
    * atomic file publishes), so a crash mid-batch is invisible. */
  def auditedPublish(events: DataFrame, outDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.format("graft-manifest")
          .option("path", s"$outDir/batch-$id")
          .mode("overwrite").save()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .start()

  /** st10: streaming per-group top-k — the TopKPairAggregator (the
    * batch ANN selection path) running over the streaming state store:
    * a continuously-maintained "top 3 largest purchases per user"
    * view. State per key is the aggregator's O(k) pair buffer,
    * serialized through the same Encoder the batch path uses — one
    * aggregator, batch and streaming (the Kappa property for custom
    * aggregates). Update mode re-emits only touched keys. */
  def streamingTopK(events: DataFrame): DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKPairAggregator(3))
    events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(topk((col("value") * 100).cast("long").cast("double"),
        col("event_id")).as("top"))
      .select(col("user_id"), expr("transform(top, p -> p._2)").as("top_event_ids"),
        expr("transform(top, p -> CAST(p._1 AS BIGINT))").as("top_values_c"))
  }

  /** st11: streaming approximate-distinct users per event type — the
    * Datasketches HLL aggregate holding its ~KB sketch in the
    * streaming state store, the streaming twin of the sk07 batch
    * rollup: distinct-user counts update incrementally per
    * micro-batch without retaining user ids, and the same sketch
    * column could be persisted and later merged with batch sketches
    * (one sketch format across both planes). Update mode re-emits
    * only touched types. */
  def streamingDistinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).as("est_users"), col("n_events"))

  /** st12: built-in `session_window` sessionization — the declarative
    * twin of st02's flatMapGroupsWithState: Spark's native session
    * windows merge on the 30-minute gap inside the state store, emit
    * on watermark close, and need zero custom state code. Keep both:
    * session_window when the rollup is an aggregate, the custom state
    * path when per-session logic doesn't fit an agg. Same gap, so the
    * spec can assert the session starts/counts line up with st02. */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))

  /** st02: stateful gap sessionization (30-minute inactivity) with
    * explicit per-key state via flatMapGroupsWithState. State per user
    * is O(1) — just the open session bounds — and is emitted+cleared
    * when a gap is observed in-batch or the event-time timeout fires
    * (watermark-driven, so state is bounded and the query quiesces when
    * the source is drained). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[Session]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.iterator
        state.remove()
        out
      } else {
        var closed = List.empty[Session]
        var cur = state.getOption
        batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
          cur match {
            case Some(sess) if e.ts.getTime - sess.session_end.getTime <= gapMs =>
              cur = Some(sess.copy(session_end = e.ts, n_events = sess.n_events + 1))
            case Some(sess) =>
              closed ::= sess
              cur = Some(Session(userId, e.ts, e.ts, 1))
            case None =>
              cur = Some(Session(userId, e.ts, e.ts, 1))
          }
        }
        cur.foreach { sess =>
          state.update(sess)
          state.setTimeoutTimestamp(
            math.max(sess.session_end.getTime + gapMs,
              state.getCurrentWatermarkMs() + 1))
        }
        closed.reverseIterator
      }
    }

    events.withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class DiversityRow(user_id: Long, n_events: Long, n_types: Long,
    simpson_bp: Long)

  /** st18: streaming per-user behavioral diversity — ev50's Simpson
    * concentration maintained continuously in the state store via
    * mapGroupsWithState: state per user is the O(|types|) type→count
    * map (bounded by the event-type vocabulary, not the stream), and
    * each micro-batch re-emits the user's updated (n_events, n_types,
    * simpson_bp) row in Update mode — the LIVE bot/scripted-account
    * view of the batch operator, one exact-integer formula across both
    * planes (the Kappa property; the spec asserts the streaming result
    * equals ev50 run in batch over the same events). No timeout: the
    * profile is cumulative over the stream's lifetime. */
  def streamingDiversity(events: Dataset[Event]): Dataset[DiversityRow] = {
    import events.sparkSession.implicits._
    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[Map[String, Long]]): DiversityRow = {
      val m0 = state.getOption.getOrElse(Map.empty[String, Long])
      val m = batch.foldLeft(m0) { (acc, e) =>
        acc + (e.event_type -> (acc.getOrElse(e.event_type, 0L) + 1L))
      }
      state.update(m)
      val n = m.values.sum
      val pairSum = m.values.map(c => c * (c - 1)).sum
      DiversityRow(userId, n, m.size.toLong,
        if (n < 2) 0L else pairSum * 10000L / (n * (n - 1)))
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** st14: streaming ingest decontamination — pp07's semantics at
    * ingest time. The (tiny) eval-set 15-token window index collapses
    * to ONE static row of hashes; each incoming doc computes its own
    * window-hash array per row and drops itself on any overlap — a
    * stateless stream-static broadcast join, no watermark, no state
    * store, no per-window explode on the stream side. At 100 TB/day
    * of ingest the per-doc cost is linear in the doc and the eval
    * index rides the broadcast, exactly like the batch pp07. Docs
    * shorter than the window can never overlap and pass through. */
  /** st19: streaming BPE encode — tx46 at ingest time. The tx45-learned
    * merge chain is a 10-row STATIC frame, collected once at plan-build
    * (the broadcast-index pattern) and baked into a per-row expression:
    * wrap each of the doc's first 8 tokens as `<c><c>…`, apply the 10
    * replaces in rank order, split back to pieces — all inside one
    * projection, so the stream side is STATELESS (no watermark, no
    * state store, no shuffle; this per-row form is also the
    * zero-shuffle twin of tx46's explode+groupBy reassembly). The spec
    * asserts streaming ≡ batch tx46 on the same documents (the Kappa
    * property: one tokenizer across both planes — a training corpus
    * and its ingest stream can never disagree on segmentation). */
  def streamingBpeEncode(docs: DataFrame, merges: DataFrame): DataFrame = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val chain = merges.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val wrap =
      "concat_ws('', transform(sequence(1, length(w)), j -> concat('<', substring(w, j, 1), '>')))"
    val encW = chain.foldLeft(wrap) { case (acc, (_, pa, pb)) =>
      s"replace($acc, '<${esc(pa)}><${esc(pb)}>', '<${esc(pa)}${esc(pb)}>')"
    }
    docs
      .withColumn("encs", expr(
        s"transform(filter(slice(split(trim(text), ' '), 1, 8), w -> length(w) >= 1), w -> $encW)"))
      .select(col("doc_id"),
        expr("""aggregate(encs, 0L, (acc, e) ->
               |  acc + size(split(substring(e, 2, length(e) - 2), '><')))"""
          .stripMargin).as("n_pieces"),
        expr("""array_join(transform(encs, e ->
               |  array_join(split(substring(e, 2, length(e) - 2), '><'), ',')), ',')"""
          .stripMargin).as("pieces"))
  }

  def streamDecontam(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val W = 15
    def winCol = expr(
      s"""CASE WHEN size(tk) >= $W THEN
         |  array_distinct(transform(sequence(1, size(tk) - $W + 1),
         |    i -> md5(cast(array_join(slice(tk, i, $W), ' ') as binary))))
         |ELSE array() END""".stripMargin)
    val evalIdx = evalDocs
      .withColumn("tk", split(trim(col("text")), " "))
      .select(explode(winCol).as("wh"))
      .agg(collect_set(col("wh")).as("eval_wins"))
    docs
      .withColumn("tk", split(trim(col("text")), " "))
      .withColumn("wins", winCol)
      .crossJoin(broadcast(evalIdx))
      .filter(!arrays_overlap(col("wins"), col("eval_wins")))
      .select(col("doc_id"), col("text"))
  }

  /** st16: the st02 sessionizer on Spark 4's transformWithState state
    * API v2 — same 30-minute-gap semantics, third implementation of the
    * one contract (st02 flatMapGroupsWithState, st12 session_window;
    * the spec asserts all agree). What v2 buys at scale: NAMED state
    * slots (schema'd per-slot in the RocksDB store, evolvable
    * independently), explicit event-time TIMERS (many per key if
    * needed; v1 allowed one timeout, set-only), and TTL support — the
    * API the old GroupState path can't express. Session close is
    * timer-driven: each update re-registers the key's gap timer
    * (delete-then-register, tracked in its own ValueState slot) and
    * the expired-timer callback emits + clears. Requires the RocksDB
    * state store provider. */
  class SessionProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders, streaming}
    private val gapMs = 30L * 60 * 1000
    @transient private var cur: ValueState[Session] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cur = getHandle.getValueState[Session]("session",
        Encoders.product[Session], TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("gap_timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Session] = {
      var closed = List.empty[Session]
      var c = if (cur.exists()) Some(cur.get()) else None
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        c match {
          case Some(sess) if e.ts.getTime - sess.session_end.getTime <= gapMs =>
            c = Some(sess.copy(session_end = e.ts, n_events = sess.n_events + 1))
          case Some(sess) =>
            closed ::= sess
            c = Some(Session(key, e.ts, e.ts, 1))
          case None =>
            c = Some(Session(key, e.ts, e.ts, 1))
        }
      }
      c.foreach { sess =>
        cur.update(sess)
        // one live gap timer per key: delete the stale one, register at
        // the new session end + gap (clamped past the watermark so an
        // already-passed horizon still fires, the st02 clamp)
        if (timer.exists()) getHandle.deleteTimer(timer.get())
        val at = math.max(sess.session_end.getTime + gapMs,
          tv.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(at)
        timer.update(at)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      val out = if (cur.exists()) Iterator.single(cur.get()) else Iterator.empty
      cur.clear(); timer.clear()
      out
    }
  }

  def sessionizeV2(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  case class DocIn(doc_id: Long, source: String, n_tok: Long)
  case class PackedDoc(doc_id: Long, source: String, bin_id: Long,
    n_tok: Long)

  /** st17: pp22's sequence packing at ingest time — each source keeps
    * ONE long of keyed state (its running token cursor); an arriving
    * doc is assigned the 512-token bin where it starts (cursor div
    * budget, concatenate-and-slice semantics) and advances the cursor.
    * The stream's arrival order stands in for pp22's md5 shuffle;
    * within a micro-batch docs apply in doc_id order so replays are
    * deterministic. The batch twin re-derives bins from a prefix-sum
    * window; here the cursor IS the prefix sum, carried across
    * micro-batches — a dataloader can consume sealed bins (every bin
    * id below the cursor's bin is final) without waiting for the
    * epoch to end. Append mode: each doc's assignment is emitted
    * exactly once. */
  def streamingPacking(docs: Dataset[DocIn]): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    val B = 512L
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source, rows, state: GroupState[Long]) =>
          var cursor = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val bin = cursor / B
            cursor += d.n_tok
            PackedDoc(d.doc_id, source, bin, d.n_tok)
          }
          state.update(cursor)
          out.iterator
      }
  }

  /** st22: streaming MATERIALIZED-VIEW maintenance — the refresh side
    * of q65's SummaryRewrite, live: arriving lineitem rows fold into
    * the (l_returnflag, l_linestatus, ship_month) summary as a
    * Complete-mode streaming aggregation (state = one row per group —
    * ~36 rows, bounded by the dimension grid, not traffic), and each
    * micro-batch publishes the WHOLE summary atomically
    * (write-temp-then-swap inside foreachBatch, so a reader routed by
    * SummaryRewrite never sees a half-written MV). This closes the MV
    * loop: the stream owns freshness, the optimizer rule owns routing,
    * and a dashboard aggregate over the raw fact table reads
    * micro-batch-fresh pre-aggregates without knowing either exists.
    * At 100 TB the same shape holds because the published artifact is
    * the GROUP GRID, never the fact stream. */
  def streamingSummaryMaintenance(lineitems: DataFrame, mvDir: String,
      checkpointDir: String, sourcePath: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    lineitems
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        month(col("l_shipdate")).as("ship_month"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val tmp = s"$mvDir.tmp-$id"
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        // the MV→table binding SummaryRewrite demands (fail-closed):
        // written into the tmp dir BEFORE the swap, so every published
        // generation carries its `_MV_SOURCE` sidecar atomically
        sourcePath.foreach { src =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "_MV_SOURCE"),
            src.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        }
        val fs = new java.io.File(mvDir)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(fs)
        if (!new java.io.File(tmp).renameTo(fs))
          throw new java.io.IOException(s"MV swap failed for batch $id")
      }
      .start()

  case class ChunkEvent(blob_id: Long, chunk_md5: String, chunk_len: Long,
    is_new: Boolean)

  /** st21: streaming CAS ingest — mm10/mm12's content-addressed-store
    * arithmetic live at the ingest edge: every arriving blob is
    * content-defined-chunked (the codegen'd `cdc_boundaries`, so a
    * prefix edit shifts boundaries, not every chunk), and each chunk
    * hash consults ONE boolean of keyed state — "has the store seen
    * this content?" — to be flagged new (store it) or known
    * (reference it). That flag stream IS the live dedup-savings
    * counter: bytes where is_new=false are writes the CAS never makes.
    * State is one flag per DISTINCT chunk — bounded by unique content,
    * not traffic (the property that makes a CAS metadata store
    * feasible at 100 TB); within a batch, occurrences apply in
    * blob_id order so replays are deterministic. Append mode: one
    * audit row per (blob, chunk occurrence). The per-blob/per-store
    * rollup stays OUT of the streaming query (the st20 discipline) —
    * the chunk-grain audit is what lands. */
  def streamingCasIngest(blobs: DataFrame): Dataset[ChunkEvent] = {
    import blobs.sparkSession.implicits._
    val chunks = blobs
      .withColumn("tx", trim(col("text")))
      .withColumn("bnds", org.apache.spark.sql.graft.GraftDataset.column(
        graft.functions.CdcBoundaries(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("tx"))))
      .withColumn("starts",
        expr("concat(array(1), transform(bnds, b -> b + 1))"))
      .withColumn("ends", expr("concat(bnds, array(length(tx)))"))
      .withColumn("chunks", expr(
        """filter(zip_with(starts, ends,
          |  (s, e) -> substring(tx, s, e - s + 1)), c -> length(c) > 0)"""
          .stripMargin))
      .select(col("blob_id"), explode(col("chunks")).as("chunk"))
      .select(col("blob_id"),
        md5(col("chunk").cast("binary")).as("chunk_md5"),
        length(col("chunk")).cast("long").as("chunk_len"))
      .as[(Long, String, Long)]
    chunks.groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, ChunkEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h, rows, state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(_._1).map { case (b, _, len) =>
            val isNew = !seen
            seen = true
            ChunkEvent(b, h, len, isNew)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Per-row signal bundle feeding st20's keyed dedup state (public:
    * the codegen'd deserializer must construct it). */
  case class DocSig(doc_id: Long, lang: String, contam: Boolean,
    lowq: Boolean, th: String)
  case class DocDisposition(doc_id: Long, lang: String, reason: String)

  /** st20: pp11's drop-reason funnel at ingest time — every arriving
    * document is assigned its final disposition as it lands, in
    * pp11's audit-priority order (contaminated > duplicate >
    * low_quality > kept). The two row-local signals reuse the batch
    * formulas verbatim: st14's 15-token window overlap against the
    * broadcast eval index (contamination) and tx02's lexical score
    * < 0.5 (quality). The DUPLICATE reason is the genuinely streaming
    * part: one boolean of keyed state per normalized-text hash —
    * first occurrence establishes the text, every later arrival (same
    * micro-batch or weeks later) is flagged `duplicate`, which is
    * exactly the keep-FIRST rule a streaming pipeline can enforce
    * (batch keep-best needs the whole corpus; ingest keeps the
    * earliest and lets pp20 refresh later). State is one flag per
    * DISTINCT text — bounded by content, not traffic. Append mode:
    * each doc's disposition emits exactly once; the (lang, reason)
    * rollup is one groupBy over the sink, kept OUT of the streaming
    * query so the per-doc audit trail (pp11's missing half) is what
    * lands. */
  def streamingDropReasons(docs: DataFrame, evalDocs: DataFrame): Dataset[DocDisposition] = {
    import docs.sparkSession.implicits._
    val W = 15
    def winCol = expr(
      s"""CASE WHEN size(tk) >= $W THEN
         |  array_distinct(transform(sequence(1, size(tk) - $W + 1),
         |    i -> md5(cast(array_join(slice(tk, i, $W), ' ') as binary))))
         |ELSE array() END""".stripMargin)
    val evalIdx = evalDocs
      .withColumn("tk", split(trim(col("text")), " "))
      .select(explode(winCol).as("wh"))
      .agg(collect_set(col("wh")).as("eval_wins"))
    val stopArr = array(graft.ops.Text.stopwords.map(lit): _*)
    docs
      .withColumn("tk", split(trim(col("text")), " "))
      .withColumn("wins", winCol)
      .crossJoin(broadcast(evalIdx))
      .select(
        col("doc_id"), col("lang"),
        arrays_overlap(col("wins"), col("eval_wins")).as("contam"),
        (round(size(filter(col("tk"), t => array_contains(stopArr, t))) * 0.5
            / size(col("tk")) +
          when(size(col("tk")).between(5, 200), 0.5).otherwise(0.0), 4)
          < 0.5).as("lowq"),
        md5(lower(trim(col("text")))).cast("string").as("th"))
      .as[DocSig]
      .groupByKey(_.th)
      .flatMapGroupsWithState[Boolean, DocDisposition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val dup = seen
            seen = true
            val reason =
              if (r.contam) "contaminated"
              else if (dup) "duplicate"
              else if (r.lowq) "low_quality"
              else "kept"
            DocDisposition(r.doc_id, r.lang, reason)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** st23: streaming ANN-index maintenance — ss17's fold-in running
    * live. Each arriving vector (already on the SQ12 integer grid) is
    * assigned to its nearest FIXED centroid: the standing quantizer is
    * a tiny static frame collapsed to ONE broadcast row of structs,
    * so assignment is a per-row `array_min` over |cells| lexicographic
    * (d2, cell) structs — no shuffle, and crucially no SECOND stateful
    * operator in the streaming plan (a groupBy-argmin would be one).
    * The per-cell index state (cnt, vsum) then folds in through
    * LongVecSumAgg running over the streaming state store —
    * O(|cells|·dim) longs of state TOTAL, bounded by the index size,
    * never by traffic. Complete mode re-publishes the whole (tiny)
    * stats table per micro-batch — st22's MV publish discipline; a
    * downstream ss17-style drift check reads it to decide
    * keep-absorbing vs retrain. Int64-exact and order-independent, so
    * streaming ≡ batch fold (spec-asserted). */
  def streamingIndexStats(vecs: DataFrame, cents: DataFrame,
      dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val centRow = cents.agg(
      collect_list(struct(col("cell"), col("cent"))).as("cs"))
    val assigned = vecs
      .crossJoin(broadcast(centRow))
      .withColumn("best", expr(
        """array_min(transform(cs, c -> struct(
          |  long_dot(x, x) - 2 * long_dot(x, c.cent)
          |    + long_dot(c.cent, c.cent) AS d2,
          |  c.cell AS cell)))""".stripMargin))
      .select(col("vec_id"), col("best.cell").as("cell"), col("x"))
    val xAttr = assigned.queryExecution.analyzed.output.find(_.name == "x").get
    val vecSum = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.LongVecSumAgg(xAttr, dim).toAggregateExpression())
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), vecSum.as("vsum"))
  }

  /** st24: streaming FUZZY decontamination — pp27's containment rule
    * at ingest, the paraphrase-robust tier above st14's verbatim
    * windows. The eval suite collapses at plan-build to ONE broadcast
    * row of (eval_id, shingle-set) structs (∝ benchmark suite, tiny);
    * each arriving doc computes its max per-eval-doc containment —
    * |doc ∩ eval| ⁄ |eval| in exact bp via array_intersect inside a
    * per-row transform — entirely row-locally: STATELESS (no
    * watermark, state store, or shuffle — st14's collapsed-broadcast
    * pattern carried up a tier), Append mode, one audit row per doc.
    * Same ≥30% floor as pp27, so batch and stream route identically. */
  def streamFuzzyDecontam(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    def shCol = expr(
      """CASE WHEN size(tk) >= 3 THEN
        |  array_distinct(transform(sequence(1, size(tk) - 2),
        |    i -> concat(element_at(tk,i), ' ', element_at(tk,i+1), ' ',
        |                element_at(tk,i+2))))
        |ELSE array() END""".stripMargin)
    val evalIdx = evalDocs
      .withColumn("tk", split(trim(col("text")), " "))
      .select(col("doc_id").as("eval_id"), shCol.as("sh"))
      .filter(size(col("sh")) > 0)
      .agg(collect_list(struct(col("eval_id"), col("sh"))).as("evals"))
    docs
      .withColumn("tk", split(trim(col("text")), " "))
      .withColumn("sh", shCol)
      .crossJoin(broadcast(evalIdx))
      .withColumn("max_contain_bp", coalesce(expr(
        """array_max(transform(evals, e ->
          |  size(array_intersect(sh, e.sh)) * 10000 div size(e.sh)))"""
          .stripMargin).cast("long"), lit(0L)))
      .select(col("doc_id"),
        col("max_contain_bp"),
        (col("max_contain_bp") >= 3000L).as("contaminated"))
  }

  case class PartPoint(p_partkey: Long, p_size: Long, price_c: Long)
  case class FrontierRow(version: Long, p_partkey: Long, p_size: Long,
    price_c: Long)

  /** st25: streaming SKYLINE maintenance — q67's Pareto frontier kept
    * live as new parts arrive (the "best tradeoffs right now" board a
    * pricing service polls). State is the frontier ITSELF, not the
    * stream: by the 2-D dominance structure at most one point per
    * distinct price survives, so state is bounded by the price domain
    * regardless of how many parts ever flowed. Each arriving point is
    * admitted iff no frontier point dominates it; admission evicts
    * everything it dominates (ties on both axes co-survive, q67's
    * rule). Emits the full frontier snapshot per changed batch with a
    * monotone version — readers take max(version) (Append mode can't
    * retract evicted rows; a versioned snapshot of a bounded set is
    * the retraction-free encoding). The constant grouping key funnels
    * only batch rows, not history; at warehouse rates the stateless
    * pre-step is a per-partition local skyline (mapPartitions) so the
    * funnel carries ≤ |frontier| rows per partition — the admission
    * loop itself is O(|batch|·|frontier|). */
  case class DailyCount(day: java.sql.Date, weekday: Int, n_events: Long)
  case class ForecastRow(day: java.sql.Date, weekday: Int, n_events: Long,
    forecast: Long, abs_err: Long)

  /** st26: ev53's seasonal-naive backtest live — the on-call forecast
    * board updating as each day's count closes. State per weekday is
    * the sufficient statistic of the trailing mean: (sum, n) — two
    * longs per weekday, SEVEN keys total, regardless of how many years
    * flow. Each arriving day is first scored against the state
    * (forecast = sum div n — the strictly-prior causal window, exactly
    * ev53's rule) and then folded in; days within a micro-batch apply
    * in day order so a catch-up batch replays the walk-forward
    * sequence deterministically. First-ever day per weekday emits
    * nothing (a forecast needs a past), matching the batch exclusion. */
  def streamingForecast(days: Dataset[DailyCount]): Dataset[ForecastRow] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.weekday)
      .flatMapGroupsWithState[(Long, Long), ForecastRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (wd, rows, state: GroupState[(Long, Long)]) =>
          var (sum, n) = state.getOption.getOrElse((0L, 0L))
          val out = rows.toSeq.sortBy(_.day.toString).flatMap { r =>
            val res = if (n >= 1) {
              val f = sum / n
              Some(ForecastRow(r.day, wd, r.n_events, f,
                math.abs(r.n_events - f)))
            } else None
            sum += r.n_events; n += 1
            res
          }
          state.update((sum, n))
          out.iterator
      }
  }

  /** st27: the q70 data-quality gate live — expectation counters
    * maintained AT INGEST so a bad upstream deploy shows on the DQ
    * board within a micro-batch instead of at the nightly audit. Each
    * arriving lineitem row expands to one (rule, violated) pair per
    * row-local rule — range, completeness, and referential integrity,
    * the RI flag from a stream–STATIC left join against the orders
    * dimension (st07's pattern: the dim is re-read per batch, no
    * stream-stream state) — and a Complete-mode aggregate keeps one
    * (n_checked, n_violations) row PER RULE: state = |rules| rows,
    * never traffic. Same rule names as q70, so the live board and the
    * batch audit reconcile by key. */
  def streamingDqGate(lineitems: DataFrame, orders: DataFrame): DataFrame =
    lineitems
      // DISTINCT keys (the q70 rule): a duplicated dimension key must
      // not fan out stream rows and inflate the row-local counters
      .join(orders.select(col("o_orderkey")).distinct(),
        lineitems("l_orderkey") === col("o_orderkey"), "left_outer")
      .select(explode(array(
        struct(lit("lineitem_quantity_range").as("rule"),
          (col("l_quantity") <= 0 || col("l_quantity") > 100).as("viol")),
        struct(lit("lineitem_shipdate_complete").as("rule"),
          col("l_shipdate").isNull.as("viol")),
        struct(lit("lineitem_orderkey_resolves").as("rule"),
          col("o_orderkey").isNull.as("viol")))).as("r"))
      .groupBy(col("r.rule").as("rule"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("r.viol"), 1L).otherwise(0L)).as("n_violations"))

  def streamingSkyline(parts: Dataset[PartPoint]): Dataset[FrontierRow] = {
    import parts.sparkSession.implicits._
    parts.groupByKey(_ => 0)
      .flatMapGroupsWithState[(Long, List[PartPoint]), FrontierRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[(Long, List[PartPoint])]) =>
          val (ver, front0) = state.getOption.getOrElse((0L, Nil))
          def dominates(a: PartPoint, b: PartPoint): Boolean =
            a.price_c <= b.price_c && a.p_size >= b.p_size &&
              (a.price_c < b.price_c || a.p_size > b.p_size)
          var front = front0
          var changed = false
          // p_partkey order: micro-batch replays admit deterministically
          rows.toSeq.sortBy(_.p_partkey).foreach { p =>
            front.find(_.p_partkey == p.p_partkey) match {
              case Some(old)
                  if old.price_c == p.price_c && old.p_size == p.p_size =>
                // exact re-delivery: idempotent, frontier untouched
              case Some(_) =>
                // ATTRIBUTE UPDATE (repriced/resized part): evict the
                // stale point, then re-run admission for the new one.
                // One-pass caveat, documented: points the stale entry
                // dominated in the past are not resurrected — the
                // stream skyline is an upper bound on staleness, the
                // batch job (q67) is the periodic exact rebuild.
                front = front.filterNot(_.p_partkey == p.p_partkey)
                if (!front.exists(f => dominates(f, p)))
                  front = p :: front.filterNot(f => dominates(p, f))
                changed = true
              case None =>
                // dominated new points drop; ties on both axes are
                // kept (the frontier is the true skyline, ties and
                // all — its size is bounded by the skyline, not by
                // traffic)
                if (!front.exists(f => dominates(f, p))) {
                  front = p :: front.filterNot(f => dominates(p, f))
                  changed = true
                }
            }
          }
          if (!changed) Iterator.empty
          else {
            val v = ver + 1
            state.update((v, front))
            front.sortBy(_.p_partkey)
              .map(p => FrontierRow(v, p.p_partkey, p.p_size, p.price_c))
              .iterator
          }
      }
  }

  case class PostingRow(tok: String, df: Long, doc_id: Long, tf: Long,
    rk: Int)

  /** st28: streaming maintenance of ss21's impact-ordered posting
    * index — the lexical-retrieval twin of st23's ANN-index upkeep: as
    * documents arrive, each term's state is its df counter plus its
    * top-`keep` postings by (tf DESC, doc_id) — EXACTLY the statically
    * truncated list the batch builder ships, so a BM25 serving tier
    * reads a fresh index without ever re-scanning the corpus. Per-doc
    * term frequencies are computed ROW-LOCALLY (array ops on the doc's
    * own text — no pre-aggregation state), so the only keyed state is
    * per TERM: 1 long + ≤`keep` pairs, bounded by the vocabulary,
    * never by traffic. Each update emits the term's refreshed posting
    * list (Append mode; the last emission per term IS the index — the
    * st25 versioned-snapshot discipline). Insert-only stream assumed
    * (re-delivering a doc already inside a term's kept list replaces
    * its entry idempotently, but a doc pruned from the top-`keep`
    * cannot be recognized as seen — tracking every doc per term is
    * exactly the unbounded state this design exists to avoid; the
    * batch rebuild (ss21) is the periodic exact reconciliation). */
  def streamingPostingIndex(docs: DataFrame,
      keep: Int = 64): Dataset[PostingRow] = {
    import docs.sparkSession.implicits._
    val terms = docs
      .withColumn("toks", split(trim(col("text")), " "))
      .select(col("doc_id"), explode(expr(
        """transform(array_distinct(toks),
          |  t -> struct(t AS tok,
          |              size(filter(toks, x -> x = t)) AS tf))"""
          .stripMargin)).as("p"))
      .select(col("p.tok").as("tok"), col("doc_id"),
        col("p.tf").cast("long").as("tf"))
      .as[(String, Long, Long)]
    terms.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, List[(Long, Long)]), PostingRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tok, rows, state: GroupState[(Long, List[(Long, Long)])]) =>
          val (df0, top0) = state.getOption.getOrElse((0L, Nil))
          var df = df0
          var top = top0 // (tf, doc_id), best-first
          // doc_id order: micro-batch replays fold deterministically
          rows.toSeq.sortBy(_._2).foreach { case (_, doc, tf) =>
            if (!top.exists(e => e._2 == doc && e._1 == tf)) {
              df += (if (top.exists(_._2 == doc)) 0L else 1L)
              top = ((tf, doc) :: top.filterNot(_._2 == doc))
                .sortBy(e => (-e._1, e._2)).take(keep)
            } else () // exact re-delivery of a kept posting: idempotent
          }
          if (df == df0 && top == top0) Iterator.empty
          else {
            state.update((df, top))
            top.iterator.zipWithIndex.map { case ((tf, doc), i) =>
              PostingRow(tok, df, doc, tf, i + 1)
            }
          }
      }
  }

  /** st29: streaming PURGE gate — the ingest half of the GDPR loop.
    * VersionedCorpus.purgeKeys erases a key from every published
    * version (the past); this gate applies the SAME `_tombstones`
    * ledger to the ingest stream so a purged key can never re-enter
    * via a late replay, an upstream backfill, or a crawler that
    * re-fetches the page (without it, the next publish resurrects
    * what compliance certified deleted). Mechanics: the ledger keys
    * — ∝ deletion requests, KBs against a 100 TB corpus — become one
    * static broadcast frame; the stream anti-joins on doc_id.
    * STATELESS (no state store, no watermark, Append): the deny-list
    * lives in the plan, not in state, so gate memory is independent
    * of traffic. Ledger is read at plan build — production wraps
    * this in foreachBatch to re-read per batch; the restart-to-
    * refresh caveat is the documented tradeoff for a shuffle-free
    * plan. */
  def streamingPurgeGate(docs: DataFrame, corpusRoot: String): DataFrame = {
    val s = docs.sparkSession
    val keys = s.createDataset(
      graft.sources.VersionedCorpus.tombstoneKeys(corpusRoot))(
      org.apache.spark.sql.Encoders.scalaLong).toDF("doc_id")
    docs.join(broadcast(keys), Seq("doc_id"), "left_anti")
  }

  /** st32: TOMBSTONE-AWARE posting maintenance — the serving half of
    * the streaming GDPR loop (st29 stops a purged key RE-ENTERING;
    * this stops it from still being SERVED out of standing index
    * state until the next batch rebuild): st28's fold extended with
    * tombstone rows. Input carries docs and tombstones in one stream
    * (doc_id, text, tombstone); a tombstone knows only its doc_id, so
    * it fans to every term whose state might hold the doc — the
    * BOUNDED vocabulary frame, the same cardinality the state itself
    * is keyed by — and each term's fold drops the doc from its kept
    * list (emitting the refreshed list; an emptied list emits ONE
    * rk=0 retraction marker so downstream's last-emission-wins
    * snapshot can forget the term rather than serve its stale final
    * list). Semantics, stated exactly: (1) after a tombstone batch is
    * processed, NO emission ever serves the purged doc again
    * (additions sort before removals inside a batch, so a doc
    * arriving together with its tombstone ends removed); (2) df is
    * decremented only when the purged doc was in the kept list —
    * for a doc pruned before purge the state cannot know membership,
    * so between batch reconciliations df is a documented UPPER bound
    * with drift ≤ |purged docs| (pp40's sufficient-statistic patch is
    * the exact reconciliation, same Kappa split every st-twin
    * documents); (3) state holds NO tombstone memory — bounded by
    * vocabulary — so replay protection is st29's job, composed
    * upstream (the spec wires both). */
  def streamingPostingPurge(events: DataFrame, vocab: DataFrame,
      keep: Int = 64): Dataset[PostingRow] = {
    import events.sparkSession.implicits._
    val docTerms = events.filter(!col("tombstone"))
      .withColumn("toks", split(trim(col("text")), " "))
      .select(col("doc_id"), explode(expr(
        """transform(array_distinct(toks),
          |  t -> struct(t AS tok,
          |              size(filter(toks, x -> x = t)) AS tf))"""
          .stripMargin)).as("p"))
      .select(col("p.tok").as("tok"), col("doc_id"),
        col("p.tf").cast("long").as("tf"))
    val tombTerms = events.filter(col("tombstone"))
      .select(col("doc_id")).crossJoin(broadcast(vocab))
      .select(col("tok"), col("doc_id"), lit(-1L).as("tf"))
    docTerms.unionByName(tombTerms).as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, List[(Long, Long)]), PostingRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tok, rows, state: GroupState[(Long, List[(Long, Long)])]) =>
          val (df0, top0) = state.getOption.getOrElse((0L, Nil))
          var df = df0
          var top = top0 // (tf, doc_id), best-first
          // additions before removals, doc_id order within each class:
          // replay-deterministic, and doc-with-its-tombstone-in-one-
          // batch deterministically ends removed
          rows.toSeq.sortBy(r => (r._3 < 0, r._2)).foreach {
            case (_, doc, tf) if tf >= 0 =>
              if (!top.exists(e => e._2 == doc && e._1 == tf)) {
                df += (if (top.exists(_._2 == doc)) 0L else 1L)
                top = ((tf, doc) :: top.filterNot(_._2 == doc))
                  .sortBy(e => (-e._1, e._2)).take(keep)
              } else () // exact re-delivery of a kept posting: idempotent
            case (_, doc, _) => // tombstone
              if (top.exists(_._2 == doc)) {
                top = top.filterNot(_._2 == doc)
                df = math.max(0L, df - 1)
              } else () // pruned-before-purge: df stays an upper bound
          }
          if (df == df0 && top == top0) Iterator.empty
          else {
            state.update((df, top))
            if (top.isEmpty) Iterator.single(PostingRow(tok, df, -1L, 0L, 0))
            else top.iterator.zipWithIndex.map { case ((tf, doc), i) =>
              PostingRow(tok, df, doc, tf, i + 1)
            }
          }
      }
  }

  case class CapRow(source: String, doc_id: Long, admitted: Boolean,
    n_seen: Long)

  /** st31: streaming DOMAIN-cap enforcement — pp33's guard at ingest:
    * no source may put more than `cap` docs into the live pool, so a
    * crawler that suddenly floods one domain is throttled at the
    * door instead of polluting everything downstream until the next
    * batch rebuild. State per source is ONE counter (bounded by the
    * source domain, never traffic). Admission is arrival order
    * ((doc_id within a batch for replay determinism)) — the stream
    * cannot rank docs it has not seen, so quality-ranked selection
    * remains batch pp33's job: the gate bounds volume NOW, the
    * periodic batch re-selects the best `cap` retrospectively (the
    * Kappa split every st-twin documents). At-least-once caveat:
    * a re-delivered doc increments the counter again (per-doc
    * dedup state would be unbounded — st20's keep-first tier is the
    * upstream that makes deliveries effectively-once). Emits every
    * doc's disposition (admitted or not) — the audit row pp11-style
    * funnels consume. */
  def streamingDomainCaps(docs: DataFrame, cap: Long): Dataset[CapRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, CapRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src, rows, state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._2).map { case (_, id) =>
            n += 1
            CapRow(src, id, n <= cap, n)
          }
          state.update(n)
          out.iterator
      }
  }

  case class BotState(lastSec: Long, nGaps: Long,
    counters: Map[Long, Long], evicted: Boolean)
  case class BotRow(user_id: Long, n_gaps: Long, modal_gap_s: Long,
    modal_lb_ppm: Long, exact: Boolean, is_bot: Boolean)

  /** st30: ev54's bot/timer gate LIVE — per-user state is BOUNDED by
    * a 4-counter Misra–Gries sketch of gap values plus (last second,
    * gap count): ev54's exact per-user gap histogram is unbounded in
    * distinct deltas, which a state store must never be. MG's
    * majority guarantee carries the flag: a timer's dominant delta is
    * always retained with count ≥ true − n/4, so its lower-bound
    * share still clears the 50% rule for the traffic the gate exists
    * to catch (share ≈ 100%), while a human's spread deltas keep
    * every counter small. When the sketch has NEVER evicted (≤ 4
    * distinct deltas seen) it is the exact histogram — both batch
    * rules (≥ 50% modal share, ≤ 2 distinct) apply verbatim and the
    * row is marked `exact`; after an eviction the gate turns
    * conservative (lower-bound share only — flags are definite, a
    * borderline 50.1% bot may wait for the batch ev54
    * reconciliation, never the reverse). One emission per active user
    * per batch, latest row wins (the st25 snapshot discipline);
    * batch rows fold in (ts, event_id) order so replays are
    * deterministic. */
  def streamingBotGate(events: Dataset[Event]): Dataset[BotRow] = {
    import events.sparkSession.implicits._
    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[BotState]): BotRow = {
      var st = state.getOption.getOrElse(BotState(Long.MinValue, 0L,
        Map.empty[Long, Long], evicted = false))
      batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val sec = e.ts.getTime / 1000L
        if (st.lastSec != Long.MinValue) {
          val g = sec - st.lastSec
          val c = st.counters
          val next =
            if (c.contains(g)) c + (g -> (c(g) + 1L))
            else if (c.size < 4) c + (g -> 1L)
            else { // Misra–Gries decrement round
              st = st.copy(evicted = true)
              c.map { case (k, v) => k -> (v - 1L) }.filter(_._2 > 0L)
            }
          st = st.copy(nGaps = st.nGaps + 1L, counters = next)
        }
        st = st.copy(lastSec = sec)
      }
      state.update(st)
      val (modalGap, modalCnt) =
        if (st.counters.isEmpty) (0L, 0L)
        else st.counters.toSeq.sortBy { case (g, c) => (-c, g) }.head
      val lbPpm =
        if (st.nGaps == 0L) 0L else modalCnt * 1000000L / st.nGaps
      val exact = !st.evicted
      val isBot = st.nGaps >= 19L && (
        if (exact) lbPpm >= 500000L || st.counters.size <= 2
        else lbPpm >= 500000L)
      BotRow(userId, st.nGaps, modalGap, lbPpm, exact, isBot)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** st34: streaming kNN-GRAPH maintenance — ss25's arrival fold
    * LIVE, closing the streaming loop for the last index family (IVF
    * st23, postings st28/st32, lexicon st33 — now the graph): each
    * arrival micro-batch (vec_id, embedding) folds into the CURRENT
    * published knn_edges artifact via the exact ss25 patch and
    * publishes the patched graph AND the extended cell assignment as
    * the next versions, so `ss22FromArtifacts` readers see every
    * arrival one publish later. `foreachBatch`, not a state store:
    * the graph state IS the published artifact (the st17 MV
    * discipline) — per-batch work ∝ batch fan-in exactly as ss25,
    * and the quantizer stays the published `centroids` line
    * (immutable under upsert; retraining is ss17's periodic job).
    * EXACTNESS COMPOUNDS: the fold is exact for ANY standing set
    * under a fixed quantizer, and each publish extends the standing
    * set, so after N batches the served graph ≡ the one-shot ss25
    * rebuild on the union (spec-asserted on a two-batch split — no
    * st28-style drift). Crash-replay is IDEMPOTENT by construction:
    * batch members are stripped from the standing frames before the
    * fold (and the merge candidate set dedupes), so re-delivering an
    * acknowledged batch republishes bit-identical content — a
    * duplicate version, never a duplicate fold. Arrivals must land
    * in the corpus table too (`corpusDir` is where standing
    * embeddings are read — production ingests the same stream into
    * the table ahead of this job). */
  def streamingKnnMaintenance(arrivals: DataFrame, corpusDir: String,
      root: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val s = batch0.sparkSession
        if (!batch0.isEmpty) {
          val batch = batch0.select(col("vec_id"), col("embedding"))
          val batchIds = batch.select(col("vec_id"))
          val cells = graft.sources.IndexArtifacts.read(s, root, "cells")
          val cent = graft.sources.IndexArtifacts.read(s, root, "centroids")
          val standing = graft.Tables.embeddings(s, corpusDir)
            .join(cells.select(col("vec_id")), Seq("vec_id"), "left_semi")
            .join(batchIds, Seq("vec_id"), "left_anti")
          val standingEdges = graft.sources.IndexArtifacts
            .read(s, root, "knn_edges")
            .join(batchIds.withColumnRenamed("vec_id", "qid"),
              Seq("qid"), "left_anti")
          val patched = graft.ops.Similarity
            .knnUpsertFrom(standing, batch, cent, standingEdges)
          // publish ORDER is a reader-consistency contract (ADVICE r8):
          // the two lines are separate non-atomic versions, so a reader
          // (or a crash) between the publishes sees one updated and one
          // stale. cells FIRST: an assignment superset is harmless to a
          // walk reader (extra entry candidates), while a graph whose
          // arrival nodes are absent from cells would hand
          // ss22FromArtifacts edges into nodes it cannot enter from.
          // Both reads above are version-pinned at call time
          // (readLatest resolves eagerly), so the fold itself is
          // unaffected by the order.
          graft.sources.VersionedCorpus.publish(
            cells.join(batchIds, Seq("vec_id"), "left_anti")
              .unionByName(graft.ops.Similarity.knnAssigned(batch, cent)
                .select(col("vec_id"), col("cell"))),
            s"$root/cells", Some("vec_id")): Unit
          graft.sources.VersionedCorpus.publish(patched,
            s"$root/knn_edges", Some("qid")): Unit
        }
      }
      .start()

  /** st36: streaming DEDUP-ARTIFACT maintenance — the fold tick's
    * three dedup lines LIVE (clusters, keepers, and — since pp49 —
    * safe_keepers), completing the Kappa picture for the dedup family
    * the way st34 completed it for the graph: each arrival micro-batch
    * of doc ids folds into the CURRENT published lines via the exact
    * pp43 quotient kernel + pp49 safe kernel and publishes all three
    * as next versions (safe_keepers FIRST — the fold's
    * reader-consistency order: the conservative line must never be
    * staler than the keeper line a reader composes it with).
    * `foreachBatch`, not a state store: the dedup state IS the
    * published artifact (st34's discipline). Batch pairs ride dd23's
    * bucket-restricted candidate generation keyed on the micro-batch
    * ids (`batchPairsOf`) — the standing corpus never self-joins, and
    * per-batch work is ∝ the batch's pair surface plus touched
    * neighborhoods. EXACTNESS COMPOUNDS: both kernels are exact for
    * ANY standing artifact, and each publish extends it, so after N
    * batches the served lines ≡ the one-shot dd06/dd07/dd28 rebuild
    * on standing ∪ all arrivals (spec-asserted on a two-batch split).
    * Crash-replay is idempotent: a re-delivered batch's docs are
    * already clustered, so its pairs quotient onto existing cluster
    * nodes and every publish is bit-identical content — a duplicate
    * version, never a duplicate fold. Arrivals must land in the
    * corpus table ahead of this job (st34's convention — `corpusDir`
    * is where shingles and quality scores are read). */
  def streamingDedupMaintenance(arrivals: DataFrame, corpusDir: String,
      root: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val s = batch0.sparkSession
        if (!batch0.isEmpty) {
          graft.sources.IndexArtifacts.foldDedupLines(s, corpusDir, root,
            graft.ops.Dedup.batchPairsOf(s, corpusDir,
              batch0.select(col("doc_id")))): Unit
        }
      }
      .start()

  /** The reserved totals key of st33's state space — space-bearing, so no
    * whitespace-split token can ever collide with it. */
  val lexTotalsKey: String = " __TOTALS__"

  case class LexStatRow(tok: String, df: Long, n_docs: Long,
    t_tokens: Long, retracted: Boolean)

  /** st33: streaming LEXICON maintenance — pp40's sufficient
    * statistics live, so st28's postings serve BM25 with FRESH idf
    * between batch reconciliations instead of yesterday's (st32's
    * documented df drift becomes observable and bounded in one more
    * place). Input is one stream of (doc_id, text, tombstone) where a
    * tombstone row CARRIES THE DOC'S TEXT — the CDC retraction-record
    * convention, and exactly what the purge pipeline holds in hand
    * (st29's gate reads the ledgered doc row before deletion). That
    * makes every delta ROW-LOCAL and EXACT: a row contributes ±1 df
    * per distinct term it contains, ±1 to the doc count and ±|tokens|
    * to the token total — no per-term doc membership state (which is
    * the unbounded frame this design exists to avoid; contrast st32,
    * whose doc_id-only tombstones force the upper-bound df). State =
    * one (df) long per term plus one (n_docs, t_tokens) pair under
    * the reserved totals key — ∝ vocabulary, never traffic. Emission
    * is last-wins per key (the st25 snapshot discipline): per-term
    * rows carry the refreshed df (df = 0 ⇒ a retraction marker so
    * consumers forget the term, st32's rk=0 analog); the totals row
    * carries (N, T); a reader joins the two and computes idf/avgdl
    * row-locally — the exact bm25Lexicon shape. Deltas are summed
    * commutatively, so within-batch order is irrelevant and batch
    * replays are deterministic; a PARTIAL re-delivery double-counts
    * (at-least-once caveat, st31's precedent — st20/st29 upstream
    * make deliveries effectively-once, and pp40's batch patch is the
    * exact reconciliation). Negative drift from a tombstone whose doc
    * was never folded in (a replay gap) clamps at 0, conservative. */
  def streamingLexiconMaintenance(events: DataFrame): Dataset[LexStatRow] = {
    import events.sparkSession.implicits._
    val signed = events
      .withColumn("toks", split(trim(col("text")), " "))
      .withColumn("sign", when(col("tombstone"), -1L).otherwise(1L))
    val termDeltas = signed
      .select(explode(array_distinct(col("toks"))).as("tok"),
        col("sign").as("d_df"), lit(0L).as("d_docs"),
        lit(0L).as("d_tokens"))
    val totalDeltas = signed
      .select(lit(lexTotalsKey).as("tok"), lit(0L).as("d_df"),
        col("sign").as("d_docs"),
        (col("sign") * size(col("toks")).cast("long")).as("d_tokens"))
    termDeltas.unionByName(totalDeltas).as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), LexStatRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tok, rows, state: GroupState[(Long, Long, Long)]) =>
          val (df0, n0, t0) = state.getOption.getOrElse((0L, 0L, 0L))
          var df = df0; var n = n0; var t = t0
          rows.foreach { r => df += r._2; n += r._3; t += r._4 }
          df = math.max(0L, df); n = math.max(0L, n); t = math.max(0L, t)
          if ((df, n, t) == ((df0, n0, t0))) Iterator.empty
          else {
            state.update((df, n, t))
            if (tok == lexTotalsKey)
              Iterator.single(LexStatRow(tok, 0L, n, t, retracted = false))
            else
              Iterator.single(LexStatRow(tok, df, -1L, -1L,
                retracted = df == 0L))
          }
      }
  }

  /** st35: the DATASET CARD live — pp48's streaming twin, so a mix
    * designer watches a source's volume/language/quality drift DURING
    * a crawl instead of at the nightly batch card. Every signal is
    * row-local (tx02/tx03's token, stopword and score rules verbatim),
    * so the card is one Complete-mode aggregate: state per source =
    * four counters + one KLL sketch of doc lengths (k=200 — the p50
    * column is the sketch's deterministic estimate, exact until a
    * source exceeds the compaction threshold, ±ε·n rank error after;
    * pp48's percentile_disc is the exact batch reconciliation).
    * The card's duplication column is deliberately ABSENT here: dup
    * membership needs cross-document pair evidence (dd06), which is
    * exactly the unbounded-state shape the streaming plane avoids —
    * the batch card carries it (the st28/st31 Kappa split). State
    * bounded by |sources| × sketch size, never traffic. */
  def streamingDatasetCard(docs: DataFrame): DataFrame = {
    val stopArr = array(graft.ops.Text.stopwords.map(lit): _*)
    val enriched = docs.select(col("source"),
      size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
      // KllQuantileAgg's input contract is double (st08's shape)
      size(split(trim(col("text")), " ")).cast("double").as("n_tokens_d"),
      size(filter(split(trim(col("text")), " "),
        t => array_contains(stopArr, t))).cast("long").as("stop_cnt"))
      .withColumn("score",
        round(col("stop_cnt") * 0.5 / col("n_tokens") +
          when(col("n_tokens").between(5, 200), 0.5).otherwise(0.0), 4))
    val tokAttr = enriched.queryExecution.analyzed.output
      .find(_.name == "n_tokens_d").get
    val kll = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.KllQuantileAgg(tokAttr, Seq(0.5))
        .toAggregateExpression())
    enriched.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_total"),
        kll.as("qs"),
        sum(when(col("stop_cnt") >= 2, 1L).otherwise(0L)).as("n_en"),
        sum(when(col("score") >= 0.5, 1L).otherwise(0L)).as("n_quality"))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        col("qs").getItem(0).cast("long").as("p50_tokens"),
        col("n_en"), col("n_quality"),
        expr("n_en * 10000 div n_docs").as("en_bp"),
        expr("n_quality * 10000 div n_docs").as("quality_bp"))
  }

  /** st37: the SRM board LIVE — ev61's assignment-health gate as a
    * continuously-maintained board, so a broken split (or one arm's
    * client silently dropping an event type) pages DURING the
    * experiment instead of at the nightly batch read, while every
    * downstream readout (ev60/ev62) still trusts the assignment.
    * Distinctness is the ONLY state: streaming `dropDuplicates` on
    * (event_type, user_id) — bounded by |types|·|users| exactly like
    * the batch distinct, never by traffic (st35's bounded-state
    * rationale) — then the chi-square is ev61's arithmetic verbatim
    * (row-local arm = user_id % 2, (n₀−n₁)²·1000/n on the exact milli
    * grid, 3841 cut) in one Complete-mode aggregate. Re-delivered
    * events land on already-seen (type, user) pairs and change
    * nothing — replay-idempotent by the dedup state itself. The
    * `_overall` guard matches ev61's cross-engine contract. */
  def streamingSrmBoard(events: DataFrame): DataFrame = {
    val byType = events.select(col("event_type"), col("user_id"))
      .filter(col("event_type") =!= "_overall")
    val overall = events.select(lit("_overall").as("event_type"),
      col("user_id"))
    byType.unionByName(overall)
      .dropDuplicates("event_type", "user_id")
      .withColumn("arm", col("user_id") % 2)
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
      .withColumn("stat_milli", expr(
        "(n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000" +
          " div greatest(1L, n_arm0 + n_arm1)"))
      .withColumn("srm_flag", col("stat_milli") > 3841L)
  }
}
