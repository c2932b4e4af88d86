package graft

import graft.streaming.StreamingJobs
import graft.streaming.StreamingJobs.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, date_trunc, dayofweek, lit, sum}
import java.sql.Timestamp

/** Structured-Streaming specs (st01/st02): MemoryStream in, memory sink
  * out, processAllAvailable for synchronous assertions. */
class StreamingSpec extends SparkTestBase {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  test("st01 streaming tumbling agg matches its batch twin semantics") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(5), 1, "view", 1.0),
      Event(2, ts(20), 1, "view", 2.0),
      Event(3, ts(65), 2, "click", 3.0))
    val q = StreamingJobs.tumblingCounts(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("st01_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM st01_out ORDER BY window_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2)   // hour 0: two views
      assert(rows(1).getAs[Long]("n_events") == 1)   // hour 1: one click
    } finally q.stop()
  }

  test("st14 streaming decontamination drops eval-overlapping docs at ingest") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // a 15-token span shared verbatim between an eval doc and one
    // incoming doc; a second incoming doc is clean; a third is shorter
    // than the window and must pass through untouched
    val span = (1 to 15).map(i => s"w$i").mkString(" ")
    val evalDocs = Seq((100L, s"eval prefix $span eval suffix"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    in.addData(
      (1L, s"some leading words $span and trailing ones"),
      (2L, (1 to 40).map(i => s"clean$i").mkString(" ")),
      (3L, "tiny doc"))
    val q = StreamingJobs.streamDecontam(
        in.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.outputMode("append").format("memory")
      .queryName("st14_out").start()
    try {
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM st14_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(2L, 3L),
        s"contaminated doc 1 must drop, clean docs 2 and 3 pass: $kept")
    } finally q.stop()
  }

  test("st19 streaming BPE encode equals batch tx46 on the same docs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // batch plane: tx46 over the corpus; streaming plane: the same
    // docs fed through the stateless encoder built from tx45's merges
    val batch = ops.Text.tx46BpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val merges = ops.Text.tx45BpeMerges(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    // two micro-batches: segmentation must not depend on batching
    in.addData(docs.take(docs.length / 2).toIndexedSeq)
    val q = StreamingJobs.streamingBpeEncode(
        in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("st19_out").start()
    try {
      q.processAllAvailable()
      in.addData(docs.drop(docs.length / 2).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, n_pieces, pieces FROM st19_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == batch, "streaming segmentation diverged from batch tx46")
    } finally q.stop()
  }

  test("st03 streaming dedup drops replayed events within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(2), 1, "click", 1.0),
      Event(1, ts(1), 1, "view", 1.0))   // replay of event 1 in-batch
    val q = graft.streaming.StreamingDedup.dedupedCounts(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("st03_out").start()
    try {
      q.processAllAvailable()
      in.addData(Event(2, ts(2), 1, "click", 1.0)) // replay across batches
      q.processAllAvailable()
      val total = spark.sql("SELECT sum(n_events) FROM st03_out").collect()(0).getLong(0)
      assert(total == 2, s"expected 2 distinct events, got $total")
    } finally q.stop()
  }

  test("st13 audited streaming publish is manifest-complete and replay-idempotent") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-st13").toString
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(2), 1, "click", 2.0))
    val q = StreamingJobs.auditedPublish(in.toDF(), s"$base/out", s"$base/ckpt")
    try {
      q.processAllAvailable()
      in.addData(Event(3, ts(3), 2, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    def manifest(batch: Long): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/out/batch-$batch", "_MANIFEST.json")))
    assert(manifest(0).contains(""""n_rows":2"""), manifest(0))
    assert(manifest(1).contains(""""n_rows":1"""), manifest(1))
    // replay: a restarted query re-emits an unacknowledged batch with
    // the SAME id — the truncate-mode publish must overwrite, not add
    spark.createDataFrame(Seq((1L, 1L, "view", 1.0), (2L, 1L, "click", 2.0)))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.format("graft-manifest")
      .option("path", s"$base/out/batch-0").mode("overwrite").save()
    assert(manifest(0).contains(""""n_rows":2"""), manifest(0))
    val total = spark.read.schema(
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(s"$base/out/batch-*/part-*.jsonl").count()
    assert(total == 3, s"expected 3 published rows across batches, got $total")
  }

  test("st11 streaming HLL distinct-users updates across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(2), 2, "view", 1.0),
      Event(3, ts(3), 1, "view", 1.0))   // user 1 repeats — not double-counted
    val q = StreamingJobs.streamingDistinctUsers(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("st11_out").start()
    try {
      q.processAllAvailable()
      val r1 = spark.sql("SELECT est_users FROM st11_out WHERE event_type='view'")
        .collect()(0).getLong(0)
      assert(r1 == 2, s"expected 2 distinct users, got $r1")
      in.addData(Event(4, ts(4), 3, "view", 1.0))  // new user in a later batch
      q.processAllAvailable()
      val r2 = spark.sql("SELECT est_users FROM st11_out WHERE event_type='view'")
        .collect()(0).getLong(0)
      assert(r2 == 3, s"expected 3 distinct users after second batch, got $r2")
    } finally q.stop()
  }

  test("st04 stream-stream interval join attributes purchases to recent views") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),      // within 30min of purchase -> match
      Event(2, ts(10), 1, "purchase", 5.0),
      Event(3, ts(100), 1, "view", 1.0),    // no purchase after -> no row
      Event(4, ts(200), 2, "purchase", 5.0)) // user 2 has no views -> no row
    val q = graft.streaming.StreamingJobs.purchaseAttribution(in.toDF())
      .writeStream.outputMode("append").format("memory").queryName("st04_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT p_id, v_id FROM st04_out").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 2 && rows(0).getLong(1) == 1)
    } finally q.stop()
  }

  test("st15 outer interval join emits organic purchases on watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),       // matches p2
      Event(2, ts(10), 1, "purchase", 5.0),
      Event(4, ts(200), 2, "purchase", 5.0)) // organic: user 2 never views
    val q = graft.streaming.StreamingJobs.purchaseAttributionOuter(in.toDF())
      .writeStream.outputMode("append").format("memory").queryName("st15_out").start()
    try {
      q.processAllAvailable()
      // push the watermark far past p4's join window so its null row
      // must be emitted (and its state evicted). The query watermark is
      // the MIN across both sides' watermark nodes, so BOTH the view
      // and the purchase stream need fresh events to advance it.
      in.addData(Event(101, ts(600), 3, "view", 1.0),
        Event(102, ts(600), 3, "purchase", 1.0))
      q.processAllAvailable()
      in.addData(Event(103, ts(900), 3, "view", 1.0),
        Event(104, ts(900), 3, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT p_id, v_id FROM st15_out WHERE p_id IN (2, 4) ORDER BY p_id")
        .collect()
      assert(rows.length == 2, s"expected matched + organic, got ${rows.length}")
      assert(rows(0).getLong(0) == 2 && rows(0).getLong(1) == 1)
      assert(rows(1).getLong(0) == 4 && rows(1).isNullAt(1),
        "organic purchase must emit a null-view row once the watermark passes")
    } finally q.stop()
  }

  test("st05 foreachBatch sink writes each micro-batch to parquet") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-st05").toString
    val in = MemoryStream[Event]
    val q = StreamingJobs.parquetBatchSink(in.toDF(), s"$dir/out")
    try {
      in.addData(Event(1, ts(0), 1, "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(1), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() == 2)
    } finally q.stop()
    // audited variant: per-batch manifest dirs (st13's landing-zone
    // layout) through the two-phase graft-manifest sink
    val in2 = MemoryStream[Event]
    val q2 = StreamingJobs.parquetBatchSink(in2.toDF(), s"$dir/audited",
      audited = true, checkpointDir = Some(s"$dir/ckpt"))
    try {
      in2.addData(Event(3, ts(2), 2, "view", 1.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val m = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/audited/batch-0", "_MANIFEST.json")))
    assert(m.contains(""""n_rows":1"""), m)
  }

  test("st06 streaming upsert keeps the latest record per key") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(5), 1, "view", 2.0))   // same key, later → wins
    val q = StreamingJobs.latestPerKey(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("st06_out").start()
    try {
      q.processAllAvailable()
      in.addData(Event(3, ts(9), 1, "view", 7.5)) // cross-batch upsert
      in.addData(Event(4, ts(2), 1, "view", 9.9)) // LATE record must NOT win
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM st06_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("latest_event_id") == 3)
      assert(rows(0).getAs[Double]("latest_value") == 7.5)
    } finally q.stop()
  }

  test("st07 stream-static join enriches events with a dimension") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 1, "view", 10.0),
      Event(2, ts(2), 1, "click", 5.0),
      Event(3, ts(3), 2, "view", 2.0))
    val q = StreamingJobs.enrichedCounts(in.toDF(), dim)
      .writeStream.outputMode("complete").format("memory").queryName("st07_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM st07_out ORDER BY segment").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("basic", 1L, 2.0), ("gold", 2L, 15.0)))
    } finally q.stop()
  }

  test("st08 streaming KLL quantiles track the stream across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData((1 to 50).map(i => Event(i, ts(i), 1, "view", i.toDouble)): _*)
    val q = StreamingJobs.streamingQuantiles(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("st08_out").start()
    try {
      q.processAllAvailable()
      in.addData((51 to 100).map(i => Event(i, ts(i), 1, "view", i.toDouble)): _*)
      q.processAllAvailable()
      val r = spark.sql("SELECT * FROM st08_out").collect()(0)
      assert(r.getAs[Long]("n") == 100)
      assert(math.abs(r.getAs[Double]("p50") - 50.0) <= 5.0,
        s"p50 ${r.getAs[Double]("p50")}")
      assert(math.abs(r.getAs[Double]("p90") - 90.0) <= 5.0,
        s"p90 ${r.getAs[Double]("p90")}")
    } finally q.stop()
  }

  test("st09 file-source pipeline is incremental and exactly-once across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft-st09")
    val (inDir, outDir, chkDir) =
      (s"$base/in", s"$base/out", s"$base/chk")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def writeFile(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/$name"),
        lines.mkString("\n").getBytes)
    def ev(id: Long, t: String, typ: String, v: Double): String =
      s"""{"event_id":$id,"ts":"2024-01-01T$t:00.000Z","user_id":1,"event_type":"$typ","value":$v}"""
    // run 1: hour-0 and hour-1 windows, plus an hour-3 event whose
    // watermark (1h behind) closes both earlier windows
    writeFile("f1.json", ev(1, "00:05", "view", 1.0), ev(2, "00:20", "view", 2.0))
    writeFile("f2.json", ev(3, "01:05", "click", 3.0), ev(4, "03:10", "view", 9.0))
    val q1 = StreamingJobs.fileSourcePipeline(spark, inDir, outDir, chkDir)
    q1.awaitTermination()
    val run1 = spark.read.parquet(outDir)
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(run1 == Set(
      ("2024-01-01 00:00:00.0", "view", 2L),
      ("2024-01-01 01:00:00.0", "click", 1L)),
      s"run-1 emitted $run1")
    // run 2 ("restart"): ONE new file; the checkpoint must skip f1/f2
    // (no duplicated windows) and the advanced watermark flushes hour 3
    writeFile("f3.json", ev(5, "05:30", "click", 1.0))
    val q2 = StreamingJobs.fileSourcePipeline(spark, inDir, outDir, chkDir)
    q2.awaitTermination()
    val run2 = spark.read.parquet(outDir)
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(run2.length == run2.toSet.size, s"duplicated windows: ${run2.toList}")
    assert(run2.toSet == run1 + (("2024-01-01 03:00:00.0", "view", 1L)),
      s"run-2 emitted ${run2.toSet}")
  }

  test("st10 streaming top-k maintains the k best per key across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(1), 1, "purchase", 10.0),
      Event(2, ts(2), 1, "purchase", 30.0),
      Event(3, ts(3), 1, "view", 99.0)) // non-purchase must not count
    val q = StreamingJobs.streamingTopK(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("st10_out").start()
    try {
      q.processAllAvailable()
      // later batch displaces the smallest of the running top-3
      in.addData(
        Event(4, ts(4), 1, "purchase", 20.0),
        Event(5, ts(5), 1, "purchase", 25.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT * FROM st10_out WHERE user_id = 1").collect()(0)
      assert(r.getSeq[Long](1) == Seq(2L, 5L, 4L),
        s"expected events 2,5,4 got ${r.getSeq[Long](1)}")
      assert(r.getSeq[Long](2) == Seq(3000L, 2500L, 2000L))
    } finally q.stop()
  }

  test("st12 session_window matches the custom-state sessionizer") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // same shape as the st02 fixture: sessions at 0-10 and 120-125,
    // then a far-future event to push the watermark past both
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(120), 1, "view", 1.0),
      Event(4, ts(125), 1, "view", 1.0))
    val q = StreamingJobs.sessionWindowCounts(in.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("st12_out").start()
    try {
      q.processAllAvailable()
      in.addData(Event(5, ts(600), 1, "view", 1.0))  // watermark push
      q.processAllAvailable()
      val closed = spark.sql(
        "SELECT session_start, n_events FROM st12_out ORDER BY session_start")
        .collect()
      assert(closed.length == 2, s"expected 2 closed sessions, got ${closed.length}")
      assert(closed(0).getTimestamp(0) == ts(0) && closed(0).getLong(1) == 2)
      assert(closed(1).getTimestamp(0) == ts(120) && closed(1).getLong(1) == 2)
    } finally q.stop()
  }

  test("st16 transformWithState sessionizer matches st02 on the same fixture") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider;
    // scope the conf to this query and restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      in.addData( // the st02 fixture: sessions at 0-10, 120-125, open at 300
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(10), 1, "click", 1.0),
        Event(3, ts(120), 1, "view", 1.0),
        Event(4, ts(125), 1, "view", 1.0),
        Event(5, ts(300), 1, "purchase", 1.0))
      val q = StreamingJobs.sessionizeV2(in.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("st16_out").start()
      try {
        q.processAllAvailable()
        val sessions = spark.sql("SELECT * FROM st16_out ORDER BY session_start")
          .as[Session].collect()
        // identical emission to st02: the two closed sessions, third open
        assert(sessions.length == 2)
        assert(sessions(0).n_events == 2 && sessions(0).session_start == ts(0))
        assert(sessions(1).n_events == 2 && sessions(1).session_start == ts(120))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("st02 stateful sessionize closes sessions on observed gaps") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1: two sessions separated by a 2h gap, third session after 5h.
    in.addData(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(120), 1, "view", 1.0),
      Event(4, ts(125), 1, "view", 1.0),
      Event(5, ts(300), 1, "purchase", 1.0))
    val q = StreamingJobs.sessionize(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("st02_out").start()
    try {
      q.processAllAvailable()
      val sessions = spark.sql("SELECT * FROM st02_out ORDER BY session_start")
        .as[Session].collect()
      // the two *closed* sessions are emitted; the third stays open in state
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2 && sessions(1).n_events == 2)
    } finally q.stop()
  }

  test("st17 streaming packing carries the token cursor across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingJobs.{DocIn, PackedDoc}
    val in = MemoryStream[DocIn]
    val q = StreamingJobs.streamingPacking(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("st17_out").start()
    try {
      // batch 1: source a fills 500 of bin 0; source b starts bin 0
      in.addData(DocIn(1, "a", 300), DocIn(2, "a", 200), DocIn(3, "b", 100))
      q.processAllAvailable()
      // batch 2: a's next doc starts at cursor 500 — still bin 0; the
      // one after starts at 900 — bin 1 (cursor carried across batches)
      in.addData(DocIn(4, "a", 400), DocIn(5, "a", 50), DocIn(6, "b", 600))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM st17_out ORDER BY doc_id")
        .as[PackedDoc].collect()
      assert(rows.map(r => (r.doc_id, r.source, r.bin_id)).toSeq == Seq(
        (1L, "a", 0L), (2L, "a", 0L), (3L, "b", 0L),
        (4L, "a", 0L), (5L, "a", 1L), (6L, "b", 0L)))
      // the emitted assignments replay the sequential rule exactly
      val replay = rows.filter(_.source == "a").sortBy(_.doc_id)
        .scanLeft(0L)((cur, d) => cur + d.n_tok).init
        .map(_ / 512L)
      assert(rows.filter(_.source == "a").sortBy(_.doc_id).map(_.bin_id)
        .toSeq == replay.toSeq)
    } finally q.stop()
  }

  test("st18 streaming diversity converges to the batch ev50 formula") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = StreamingJobs.streamingDiversity(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("st18_out").start()
    try {
      // batch 1: user 1 is a one-type hammerer, user 2 is mixed
      in.addData(
        Event(1, ts(1), 1, "view", 0), Event(2, ts(2), 1, "view", 0),
        Event(3, ts(3), 2, "view", 0), Event(4, ts(4), 2, "click", 0))
      q.processAllAvailable()
      val mid = spark.sql(
        "SELECT simpson_bp FROM st18_out WHERE user_id = 1 ORDER BY n_events DESC")
        .collect().head.getLong(0)
      assert(mid == 10000L, s"monoculture user must sit at 1e4: $mid")
      // batch 2: state carries across batches — user 1 diversifies
      in.addData(
        Event(5, ts(5), 1, "click", 0), Event(6, ts(6), 2, "view", 0))
      q.processAllAvailable()
      // Update mode re-emits per batch: latest row per user = max n_events
      val got = spark.sql(
        """SELECT user_id, n_events, n_types, simpson_bp FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id
          |    ORDER BY n_events DESC) AS rk FROM st18_out) WHERE rk = 1
          |ORDER BY user_id""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // batch replay of the exact ev50 pair-collision formula
      val all = Seq((1L, "view"), (1L, "view"), (1L, "click"),
        (2L, "view"), (2L, "click"), (2L, "view"))
      val expect = all.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, es) =>
        val counts = es.groupBy(_._2).map(_._2.length.toLong)
        val n = counts.sum
        val ps = counts.map(c => c * (c - 1)).sum
        (u, n, counts.size.toLong, if (n < 2) 0L else ps * 10000L / (n * (n - 1)))
      }
      assert(got.toSeq == expect, s"streaming $got != batch-formula $expect")
    } finally q.stop()
  }

  test("st20 streaming drop-reason funnel assigns pp11's dispositions at ingest") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val span = (1 to 15).map(i => s"e$i").mkString(" ")
    val evalDocs = Seq((900L, s"eval head $span eval tail")).toDF("doc_id", "text")
    // fluent filler: enough stopwords for a passing tx02 score
    val good = (1 to 30).map(i => s"the w$i of x$i").mkString(" ")
    val in = MemoryStream[(Long, String, String)]
    // batch 1: a kept doc, a contaminated doc, a low-quality doc (no
    // stopwords, >200 tokens), and an in-batch duplicate of the kept doc
    val junk = (1 to 220).map(i => s"z$i").mkString(" ")
    in.addData(
      (1L, "en", good),
      (2L, "en", s"leading words $span trailing words"),
      (3L, "de", junk),
      (4L, "en", good))
    val q = StreamingJobs.streamingDropReasons(
        in.toDF().toDF("doc_id", "lang", "text"), evalDocs)
      .writeStream.outputMode("append").format("memory")
      .queryName("st20_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a CROSS-batch duplicate of doc 1 (state must remember
      // the text), plus a fresh kept doc
      in.addData((5L, "fr", good), (6L, "en", good + " novel tail words"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, lang, reason FROM st20_out")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
        .toMap
      val expect = Map(
        1L -> (("en", "kept")),
        2L -> (("en", "contaminated")),
        3L -> (("de", "low_quality")),
        4L -> (("en", "duplicate")),
        5L -> (("fr", "duplicate")),
        6L -> (("en", "kept")))
      assert(got == expect, s"dispositions: $got")
    } finally q.stop()
  }

  test("st22 streaming MV maintenance keeps SummaryRewrite-routed queries fresh") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-st22").toString
    val mvDir = s"$base/summary_live"
    val in = MemoryStream[(Long, String, String, Double, java.sql.Date)]
    def rows(seq: (Long, String, String, Double, String)*) =
      seq.map { case (k, f, st, q, dt) =>
        (k, f, st, q, java.sql.Date.valueOf(dt)) }
    in.addData(rows(
      (1L, "N", "O", 10.0, "2024-01-05"), (2L, "N", "O", 5.0, "2024-02-07"),
      (3L, "R", "F", 7.0, "2024-01-09")): _*)
    val q = StreamingJobs.streamingSummaryMaintenance(
      in.toDF().toDF("l_orderkey", "l_returnflag", "l_linestatus",
        "l_quantity", "l_shipdate"),
      mvDir, s"$base/ckpt",
      // bind the MV to the raw table it stands in for — the sidecar
      // SummaryRewrite now requires before routing any scan to it
      sourcePath = Some(s"$base/lineitem.parquet"))
    def servedTotals(): Map[(String, String), (Double, Long)] = {
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.summaryDir", mvDir)
      // lineitem-shaped RAW scan the rule reroutes; the raw file itself
      // is EMPTY — any non-zero answer must come through the MV route
      val rawDir = s"$base/lineitem.parquet"
      if (!new java.io.File(rawDir).exists())
        Tables.lineitem(spark, sf).limit(0).coalesce(1)
          .write.parquet(rawDir)
      val df = s2.read.parquet(rawDir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
      assert(df.queryExecution.executedPlan.toString.contains("summary_live"))
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    }
    try {
      q.processAllAvailable()
      assert(servedTotals() == Map(
        ("N", "O") -> ((15.0, 2L)), ("R", "F") -> ((7.0, 1L))))
      // batch 2: new rows fold in; the served answer advances
      in.addData(rows((4L, "N", "O", 2.0, "2024-03-01"),
        (5L, "A", "F", 4.0, "2024-01-11")): _*)
      q.processAllAvailable()
      assert(servedTotals() == Map(
        ("N", "O") -> ((17.0, 3L)), ("R", "F") -> ((7.0, 1L)),
        ("A", "F") -> ((4.0, 1L))))
    } finally q.stop()
  }

  test("st21 streaming CAS ingest dedups shifted content across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // long APERIODIC deterministic content so CDC produces several
    // distinct chunks (periodic content would legitimately repeat
    // chunks and dedup against itself)
    val rnd = new scala.util.Random(77)
    val base = Seq.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
    val in = MemoryStream[(Long, String)]
    in.addData((1L, base))
    val q = StreamingJobs.streamingCasIngest(
        in.toDF().toDF("blob_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st21_out").start()
    try {
      q.processAllAvailable()
      val b1 = spark.sql("SELECT * FROM st21_out").collect()
      assert(b1.length > 2, s"CDC produced ${b1.length} chunks — content too short")
      // exactly ONE new flag per distinct chunk content
      assert(b1.groupBy(_.getString(1)).values
        .forall(g => g.count(_.getBoolean(3)) == 1),
        "each distinct chunk must be stored exactly once")
      // batch 2: the same content PREFIX-SHIFTED (blob 2) — CDC
      // boundaries resynchronize, so most chunks must hit the store;
      // blob 3 is fresh content and must be all-new
      val fresh = Seq.fill(300)(('A' + rnd.nextInt(26)).toChar).mkString
      in.addData((2L, "PREFIX-" + base), (3L, fresh))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM st21_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      val blob2 = rows.filter(_._1 == 2L)
      val knownBytes = blob2.filter(!_._4).map(_._3).sum
      val totalBytes = blob2.map(_._3).sum
      assert(knownBytes * 10 >= totalBytes * 5,
        s"shift-robustness lost: only $knownBytes/$totalBytes bytes deduped")
      val blob3 = rows.filter(_._1 == 3L)
      assert(blob3.nonEmpty && blob3.forall(_._4), "fresh content must be all-new")
      // the state answers across batches: a chunk hash seen in batch 1
      // is known in batch 2 even from a different blob
      val seen1 = b1.map(_.getString(1)).toSet
      assert(blob2.filter(c => seen1(c._2)).forall(!_._4),
        "chunk known from batch 1 flagged new in batch 2")
    } finally q.stop()
  }

  test("st23 streaming index stats equal the batch fold over all batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // quantizer: two fixed cells at (0,0) and (100,100)
    val cents = Seq((0, Array(0L, 0L)), (1, Array(100L, 100L)))
      .toDF("cell", "cent")
    val in = MemoryStream[(Long, Array[Long])]
    val vecs = in.toDF().toDF("vec_id", "x")
    val q = StreamingJobs.streamingIndexStats(vecs, cents, dim = 2)
      .writeStream.outputMode("complete").format("memory")
      .queryName("st23_out").start()
    try {
      in.addData((1L, Array(1L, 2L)), (2L, Array(99L, 98L)))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT cell, cnt FROM st23_out").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(r1 == Map(0 -> 1L, 1 -> 1L), s"batch-1 state wrong: $r1")
      // batch 2 includes an exact d2 TIE at (51,49): 51²+49² to both
      // cells — lexicographic (d2, cell) must break it to cell 0
      in.addData((3L, Array(2L, 1L)), (4L, Array(101L, 103L)),
        (5L, Array(51L, 49L)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT cell, cnt, vsum FROM st23_out").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Long](2).toList)))
        .toMap
      // the folded state must equal the batch computation over ALL
      // vectors: cell 0 ← (1,2),(2,1),(51,49); cell 1 ← (99,98),(101,103)
      assert(rows(0) == ((3L, List(54L, 52L))), s"cell 0 state: ${rows(0)}")
      assert(rows(1) == ((2L, List(200L, 201L))), s"cell 1 state: ${rows(1)}")
    } finally q.stop()
  }

  test("st24 streaming fuzzy decontam flags containment the verbatim tier misses") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // the eval item is 7 tokens — too short for any 15-token verbatim
    // window, so st14 would pass it; the fuzzy tier must not
    val evalText = "alpha beta gamma delta epsilon zeta eta"
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingJobs.streamFuzzyDecontam(docs, evalDocs)
      .writeStream.outputMode("append").format("memory")
      .queryName("st24_out").start()
    try {
      in.addData((1L, s"intro words $evalText trailing words"),
        (2L, "entirely unrelated prose about harbors and tides"))
      q.processAllAvailable()
      // cross-batch: the broadcast eval index serves later batches too
      in.addData((3L, s"another copy here $evalText and more"),
        (4L, "short"))
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, max_contain_bp, contaminated FROM st24_out")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      assert(out.keySet == Set(1L, 2L, 3L, 4L), s"one audit row per doc: $out")
      assert(out(1L)._2 && out(1L)._1 == 10000L,
        s"full containment must flag: ${out(1L)}")
      assert(out(3L)._2, s"cross-batch containment must flag: ${out(3L)}")
      assert(!out(2L)._2 && !out(4L)._2, s"clean docs flagged: $out")
    } finally q.stop()
  }

  test("st25 streaming skyline converges to the batch dominance rule") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingJobs.{PartPoint, FrontierRow}
    val in = MemoryStream[PartPoint]
    val q = StreamingJobs.streamingSkyline(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("st25_out").start()
    try {
      val b1 = Seq(PartPoint(1, 5, 100), PartPoint(2, 3, 50), PartPoint(3, 4, 80))
      val b2 = Seq(PartPoint(4, 6, 60)) // dominates 1 and 3, evicting both
      val b3 = Seq(PartPoint(4, 6, 60), // re-delivery: idempotent
        PartPoint(5, 6, 60)) // exact tie with 4 on both axes: co-survives
      val b4 = Seq(PartPoint(6, 1, 500)) // dominated: frontier unchanged
      Seq(b1, b2, b3, b4).foreach { b => in.addData(b); q.processAllAvailable() }
      val rows = spark.sql("SELECT * FROM st25_out").as[FrontierRow].collect()
      val lastV = rows.map(_.version).max
      assert(lastV == 3L, s"b4 must not bump the version: $lastV")
      val got = rows.filter(_.version == lastV)
        .map(r => (r.p_partkey, r.p_size, r.price_c)).toSet
      // brute-force skyline over everything ever fed
      val all = (b1 ++ b2 ++ b3 ++ b4).distinct
      val expect = all.filterNot(p => all.exists(o =>
        o.p_partkey != p.p_partkey && o.price_c <= p.price_c &&
          o.p_size >= p.p_size &&
          (o.price_c < p.price_c || o.p_size > p.p_size)))
        .map(p => (p.p_partkey, p.p_size, p.price_c)).toSet
      assert(got == expect, s"frontier mismatch: got $got expect $expect")
      // every emitted version is a monotone frontier sequence
      assert(rows.map(_.version).distinct.sorted.sameElements(1L to lastV))
      // ATTRIBUTE UPDATE (repriced part): same key, better price —
      // the stale frontier entry is evicted and the new point re-runs
      // admission, not silently ignored
      in.addData(Seq(PartPoint(2, 3, 40))); q.processAllAvailable()
      val v4 = spark.sql("SELECT * FROM st25_out").as[FrontierRow].collect()
      assert(v4.map(_.version).max == 4L, "update must bump the version")
      val f4 = v4.filter(_.version == 4L)
        .map(r => (r.p_partkey, r.p_size, r.price_c)).toSet
      assert(f4.contains((2L, 3L, 40L)) && !f4.exists(
        p => p._1 == 2L && p._3 == 50L),
        s"stale entry not replaced on update: $f4")
      // degrading update: the new attributes are dominated (4 is
      // cheaper AND bigger), so the part leaves the frontier entirely
      in.addData(Seq(PartPoint(2, 2, 70))); q.processAllAvailable()
      val v5 = spark.sql("SELECT * FROM st25_out").as[FrontierRow].collect()
      assert(v5.map(_.version).max == 5L, "eviction must bump the version")
      assert(!v5.filter(_.version == 5L).exists(_.p_partkey == 2L),
        "dominated update must not re-enter the frontier")
    } finally q.stop()
  }

  test("st28 streaming posting index matches the batch truncated index") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingJobs.PostingRow
    val in = MemoryStream[(Long, String)]
    val q = StreamingJobs.streamingPostingIndex(
        in.toDF().toDF("doc_id", "text"), keep = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("st28_out").start()
    try {
      in.addData((1L, "a a b"), (2L, "a b b b")); q.processAllAvailable()
      in.addData((3L, "a a a c"), (4L, "b")); q.processAllAvailable()
      def current(): Map[String, (Long, Set[(Long, Long, Int)])] =
        spark.sql("SELECT * FROM st28_out").as[PostingRow].collect()
          .groupBy(_.tok).map { case (t, rs) =>
            val df = rs.map(_.df).max // df is monotone: max = latest state
            t -> ((df, rs.filter(_.df == df)
              .map(r => (r.doc_id, r.tf, r.rk)).toSet))
          }
      val got = current()
      // batch truth with keep=2: per term, df over ALL docs, postings
      // = top-2 by (tf DESC, doc_id)
      assert(got("a") == ((3L, Set((3L, 3L, 1), (1L, 2L, 2)))),
        s"term a wrong: ${got("a")}")
      assert(got("b") == ((3L, Set((2L, 3L, 1), (1L, 1L, 2)))),
        s"term b wrong (df must count PRUNED doc 4): ${got("b")}")
      assert(got("c") == ((1L, Set((3L, 1L, 1)))), s"term c wrong: ${got("c")}")
      // exact re-delivery of kept postings: no state change, no emission
      val before = spark.sql("SELECT count(*) FROM st28_out").head().getLong(0)
      in.addData((3L, "a a a c")); q.processAllAvailable()
      val after = spark.sql("SELECT count(*) FROM st28_out").head().getLong(0)
      assert(after == before, "exact re-delivery must be silent")
    } finally q.stop()
  }

  test("st27 streaming DQ gate counts violations across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ordersDim = Seq(10L, 11L, 12L).toDF("o_orderkey")
    val in = MemoryStream[(Long, Double, Option[String])]
    val li = in.toDF().toDF("l_orderkey", "l_quantity", "l_shipdate")
    val q = StreamingJobs.streamingDqGate(li, ordersDim)
      .writeStream.outputMode("complete").format("memory")
      .queryName("st27_out").start()
    try {
      in.addData((10L, 5.0, Some("1995-01-01")), // clean
        (99L, 5.0, Some("1995-01-02"))) // orphan orderkey
      q.processAllAvailable()
      in.addData((11L, 500.0, Some("1995-01-03")), // range violation
        (12L, 5.0, None)) // missing shipdate
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM st27_out").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == Map(
        "lineitem_quantity_range" -> ((4L, 1L)),
        "lineitem_shipdate_complete" -> ((4L, 1L)),
        "lineitem_orderkey_resolves" -> ((4L, 1L))),
        s"DQ counters wrong: $got")
    } finally q.stop()
  }

  test("st26 streaming forecast equals the batch ev53 backtest") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingJobs.{DailyCount, ForecastRow}
    // the REAL daily frame, fed in day order split across two batches —
    // the stream is the batch backtest's walk-forward replayed live
    val daily = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("wd", dayofweek(col("day")))
      .collect().map(r => DailyCount(r.getDate(0), r.getInt(2), r.getLong(1)))
      .sortBy(_.day.toString)
    val in = MemoryStream[DailyCount]
    val q = StreamingJobs.streamingForecast(in.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("st26_out").start()
    try {
      val (b1, b2) = daily.splitAt(daily.length / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM st26_out").as[ForecastRow].collect()
        .map(r => r.day.toString -> ((r.n_events, r.forecast, r.abs_err)))
        .toMap
      val expect = ops.Events.ev53SeasonalNaive(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => r.getDate(0).toString ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expect, s"streaming != batch: " +
        s"only-stream ${got.keySet -- expect.keySet}, " +
        s"only-batch ${expect.keySet -- got.keySet}")
    } finally q.stop()
  }

  test("st29 purge gate blocks every tombstoned key, including replays") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.sources.VersionedCorpus
    val root = java.nio.file.Files
      .createTempDirectory("graft-st29").toString
    // history: publish, then purge 2 and 5 in SEPARATE batches — the
    // gate must union the whole ledger, not just the last record
    VersionedCorpus.publish(
      (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text"), root)
    assert(VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(2L))
      == Seq(1L))
    assert(VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(5L))
      == Seq(1L))
    assert(VersionedCorpus.tombstoneKeys(root) == Seq(2L, 5L))
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingJobs.streamingPurgeGate(docs, root)
      .writeStream.outputMode("append").format("memory")
      .queryName("st29_out").start()
    try {
      in.addData((1L, "a"), (2L, "purged"), (3L, "b"))
      q.processAllAvailable()
      // late replay of a purged key + fresh traffic in a later batch
      in.addData((5L, "purged too"), (2L, "replayed"), (7L, "new"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM st29_out")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 3L, 7L), s"gate let a tombstone through: $got")
      // gate ≡ the batch anti-join on the same ledger
      val batch = Seq(1L, 2L, 3L, 5L, 2L, 7L).toDF("doc_id")
        .join(VersionedCorpus.tombstoneKeys(root).toDF("doc_id"),
          Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("st31 domain cap admits exactly cap docs per source across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Long)]
    val docs = in.toDF().toDF("source", "doc_id")
    val q = StreamingJobs.streamingDomainCaps(docs, cap = 3L)
      .writeStream.outputMode("append").format("memory")
      .queryName("st31_out").start()
    try {
      in.addData(("mega", 1L), ("mega", 2L), ("tail", 10L))
      q.processAllAvailable()
      // the counter must survive the batch boundary
      in.addData(("mega", 3L), ("mega", 4L), ("mega", 5L), ("tail", 11L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT source, doc_id, admitted, n_seen FROM st31_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getBoolean(2), r.getLong(3)))).toMap
      assert(got.size == 7, s"one disposition per doc: $got")
      assert(got(("mega", 1L)) == ((true, 1L)))
      assert(got(("mega", 3L)) == ((true, 3L)),
        "third mega doc is the last admitted")
      assert(got(("mega", 4L)) == ((false, 4L)) &&
        got(("mega", 5L)) == ((false, 5L)),
        s"over-cap docs must be rejected: $got")
      assert(got(("tail", 10L))._1 && got(("tail", 11L))._1,
        "under-cap source must pass whole")
    } finally q.stop()
  }

  test("st30 bot gate flags the timer exactly and stays conservative after eviction") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def ats(sec: Long) = new Timestamp(t0.getTime + sec * 1000)
    var eid = 0L
    def mk(uid: Long, secs: Seq[Long]) = secs.map { sc =>
      eid += 1; Event(eid, ats(sc), uid, "view", 1.0)
    }
    val timer = mk(1L, (0 until 25).map(_ * 60L))
    val human = mk(2L, (0 until 25).map(i =>
      (0 until i).map(j => 30L + 7 * j).sum))
    val in = MemoryStream[Event]
    val q = StreamingJobs.streamingBotGate(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("st30_out").start()
    try {
      // split mid-stream: the cross-batch gap must ride lastSec state
      in.addData(timer.take(13) ++ human.take(13))
      q.processAllAvailable()
      in.addData(timer.drop(13) ++ human.drop(13))
      q.processAllAvailable()
      val fin = spark.sql(
        "SELECT user_id, n_gaps, modal_gap_s, modal_lb_ppm, exact, is_bot " +
          "FROM st30_out").collect()
        .groupBy(_.getLong(0))
        .map { case (u, rs) => u -> rs.maxBy(_.getLong(1)) }
      val t = fin(1L)
      assert(t.getLong(1) == 24L && t.getLong(2) == 60L &&
        t.getLong(3) == 1000000L && t.getBoolean(4) && t.getBoolean(5),
        s"timer row wrong: $t")
      val h = fin(2L)
      assert(h.getLong(1) == 24L && !h.getBoolean(4) && !h.getBoolean(5),
        s"human row wrong: $h")
      // agreement with the batch rule on the same traffic
      val dir = java.nio.file.Files
        .createTempDirectory("graft-st30").toString
      (timer ++ human).map(e =>
          (e.event_id, e.ts, e.user_id, e.event_type, e.value, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val ev = graft.ops.Events.ev54BotDetect(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
      assert(ev == Map(1L -> true, 2L -> false),
        s"batch twin disagrees: $ev")
    } finally q.stop()
  }

  test("st32 tombstones stop serving purged docs; composed st29 blocks replays") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingJobs.PostingRow
    // a REAL ledger for the composed st29 gate: doc 9 was purged before
    // this stream started (the upstream-replay scenario)
    val root = java.nio.file.Files.createTempDirectory("graft-st32").toString
    graft.sources.VersionedCorpus.publish(
      Seq((9L, "b b")).toDF("doc_id", "text"), root)
    graft.sources.VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(9L))
    val vocab = Seq("a", "b").toDF("tok")
    val in = MemoryStream[(Long, String, Boolean)]
    val ev = in.toDF().toDF("doc_id", "text", "tombstone")
    // compose: st29 gates DOC rows against the ledger (tombstone rows
    // pass through — they must reach the state they erase)
    val events = StreamingJobs
      .streamingPurgeGate(ev.filter(!col("tombstone")), root)
      .unionByName(ev.filter(col("tombstone")))
    val q = StreamingJobs.streamingPostingPurge(events, vocab, keep = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("st32_out").start()
    try {
      def rows() = spark.sql("SELECT * FROM st32_out").as[PostingRow]
        .collect().toSeq
      // batch 1: docs 1, 2 index; the replayed purged doc 9 is gated out
      in.addData((1L, "a a b", false), (2L, "a", false), (9L, "b b", false))
      q.processAllAvailable()
      val b1 = rows()
      assert(b1.toSet == Set(PostingRow("a", 2L, 1L, 2L, 1),
        PostingRow("a", 2L, 2L, 1L, 2), PostingRow("b", 1L, 1L, 1L, 1)),
        s"batch-1 index wrong (is the st29 gate leaking doc 9?): $b1")
      // batch 2: tombstone for doc 1 — term a re-emits without it, term
      // b empties and emits the rk=0 retraction marker
      in.addData((1L, "", true)); q.processAllAvailable()
      val b2 = rows().drop(b1.size)
      assert(b2.toSet == Set(PostingRow("a", 1L, 2L, 1L, 1),
        PostingRow("b", 0L, -1L, 0L, 0)),
        s"tombstone application wrong: $b2")
      assert(!rows().drop(b1.size).exists(_.doc_id == 1L),
        "a purged doc was served after its tombstone batch")
      // batch 3: the purged-at-rest doc 9 replays again — gated, silent
      val before = rows().size
      in.addData((9L, "b b", false)); q.processAllAvailable()
      assert(rows().size == before, "replay of a ledgered key re-entered")
    } finally q.stop()
  }

  test("st34 streamed graph folds compound exactly to the one-shot ss25") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft-st34").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-st34ck").toString
    val emb = graft.Tables.embeddings(spark, sf)
    val arrIds = graft.Tables.documents(spark, sf)
      .filter(col("source") === "src0").select(col("doc_id").as("vec_id"))
    val standing = emb.join(arrIds, Seq("vec_id"), "left_anti")
    val cent = graft.ops.Similarity.centroidsOf(standing)
    // the standing index state the stream folds into: one publish per line
    graft.sources.VersionedCorpus.publish(
      graft.ops.Similarity.knnJoinFrom(standing, cent),
      s"$root/knn_edges", Some("qid"))
    graft.sources.VersionedCorpus.publish(
      graft.ops.Similarity.knnAssigned(standing, cent)
        .select("vec_id", "cell"), s"$root/cells", Some("vec_id"))
    graft.sources.VersionedCorpus.publish(cent, s"$root/centroids",
      Some("cell"))
    val arr = emb.join(arrIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(arr.length >= 2, "need a splittable arrival batch")
    val (b1, b2) = arr.splitAt(arr.length / 2)
    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingJobs.streamingKnnMaintenance(
      in.toDF().toDF("vec_id", "embedding"), sf, root, ckpt)
    try {
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong))
        .toSet
      // exactness COMPOUNDS: two sequential folds ≡ ss25's one-shot
      // fold of the whole batch (same standing quantizer)
      val served = rows(graft.sources.VersionedCorpus
        .readLatest(spark, s"$root/knn_edges"))
      assert(served == rows(graft.ops.Similarity.ss25KnnUpsert(spark, sf)),
        "two streamed folds drift from the one-shot ss25")
      // one version per micro-batch; the pre-stream graph time-travels
      assert(graft.sources.VersionedCorpus
        .latestVersion(s"$root/knn_edges").contains(3L))
      assert(rows(graft.sources.VersionedCorpus
          .readAt(spark, s"$root/knn_edges", 1L)) ==
        rows(graft.ops.Similarity.knnJoinFrom(standing, cent)),
        "pre-stream graph version no longer time-travels")
      // the cells line advanced with the graph: every arrival assigned
      val cellsNow = graft.sources.VersionedCorpus
        .readLatest(spark, s"$root/cells")
      assert(cellsNow.count() == standing.count() + arr.length,
        "cells line must cover standing plus every arrival")
    } finally q.stop()
  }

  test("st36 streamed dedup folds compound exactly to the one-shot rebuilds") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-st36").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-st36ck").toString
    val cdir = java.nio.file.Files.createTempDirectory("graft-st36c").toString
    val docs = graft.Tables.documents(spark, sf)
    docs.filter(col("source") =!= "src0")
      .write.mode("overwrite").parquet(s"$cdir/documents.parquet")
    // the standing dedup artifact the stream folds into: one publish
    // per line, built on the standing-only corpus
    graft.sources.VersionedCorpus.publish(
      ops.Dedup.dd06DupClusters(spark, cdir), s"$root/clusters",
      Some("doc_id"))
    graft.sources.VersionedCorpus.publish(
      ops.Dedup.dd07KeepBest(spark, cdir), s"$root/keepers",
      Some("keeper_id"))
    graft.sources.VersionedCorpus.publish(
      ops.Dedup.dd28SafeKeepBest(spark, cdir), s"$root/safe_keepers",
      Some("keeper_id"))
    graft.sources.VersionedCorpus.publish(
      ops.Dedup.dd36KeeperPolicy(spark, cdir), s"$root/policy_keepers",
      Some("keeper_id"))
    val arrIds = docs.filter(col("source") === "src0")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(arrIds.length >= 2, "need a splittable arrival batch")
    val (b1, b2) = arrIds.splitAt(arrIds.length / 2)
    // arrivals land in the corpus table AHEAD of the fold (the job's
    // documented convention); the corpus grew on disk, so drop every
    // plan-keyed cache/memo built on the previous snapshot (the
    // Verify drain discipline) before the next fold reads it
    def land(ids: Array[Long]): Unit = {
      docs.filter(col("source") === "src0")
        .filter(col("doc_id").isin(ids: _*))
        .write.mode("append").parquet(s"$cdir/documents.parquet")
      graft.ops.CacheScope.unpersistAll()
      spark.catalog.refreshByPath(s"$cdir/documents.parquet")
    }
    val in = MemoryStream[Long]
    val q = StreamingJobs.streamingDedupMaintenance(
      in.toDF().toDF("doc_id"), cdir, root, ckpt)
    try {
      land(b1); in.addData(b1.toSeq: _*); q.processAllAvailable()
      land(b2); in.addData(b2.toSeq: _*); q.processAllAvailable()
      graft.ops.CacheScope.unpersistAll()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      // exactness COMPOUNDS: two sequential folds ≡ the one-shot
      // rebuilds on standing ∪ both batches, for all FOUR lines
      val rebuilds = Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "clusters" -> (() => ops.Dedup.dd06DupClusters(spark, cdir)),
        "keepers" -> (() => ops.Dedup.dd07KeepBest(spark, cdir)),
        "safe_keepers" -> (() => ops.Dedup.dd28SafeKeepBest(spark, cdir)),
        "policy_keepers" -> (() => ops.Dedup.dd36KeeperPolicy(spark, cdir)))
      rebuilds.foreach { case (line, rebuild) =>
        assert(rows(graft.sources.VersionedCorpus
            .readLatest(spark, s"$root/$line")) == rows(rebuild()),
          s"streamed $line drift from the one-shot rebuild")
        // one version per micro-batch; the standing lines time-travel
        assert(graft.sources.VersionedCorpus
          .latestVersion(s"$root/$line").contains(3L),
          s"$line must have advanced once per micro-batch")
      }
      // crash-replay idempotence: re-delivering an acknowledged batch
      // (its docs already clustered) must republish bit-identical
      // content — a duplicate version, never a duplicate fold
      val before = rebuilds.map { case (l, _) =>
        l -> rows(graft.sources.VersionedCorpus
          .readLatest(spark, s"$root/$l")) }.toMap
      in.addData(b2.toSeq: _*); q.processAllAvailable()
      rebuilds.foreach { case (line, _) =>
        assert(graft.sources.VersionedCorpus
          .latestVersion(s"$root/$line").contains(4L),
          s"replayed batch must publish a new $line version")
        assert(rows(graft.sources.VersionedCorpus
            .readLatest(spark, s"$root/$line")) == before(line),
          s"replayed batch changed $line content — fold not idempotent")
      }
    } finally q.stop()
  }

  test("st33 streamed lexicon equals build then pp40-patched lexicon exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingJobs.{LexStatRow, lexTotalsKey}
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keys = graft.ops.PurgeLedger.keys(spark, sf).toSet
    val in = MemoryStream[(Long, String, Boolean)]
    val q = StreamingJobs
      .streamingLexiconMaintenance(in.toDF().toDF("doc_id", "text", "tombstone"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st33_out").start()
    try {
      def snapshot(): (Map[String, Long], Long, Long) = {
        // last emission wins per key (the st25 snapshot discipline)
        val rows = spark.sql("SELECT * FROM st33_out").as[LexStatRow]
          .collect().zipWithIndex
        val last = rows.groupBy(_._1.tok).map { case (_, g) => g.maxBy(_._2)._1 }
        val tot = last.find(_.tok == lexTotalsKey).get
        (last.filter(r => r.tok != lexTotalsKey && !r.retracted)
          .map(r => r.tok -> r.df).toMap, tot.n_docs, tot.t_tokens)
      }
      // batch 1: the whole corpus arrives — state equals the BUILD
      in.addData(docs.map(d => (d._1, d._2, false)).toSeq: _*)
      q.processAllAvailable()
      val (df1, n1, t1) = snapshot()
      val lexBuild = graft.ops.Similarity.bm25Lexicon(spark, sf).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(df1 == lexBuild, "streamed df after ingest drifts from the build")
      assert(n1 == docs.length, s"doc total wrong: $n1")
      // batch 2: the ledgered purge arrives as TEXT-CARRYING
      // retractions (the CDC convention st33 requires for exactness);
      // the reconstructed lexicon must equal pp40's batch patch
      // bit-for-bit — idf/avgdl recompute row-locally from (df, N, T)
      in.addData(docs.filter(d => keys(d._1)).map(d => (d._1, d._2, true))
        .toSeq: _*)
      q.processAllAvailable()
      val (df2, n2, t2) = snapshot()
      val aC = 100L * t2 / n2
      val recon = df2.map { case (tok, df) => (tok, df,
        math.round(math.log((n2 * 2 + 2).toDouble / (df * 2 + 1).toDouble)
          * 1000000.0), aC) }.toSet
      val pp40 = graft.ops.Pipelines.pp40PatchLexicon(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(recon == pp40,
        s"streamed lexicon drifts from pp40's patch (${recon.size} vs ${pp40.size} terms)")
      assert(t1 > t2 && n2 == n1 - keys.size, "totals did not forget the batch")
    } finally q.stop()
  }

  test("st35 streaming dataset card tracks the batch pp48 counters") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, String, String)]
    val stream = in.toDF().toDF("doc_id", "text", "source")
    val q = StreamingJobs.streamingDatasetCard(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("st35_out").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM st35_out").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val batch = ops.Pipelines.pp48DatasetCard(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
      assert(got.keySet == batch.keySet, "per-source cards")
      // counters are exact across the plane split; the KLL p50 is the
      // sketch's estimate — assert its RANK sits within ±5% of the
      // median (k=200 is exact below compaction; the bound covers both)
      val lens: Map[String, Array[Long]] =
        graft.Tables.documents(spark, "/root/testdata/sf0.001")
          .selectExpr("source",
            "CAST(size(split(trim(text), ' ')) AS BIGINT) AS len")
          .collect().groupBy(_.getString(0))
          .map { case (s, rs) => s -> rs.map(_.getLong(1)).sorted }
      got.foreach { case (src, (nDocs, tok, p50, nEn, nQ)) =>
        val (bDocs, bTok, bP50, bEn, bQ) = batch(src)
        assert(nDocs == bDocs && tok == bTok && nEn == bEn && nQ == bQ,
          s"$src counters drift: got ${got(src)}, batch ${batch(src)}")
        // tie-safe rank band: strictly-below mass ≤ 55%, at-or-below
        // mass ≥ 45% (duplicated lengths make count(≤v)/n overshoot)
        val xs = lens(src)
        val below = xs.count(_ < p50).toDouble / xs.length
        val atOrBelow = xs.count(_ <= p50).toDouble / xs.length
        assert(below <= 0.55 && atOrBelow >= 0.45,
          s"$src p50 rank band ($below, $atOrBelow) off the median " +
            s"(est $p50, exact $bP50)")
      }
    } finally q.stop()
  }

  test("st37 streaming SRM board equals batch ev61 and ignores replays") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val in = MemoryStream[(String, Long)]
    val stream = in.toDF().toDF("event_type", "user_id")
    val q = StreamingJobs.streamingSrmBoard(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("st37_out").start()
    try {
      def board() = spark.sql("SELECT * FROM st37_out").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      // interleaved halves so (type, user) pairs REPEAT across batches
      // — the dedup state, not batch boundaries, must carry distinctness
      val (b1, b2) = rows.zipWithIndex.partition(_._2 % 2 == 0)
      in.addData(b1.map(_._1).toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.map(_._1).toIndexedSeq: _*); q.processAllAvailable()
      val streamed = board()
      val batch = graft.ops.Events.ev61SrmCheck(spark, sf).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(streamed == batch,
        s"streamed board drifts from batch ev61: $streamed vs $batch")
      // crash-replay: re-delivering the first half changes nothing
      in.addData(b1.map(_._1).toIndexedSeq: _*); q.processAllAvailable()
      assert(board() == batch, "replayed batch moved the board")
    } finally q.stop()
  }
}
