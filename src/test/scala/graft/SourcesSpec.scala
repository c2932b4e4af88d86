package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips + the physical properties the writers claim:
  * partition pruning for partitionBy, exchange-free joins for bucketBy. */
class SourcesSpec extends SparkTestBase {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("csv round-trip preserves rows and values") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Sources.writeCsv(li, s"$tmp/li_csv")
    val back = Sources.readCsv(spark, s"$tmp/li_csv", li.schema)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).collect()(0).getDouble(0) ==
      li.agg(sum("l_quantity")).collect()(0).getDouble(0))
  }

  test("json-lines round-trip preserves rows") {
    val docs = Tables.documents(spark, sf)
    Sources.writeJsonLines(docs, s"$tmp/docs_json")
    val back = Sources.readJsonLines(spark, s"$tmp/docs_json", docs.schema)
    assert(back.count() == docs.count())
  }

  test("orc round-trip preserves rows; filter and pruning reach the scan") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    Sources.writeOrc(li, s"$tmp/li_orc")
    val back = Sources.readOrc(spark, s"$tmp/li_orc")
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).collect()(0).getDouble(0) ==
      li.agg(sum("l_quantity")).collect()(0).getDouble(0))
    // the vectorized ORC scan must receive the predicate and read only
    // the projected columns — same contract the parquet reader gets
    val q = back.filter(col("l_returnflag") === "R").select("l_orderkey")
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters: [IsNotNull(l_returnflag), " +
      "EqualTo(l_returnflag,R)]"), s"ORC pushdown missing:\n$desc")
    assert(desc.contains("ReadSchema: struct<l_orderkey:bigint,l_returnflag:string>")
      || desc.contains("ReadSchema: struct<l_orderkey:int,l_returnflag:string>"),
      s"ORC column pruning missing:\n$desc")
  }

  test("FAILFAST readers reject malformed input instead of nulling it") {
    import java.nio.file.{Files, Paths}
    val dir = s"$tmp/bad_json"
    new java.io.File(dir).mkdirs()
    Files.writeString(Paths.get(s"$dir/part-0.json"),
      """{"doc_id": 1, "text": "ok"}
        |{"doc_id": "not-a-number", "text": 12}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val ex = intercept[org.apache.spark.SparkException] {
      Sources.readJsonLines(spark, dir, schema).collect()
    }
    assert(ex.getMessage.contains("MALFORMED_RECORD") ||
      ex.getCause != null)
  }

  test("partitioned write enables partition pruning") {
    val o = Tables.orders(spark, sf)
    Sources.writePartitioned(o, s"$tmp/orders_part", "o_orderstatus")
    val pruned = Sources.readParquet(spark, s"$tmp/orders_part")
      .filter(col("o_orderstatus") === "F")
    // pruning shows up as a partition filter in the scan, and the scan
    // must read strictly fewer files than the full dataset has
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("o_orderstatus"))
    assert(pruned.count() == o.filter(col("o_orderstatus") === "F").count())
  }

  /** The in-memory metastore is fresh each JVM but the warehouse dir
    * persists — clear leftovers from previous runs before (re)writing. */
  private def dropBucketedTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new java.io.File(s"/tmp/graft-warehouse/$name")
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("bucketed table aggregates on the bucket key without a shuffle") {
    if (!spark.catalog.tableExists("orders_b")) {
      dropBucketedTable("orders_b")
      Sources.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_custkey", 4)
    }
    val agg = spark.table("orders_b").groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed agg:\n$plan")
    assert(agg.count() ==
      Tables.orders(spark, sf).select("o_custkey").distinct().count())
  }

  test("zValue matches the reference Morton bit interleave") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(a: Long, b: Long): Long = (0 until 16)
      .map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
      .reduce(_ | _)
    val pts = for (a <- 0L to 40L; b <- Seq(0L, 1L, 7L, 255L, 65535L)) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), Sources.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b), s"zValue($a,$b)")
    }
  }

  test("z-ordered layout tightens per-file bounding boxes vs 1-D sort") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf).select(col("o_custkey"),
      datediff(date_trunc("day", col("o_orderdate")).cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
    Sources.writeZOrdered(o, s"$tmp/z_orders", "o_custkey", "day")
    o.repartitionByRange(8, col("day")).sortWithinPartitions(col("day"))
      .write.mode("overwrite").parquet(s"$tmp/lin_orders")
    // expected files scanned by a uniform point query on each column =
    // Σ_files span_fraction. A 1-D sort is perfect on its own column
    // and useless (full span every file) on the other; z-order must
    // beat it on the COMBINED two-column pruning power.
    def spans(p: String): (Double, Double) = {
      val per = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("o_custkey"), max("o_custkey"), min("day"), max("day"))
            .collect()(0)
          ((r.getLong(1) - r.getLong(0) + 1).toDouble,
            (r.getLong(3) - r.getLong(2) + 1).toDouble)
        }
      (per.map(_._1).sum, per.map(_._2).sum)
    }
    val (zCust, zDay) = spans(s"$tmp/z_orders")
    val (lCust, lDay) = spans(s"$tmp/lin_orders")
    val custRange = o.agg(max("o_custkey")).collect()(0).getLong(0).toDouble
    val dayRange = o.agg(max("day") - min("day")).collect()(0).getLong(0).toDouble
    val zHits = zCust / custRange + zDay / dayRange
    val lHits = lCust / custRange + lDay / dayRange
    assert(zHits < lHits,
      s"z-order combined pruning $zHits not better than 1-D sort $lHits")
  }

  test("range-ordered layout yields disjoint file ranges and a usable manifest") {
    val dir = s"$tmp/range_orders"
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Sources.writeRangeOrdered(o, dir, "o_orderkey", nFiles = 6)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_RANGES.json")))
    val entries = """\{"file":"([^"]+)","min":(-?\d+),"max":(-?\d+),"rows":(\d+)\}""".r
      .findAllMatchIn(manifest)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4).toLong))
      .toSeq
    assert(entries.length == 6, manifest)
    assert(entries.map(_._4).sum == o.count())
    // total order: consecutive file ranges never overlap
    entries.map(e => (e._2, e._3)).sortBy(_._1).sliding(2).foreach {
      case Seq((_, mxA), (mnB, _)) =>
        assert(mxA < mnB, s"overlapping file ranges in $manifest")
      case _ =>
    }
    // manifest-driven pruning: a point lookup overlaps exactly one file,
    // and that file really contains the row
    val probe = o.agg(max("o_orderkey")).collect()(0).getLong(0) / 2
    val cands = entries.filter(e => e._2 <= probe && probe <= e._3)
    assert(cands.length <= 1, s"point $probe hits ${cands.length} files")
    cands.foreach { c =>
      val hit = spark.read.parquet(s"$dir/${c._1}")
        .filter(col("o_orderkey") === probe).count()
      assert(hit == o.filter(col("o_orderkey") === probe).count())
    }
  }

  test("readRangePruned opens only overlapping files yet answers exactly") {
    val dir = s"$tmp/range_pruned"
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Sources.writeRangeOrdered(o, dir, "o_orderkey", nFiles = 6)
    val mx = o.agg(max("o_orderkey")).collect()(0).getLong(0)
    val (lo, hi) = (mx / 3, mx / 3 + mx / 10)
    val pruned = Sources.readRangePruned(spark, dir, "o_orderkey", lo, hi)
    val expect = o.filter(col("o_orderkey").between(lo, hi))
    assert(pruned.count() == expect.count() && pruned.count() > 0,
      "pruned read must answer exactly")
    // cents grid: double-sum order differs between the two plans
    def cents(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")))
        .collect()(0).getLong(0)
    assert(cents(pruned) == cents(expect))
    val all = spark.read.parquet(dir).inputFiles.length
    assert(pruned.inputFiles.length < all,
      s"no files were pruned: ${pruned.inputFiles.length} of $all")
    // a predicate outside every range reads nothing at all
    val none = Sources.readRangePruned(spark, dir, "o_orderkey",
      mx + 10, mx + 20)
    assert(none.count() == 0 && none.inputFiles.isEmpty
      || none.count() == 0, "out-of-range read must be empty")
    // and the equi-depth shard layout prunes through the same reader
    val dir2 = s"$tmp/range_pruned_ed"
    Sources.writeEquiDepth(o, dir2, "o_orderkey", nShards = 6)
    val p2 = Sources.readRangePruned(spark, dir2, "o_orderkey", lo, hi)
    assert(p2.count() == expect.count(), "equi-depth pruned read wrong")
    assert(p2.inputFiles.length <
      spark.read.parquet(dir2).inputFiles.length, "no shards pruned")
  }

  test("pp01 pipeline writes split-partitioned training data") {
    val out = ops.Pipelines.pp01TrainingPipeline(spark, sf)
    graft.sources.Sources.writePartitioned(out, s"$tmp/training", "split")
    val back = graft.sources.Sources.readParquet(spark, s"$tmp/training")
    assert(back.count() == out.count())
    val splits = back.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.contains("train") && splits.subsetOf(Set("train", "val", "test")))
  }

  test("bucketed tables join without a shuffle") {
    Seq("orders_b", "customer_b").foreach(dropBucketedTable)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    Sources.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 4)
    Sources.writeBucketed(c.select("c_custkey", "c_name"), "customer_b", "c_custkey", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    // disable broadcast so the join would need a shuffle if buckets didn't align
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join:\n$plan")
      assert(joined.count() == o.join(c, col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("graft-manifest DSv2 sink publishes atomically with an audit manifest") {
    val dir = s"$tmp/manifest_sink"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").repartition(4)
    docs.write.format("graft-manifest").option("path", dir)
      .mode("append").save()
    // manifest totals reconcile with the input — the audit contract
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_MANIFEST.json")))
    assert(manifest.contains(s""""n_rows":${docs.count()}"""), manifest)
    assert(manifest.contains(""""n_files":4"""), manifest)
    // exactly the published files — no temp leftovers visible
    val files = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(files.count(_.endsWith(".jsonl")) == 4, files.toString)
    assert(new java.io.File(s"$dir/_temp").listFiles.isEmpty,
      "temp attempt files must be cleaned up on publish")
    // the JSONL content reads back to the same values
    val back = spark.read.schema(docs.schema).json(
      s"$dir/part-*.jsonl")
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).collect()(0).getLong(0) ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    // overwrite truncates the previous publish, not doubles it
    docs.limit(10).repartition(1).write.format("graft-manifest")
      .option("path", dir).mode("overwrite").save()
    val m2 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_MANIFEST.json")))
    assert(m2.contains(""""n_rows":10""") && m2.contains(""""n_files":1"""), m2)
  }

  test("graft-synth DSv2 source reads deterministically at any parallelism") {
    val a = spark.read.format("graft-synth")
      .option("rows", "500").option("parts", "8").load()
    val b = spark.read.format("graft-synth")
      .option("rows", "500").option("parts", "3").load()
    assert(a.count() == 500 && b.count() == 500)
    // parallelism must not change content (generation keyed on doc_id)
    assert(a.orderBy("doc_id").collect().map(_.toString()).toSeq ==
      b.orderBy("doc_id").collect().map(_.toString()).toSeq)
    val r = a.filter(col("doc_id") === 42L).collect()(0)
    assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length)
  }

  test("graft-synth pushes doc_id ranges and prunes columns and partitions") {
    val df = spark.read.format("graft-synth")
      .option("rows", "1000").option("parts", "10").load()
      .filter(col("doc_id") >= 900L).select("doc_id", "lang")
    assert(df.count() == 100)
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("range=[900,999]"),
      s"doc_id filter not pushed into the source:\n$scanDesc")
    assert(scanDesc.contains("cols=doc_id,lang") &&
      !scanDesc.contains("text"),
      s"column pruning did not reach the source:\n$scanDesc")
    // 10 ranges of 100 ids: only the last overlaps [900, 999]
    assert(df.rdd.getNumPartitions == 1,
      s"expected pruned single partition, got ${df.rdd.getNumPartitions}")
  }

  test("graft-synth pushes LIMIT into the generated range") {
    val df = spark.read.format("graft-synth")
      .option("rows", "100000").option("parts", "16").load()
      .limit(7)
    assert(df.count() == 7)
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("range=[0,6]") && scanDesc.contains("limited=true"),
      s"LIMIT not pushed into the source:\n$scanDesc")
    // limit composes with a pushed filter: range narrows first, then clamps
    val df2 = spark.read.format("graft-synth")
      .option("rows", "100000").option("parts", "16").load()
      .filter(col("doc_id") >= 500L).limit(3)
    val desc2 = df2.queryExecution.executedPlan.collectLeaves().head.toString
    assert(desc2.contains("range=[500,502]"),
      s"LIMIT did not compose with the pushed filter:\n$desc2")
  }

  test("graft-synth reported statistics drive an auto-broadcast join") {
    // a 200-row filtered synth side reports ~tens of KB post-pushdown —
    // far under the 10 MB broadcast threshold — so Catalyst must pick a
    // BroadcastHashJoin with NO broadcast() hint from us
    val synth = spark.read.format("graft-synth")
      .option("rows", "1000000").option("parts", "16").load()
      .filter(col("doc_id") < 200L).select("doc_id", "lang")
    val docs = Tables.documents(spark, sf)
    val joined = docs.join(synth, Seq("doc_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"post-pushdown stats should auto-broadcast the synth side:\n$plan")
    assert(joined.count() > 0)
  }

  test("merged-schema read unions evolved parquet schemas, null-filling old files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(s"$dir/p=2")
    val df = Sources.readParquetMergedSchema(spark, dir)
    assert(df.columns.toSet == Set("id", "v1", "v2", "p"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")), "old file must null-fill")
    assert(rows(1).getDouble(rows(1).fieldIndex("v2")) == 9.5)
    // the default (non-merging) reader sees only the first footer's schema
    val plain = Sources.readParquet(spark, dir)
    assert(plain.columns.toSet.subsetOf(Set("id", "v1", "v2", "p")))
  }

  test("q44's fact-fact join itself plans with zero exchanges") {
    // broadcast disabled so a bucket misalignment would surface as a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.ops.Relational.q44BucketedJoin(spark, sf)
      // the AQE wrapper hides exec nodes from collect() — assert on the
      // plan text: both scans bucketed, a sort-merge join, and the ONLY
      // exchange is the final (tiny) per-priority aggregation ABOVE it
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size == 2,
        s"both sides must scan bucketed:\n$plan")
      val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!belowJoin.contains("Exchange"),
        s"exchange under the bucketed join:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("versioned corpus: read-at-v1 is bit-exact after v2 publishes") {
    import graft.sources.VersionedCorpus
    val root = s"$tmp/versioned"
    val v1Data = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").filter(col("doc_id") % 3 =!= 0)
    val v1Rows = v1Data.collect().toSet
    val v1 = VersionedCorpus.publish(v1Data, root)
    assert(v1 == 1L)
    // v2: a changed snapshot (drops some docs, rewrites others' text)
    val v2Data = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(" [v2]")).as("text"))
      .filter(col("doc_id") % 5 =!= 0)
    val v2Rows = v2Data.collect().toSet
    val v2 = VersionedCorpus.publish(v2Data, root)
    assert(v2 == 2L && VersionedCorpus.versions(root) == Seq(1L, 2L))
    // time travel: v1 reproduces the ORIGINAL snapshot bit-exactly,
    // latest sees v2; the manifests' audit counts reconcile
    val atV1 = VersionedCorpus.readAt(spark, root, 1L)
    assert(atV1.collect().toSet == v1Rows, "read-at-v1 drifted after v2")
    assert(VersionedCorpus.readLatest(spark, root).collect().toSet == v2Rows)
    assert(VersionedCorpus.manifestRows(spark, root, 1L) == v1Rows.size.toLong)
    assert(VersionedCorpus.manifestRows(spark, root, 2L) == v2Rows.size.toLong)
    // the read plans only v1's own files — the manifest IS the index,
    // no directory listing of the whole data root
    val scanned = atV1.queryExecution.executedPlan.toString
    assert(scanned.contains("v1") && !scanned.contains("v2"),
      s"read-at-v1 must touch only v1 files:\n$scanned")
  }

  test("versioned corpus: soft delete, GDPR purge rewrites history, gc frees orphans") {
    import graft.sources.VersionedCorpus
    val root = s"$tmp/versioned-retention"
    val base = Tables.documents(spark, sf).select("doc_id", "source", "text")
    VersionedCorpus.publish(base.filter(col("doc_id") < 300), root)
    VersionedCorpus.publish(base.filter(col("doc_id") < 400), root)
    // SOFT delete: v3 excludes the rows, history still shows them
    val v3 = VersionedCorpus.deleteWhere(spark, root, col("doc_id") === 7L)
    assert(v3 == 3L)
    assert(VersionedCorpus.readAt(spark, root, 3L)
      .filter(col("doc_id") === 7L).count() == 0L)
    assert(VersionedCorpus.readAt(spark, root, 2L)
      .filter(col("doc_id") === 7L).count() == 1L, "soft delete must not rewrite history")
    // GDPR purge: doc 11 vanishes from EVERY version, the rest of each
    // snapshot is preserved exactly, manifests reconcile
    val before = (1L to 3L).map(v =>
      v -> VersionedCorpus.readAt(spark, root, v).collect().toSet).toMap
    val rewritten = VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(11L))
    assert(rewritten == Seq(1L, 2L, 3L), s"all versions held doc 11: $rewritten")
    (1L to 3L).foreach { v =>
      val now = VersionedCorpus.readAt(spark, root, v).collect().toSet
      assert(now == before(v).filterNot(_.getLong(0) == 11L),
        s"purge at v$v must remove ONLY the purged key")
      assert(VersionedCorpus.manifestRows(spark, root, v) == now.size.toLong,
        s"manifest count stale after purge at v$v")
    }
    // the audit tombstone exists and names the purge
    val tombs = new java.io.File(root, "_tombstones").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(tombs.length == 1)
    val trec = new String(java.nio.file.Files.readAllBytes(tombs.head.toPath))
    assert(trec.contains("\"keys\":[11]") && trec.contains("doc_id"), trec)
    // a purge of an absent key touches nothing
    assert(VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(999999L)).isEmpty)
    // GC: pre-purge dirs + a planted failed-publish orphan are freed;
    // every version still reads back exactly afterwards
    val orphan = new java.io.File(new java.io.File(root, "_data"), "v99")
    orphan.mkdirs()
    java.nio.file.Files.write(new java.io.File(orphan, "junk.parquet").toPath,
      Array[Byte](1, 2, 3))
    val (nDirs, bytes) = VersionedCorpus.gc(spark, root)
    assert(nDirs == 4L && bytes > 0L, // v1, v2, v3 pre-purge dirs + v99
      s"gc freed $nDirs dirs / $bytes bytes")
    (1L to 3L).foreach { v =>
      assert(VersionedCorpus.readAt(spark, root, v).collect().toSet ==
        before(v).filterNot(_.getLong(0) == 11L), s"v$v unreadable after gc")
    }
    assert(VersionedCorpus.gc(spark, root) == ((0L, 0L)), "gc must be idempotent")
  }

  test("equi-depth layout balances shards under value skew and indexes them") {
    import graft.sources.Sources
    val dir = s"$tmp/equidepth"
    // heavily value-skewed column: value k carries ~2k+1 rows (floor of
    // sqrt) — the distribution where a sampled range partitioner can
    // misplace boundaries; the exact histogram cannot
    val data = spark.range(10000).select(col("id"),
      expr("CAST(floor(sqrt(id)) AS BIGINT)").as("v"))
    Sources.writeEquiDepth(data, dir, "v", nShards = 8)
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_RANGES.json")))
    val entries = body.stripPrefix("[").stripSuffix("]").split("\\},")
      .map { e =>
        def f(k: String) =
          raw""""$k":(-?\d+)""".r.findFirstMatchIn(e).get.group(1).toLong
        (f("min"), f("max"), f("rows"))
      }.sortBy(_._1)
    assert(entries.length == 8, s"expected 8 shards: $body")
    assert(entries.map(_._3).sum == 10000L, "rows lost in the layout")
    // equi-depth: every shard within ideal ± the heaviest single value
    // (a value never splits across shards — the q68 balance bound)
    val maxValueCnt = 199L
    entries.foreach { case (mn, mx, n) =>
      assert(n >= 1250 - maxValueCnt && n <= 1250 + maxValueCnt,
        s"shard [$mn,$mx] unbalanced: $n rows")
    }
    // disjoint, ordered, gap-free coverage of the value domain
    entries.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"overlapping shard ranges: $a $b")
    }
    // the index prunes: a point predicate overlaps exactly one shard
    val probe = entries(3)._1
    assert(entries.count(e => e._1 <= probe && probe <= e._2) == 1,
      "point lookup must resolve to one shard")
    // read-back integrity incl. the hive shard column
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000L &&
      back.select("v").collect().map(_.getLong(0)).sorted.sameElements(
        data.select("v").collect().map(_.getLong(0)).sorted))
  }

  test("equi-depth layout stays balanced on a NEAR-UNIQUE high-cardinality column") {
    // the 100×-scale case the op advertises (a doc_id/timestamp-shaped
    // column): |distinct values| ≈ n, so a distinct-value histogram
    // would BE the corpus. The bounded-grid derivation instead
    // pre-buckets onto the fixed 65536-cell grid (span 200000 → bucket
    // width 4), and the only driver-side merge is the ≤65536-row
    // partial — balance is exact up to one bucket's mass (4 rows here).
    import graft.sources.Sources
    val dir = s"$tmp/equidepth_hicard"
    val n = 200000L
    val data = spark.range(n).select(col("id"), col("id").as("v"))
    Sources.writeEquiDepth(data, dir, "v", nShards = 8)
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_RANGES.json")))
    val entries = body.stripPrefix("[").stripSuffix("]").split("\\},")
      .map { e =>
        def f(k: String) =
          raw""""$k":(-?\d+)""".r.findFirstMatchIn(e).get.group(1).toLong
        (f("min"), f("max"), f("rows"))
      }.sortBy(_._1)
    assert(entries.length == 8, s"expected 8 shards: $body")
    assert(entries.map(_._3).sum == n, "rows lost in the layout")
    val maxBucketMass = 4L // grid width ceil(200000/65536) = 4, 1 row/value
    entries.foreach { case (mn, mx, rows) =>
      assert(rows >= n / 8 - maxBucketMass && rows <= n / 8 + maxBucketMass,
        s"shard [$mn,$mx] unbalanced on near-unique column: $rows rows")
    }
    entries.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._1, s"overlapping shard ranges: $a $b")
    }
    // the pruned reader still answers exactly through the index
    val got = Sources.readRangePruned(spark, dir, "v", 99990L, 100010L)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (99990L to 100010L).toSeq, "pruned read wrong")
  }

  test("upserted knn edges publish as the next graph version") {
    import graft.sources.{IndexArtifacts, VersionedCorpus}
    val root = s"$tmp/idx_upsert"
    val v1 = VersionedCorpus.publish(
      ops.Similarity.ss18KnnJoin(spark, sf), s"$root/knn_edges", Some("qid"))
    assert(v1 == 1L)
    val v2 = IndexArtifacts.publishUpsertedKnn(spark, sf, root)
    assert(v2 == 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).toString.toLong)).toSet
    assert(rows(VersionedCorpus.readAt(spark, s"$root/knn_edges", 2L)) ==
      rows(ops.Similarity.ss25KnnUpsert(spark, sf)),
      "published upserted graph drifts from ss25")
    assert(rows(VersionedCorpus.readAt(spark, s"$root/knn_edges", 1L)) ==
      rows(ops.Similarity.ss18KnnJoin(spark, sf)),
      "pre-upsert graph version no longer time-travels")
  }

  test("upserted lexical index serves the full corpus exactly") {
    import graft.sources.{IndexArtifacts, VersionedCorpus}
    val root = s"$tmp/idx_lex_upsert"
    // v1 = the STANDING index (built without the src0 arrivals)
    val standingDocs = Tables.documents(spark, sf)
      .filter(col("source") =!= "src0")
    VersionedCorpus.publish(
      ops.Similarity.bm25Postings(ops.Similarity.termFreqsOf(standingDocs)),
      s"$root/postings", Some("doc_id"))
    VersionedCorpus.publish(
      standingDocs.select(col("doc_id"),
          explode(split(trim(col("text")), " ")).as("tok"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("dl")),
      s"$root/doclens", Some("doc_id"))
    VersionedCorpus.publish(
      spark.range(0).selectExpr("'' AS tok", "id AS df", "id AS idf_micro",
        "id AS a_c"),
      s"$root/lexicon")
    // the arrival re-point: all three lines advance together
    val vs = IndexArtifacts.publishUpsertedIndex(spark, sf, root)
    assert(vs == Map("postings" -> 2L, "lexicon" -> 2L, "doclens" -> 2L),
      s"unexpected versions: $vs")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // a reader of the upserted index serves EXACTLY the full-corpus
    // build — the upsert-side twin of the publishPurgedIndex proof
    assert(rows(IndexArtifacts.ss21FromArtifacts(spark, sf, root)) ==
      rows(ops.Similarity.ss21Bm25Topk(spark, sf)),
      "post-upsert reader drifts from the full-corpus rebuild")
    assert(rows(IndexArtifacts.read(spark, root, "lexicon")) ==
      rows(ops.Similarity.bm25Lexicon(spark, sf)),
      "upserted lexicon drifts from the full-corpus lexicon")
  }

  test("upserted dedup artifacts advance together and invalidate safe_keepers") {
    import graft.sources.{IndexArtifacts, VersionedCorpus}
    val root = s"$tmp/idx_dedup_upsert"
    VersionedCorpus.publish(ops.Dedup.dd06DupClusters(spark, sf),
      s"$root/clusters", Some("doc_id"))
    VersionedCorpus.publish(ops.Dedup.dd07KeepBest(spark, sf),
      s"$root/keepers", Some("keeper_id"))
    VersionedCorpus.publish(ops.Dedup.dd28SafeKeepBest(spark, sf),
      s"$root/safe_keepers", Some("keeper_id"))
    val vs = IndexArtifacts.publishUpsertedDedup(spark, sf, root)
    assert(vs == Map("clusters" -> 2L, "keepers" -> 2L),
      s"unexpected versions: $vs")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(IndexArtifacts.dd07FromArtifacts(spark, root)) ==
      rows(ops.Pipelines.pp43ClusterUpsert(spark, sf)),
      "upserted keepers drift from pp43")
    // an arrival can weld safe sub-clusters like a purge splits them:
    // the unpatchable line fails closed until a rebuild publishes
    val thrown = intercept[IllegalStateException] {
      IndexArtifacts.dd28FromArtifacts(spark, root)
    }
    assert(thrown.getMessage.contains("invalidated"))
  }

  test("equi-depth layout survives null keys and full-Long-range spans") {
    import graft.sources.Sources
    // null keys: routed to shard 0 (still listed in _RANGES so the
    // shard is readable), kept OUT of the boundary statistic — the
    // pre-fix code NPE'd on the null bucket group
    val dirN = s"$tmp/equidepth_nulls"
    val withNulls = spark.range(1000).select(col("id"),
      when(col("id") % 10 === 0, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))
    Sources.writeEquiDepth(withNulls, dirN, "v", nShards = 4)
    val back = spark.read.parquet(dirN)
    assert(back.count() == 1000L, "rows lost with null keys")
    assert(back.filter(col("v").isNull).select("shard")
      .distinct().collect().map(_.get(0).toString).toSeq == Seq("0"),
      "null keys must all land in shard 0")
    // range reads stay exact (nulls never match a range predicate)
    val got = Sources.readRangePruned(spark, dirN, "v", 500L, 520L)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (500L to 520L).filter(_ % 10 != 0).toSeq,
      "pruned read wrong on null-bearing layout")
    // full-Long-range span: values straddling ±Long extremes used to
    // wrap (x - mn) and the span arithmetic, producing negative
    // buckets and OVERLAPPING shard ranges; the decimal path must
    // keep buckets monotone and ranges disjoint
    val dirX = s"$tmp/equidepth_extremes"
    val extremes = spark.range(4000).select(col("id"),
      when(col("id") % 2 === 0, lit(Long.MinValue) + col("id"))
        .otherwise(lit(Long.MaxValue) - col("id")).as("v"))
    Sources.writeEquiDepth(extremes, dirX, "v", nShards = 4)
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dirX, "_RANGES.json")))
    val entries = body.stripPrefix("[").stripSuffix("]").split("\\},")
      .map { e =>
        def f(k: String) =
          raw""""$k":(-?\d+)""".r.findFirstMatchIn(e).get.group(1).toLong
        (f("min"), f("max"), f("rows"))
      }.sortBy(_._1)
    assert(entries.map(_._3).sum == 4000L, "rows lost at extreme span")
    entries.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 < b._1, s"overlapping shard ranges at extremes: $a $b")
      case _ => ()
    }
    // both value families land, and each shard's recorded range is
    // truthful against its actual contents
    val byShard = spark.read.parquet(dirX)
      .groupBy(col("shard")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(byShard.map(_._1).toSeq == entries.map(_._1).toSeq &&
      byShard.map(_._2).toSeq == entries.map(_._2).toSeq,
      "_RANGES drifts from the actual shard contents at extreme span")
  }

  test("compaction plan covers every file once, packs under target, is deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // a fragmented layout: 12 single-row files (the incremental-ingest
    // small-file pathology) plus one already-large file
    (1 to 12).foreach { i =>
      Seq((i.toLong, s"doc $i")).toDF("id", "t")
        .coalesce(1).write.mode("append").parquet(s"$dir/data")
    }
    spark.range(200000).toDF("id").withColumn("t", lit("x"))
      .coalesce(1).write.mode("append").parquet(s"$dir/data")
    val target = 4096L
    val plan = Sources.compactionPlan(spark, s"$dir/data", target).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val listed = plan.map(_._2)
    assert(listed.distinct.length == listed.length, "a file appears twice")
    assert(listed.length == 13, s"must cover all 13 data files: ${listed.length}")
    // group totals stay under target except single-oversize groups
    plan.groupBy(_._1).foreach { case (g, fs) =>
      val tot = fs.map(_._3).sum
      assert(tot <= target || fs.length == 1,
        s"group $g overpacked: $tot bytes in ${fs.length} files")
    }
    // fewer groups than files = the plan actually compacts
    assert(plan.map(_._1).distinct.length < 13, "no compaction achieved")
    // deterministic: a second planning pass emits the identical plan
    val again = Sources.compactionPlan(spark, s"$dir/data", target).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(plan.toSeq == again.toSeq, "plan not deterministic")
    // the plan executes: merging one group reproduces its rows
    val g0 = plan.filter(_._1 == plan.head._1).map(_._2)
    val merged = spark.read.parquet(g0: _*)
    assert(merged.count() > 0)
  }

  test("purgeKeys prunes stat-bearing versions without reading any data") {
    import graft.sources.VersionedCorpus
    val root = s"$tmp/vc_prune"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    VersionedCorpus.publish(docs, root, Some("doc_id"))                    // v1: [0, 499]
    VersionedCorpus.publish(docs.filter(col("doc_id") < 100), root,
      Some("doc_id"))                                                      // v2: [0, 99]
    assert(VersionedCorpus.manifestStats(root, 1L).contains(("doc_id", 0L, 499L)))
    assert(VersionedCorpus.manifestStats(root, 2L).contains(("doc_id", 0L, 99L)))
    // a batch entirely outside every version's range must not launch a
    // single Spark job — the probe is driver-side manifest arithmetic
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rewritten =
        VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(1000000L))
      Thread.sleep(1500) // let trailing listener events drain
      assert(rewritten.isEmpty, s"out-of-range purge rewrote $rewritten")
      assert(jobs.get == 0, s"pruned purge still launched ${jobs.get} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // a batch inside v1's range but outside v2's rewrites exactly v1
    assert(VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(200L))
      == Seq(1L))
    assert(VersionedCorpus.readAt(spark, root, 1L)
      .filter(col("doc_id") === 200L).count() == 0)
    // the rewrite refreshed the stats, so pruning keeps working on the
    // new generation
    val s1 = VersionedCorpus.manifestStats(root, 1L)
    assert(s1.exists(t => t._1 == "doc_id" && t._2 == 0L && t._3 == 499L),
      s"stats lost through the rewrite: $s1")
    // and a batch hitting both versions rewrites both
    assert(VersionedCorpus.purgeKeys(spark, root, "doc_id", Seq(50L))
      == Seq(1L, 2L))
  }

  test("reconcile watcher republishes the exact lexicon only past the drift bound") {
    import graft.sources.{IndexArtifacts, VersionedCorpus}
    val root = s"$tmp/reconcile"
    VersionedCorpus.publish(
      ops.Similarity.bm25Lexicon(spark, sf), s"$root/lexicon")
    val drift = ops.PurgeLedger.keys(spark, sf).size.toLong
    assert(drift > 0, "planted ledger must carry tombstones")
    // below threshold: the watcher runs NO job
    spark.conf.set(IndexArtifacts.maxDriftConf, (drift + 1).toString)
    try assert(IndexArtifacts.reconcileLexicon(spark, sf, root).isEmpty,
      "below-threshold drift must not trigger a publish")
    finally spark.conf.unset(IndexArtifacts.maxDriftConf)
    assert(VersionedCorpus.latestVersion(s"$root/lexicon").contains(1L))
    // above threshold (default 0): one exact reconcile publish — the
    // served lexicon equals pp40's patch, which is hash-proven ≡ a
    // rebuild on the purged corpus, so reader idf is exact again
    assert(IndexArtifacts.reconcileLexicon(spark, sf, root).contains(2L))
    val served = IndexArtifacts.read(spark, root, "lexicon")
      .collect().map(_.toSeq).toSet
    val exact = ops.Pipelines.pp40PatchLexicon(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == exact, "reconciled lexicon drifts from the exact patch")
    // drift consumed: the next watch tick runs no job and publishes nothing
    assert(IndexArtifacts.reconcileLexicon(spark, sf, root).isEmpty)
    assert(VersionedCorpus.latestVersion(s"$root/lexicon").contains(2L))
  }

  test("dataset card publishes as a versioned line and time-travels") {
    import graft.sources.{IndexArtifacts, VersionedCorpus}
    val root = s"$tmp/card"
    assert(IndexArtifacts.publishDatasetCard(spark, sf, root) == 1L)
    val served = IndexArtifacts.read(spark, root, "dataset_card")
      .collect().map(_.toSeq).toSet
    val fresh = ops.Pipelines.pp48DatasetCard(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == fresh, "served card drifts from the batch op")
    // a republish advances the line; v1 stays readable (time travel)
    assert(IndexArtifacts.publishDatasetCard(spark, sf, root) == 2L)
    val v1 = VersionedCorpus.readAt(spark, s"$root/dataset_card", 1L)
      .collect().map(_.toSeq).toSet
    assert(v1 == served, "v1 must stay bit-identical after a republish")
  }

  test("full-family reconcile watcher advances all lines together past the bound") {
    import graft.sources.{IndexArtifacts, VersionedCorpus}
    val root = s"$tmp/reconcile_all"
    IndexArtifacts.publishAll(spark, sf, root)
    val drift = ops.PurgeLedger.keys(spark, sf).size.toLong
    assert(drift > 0, "planted ledger must carry tombstones")
    // below threshold: no line moves
    spark.conf.set(IndexArtifacts.maxDriftConf, (drift + 1).toString)
    try assert(IndexArtifacts.reconcileIndex(spark, sf, root).isEmpty,
      "below-threshold drift must not trigger a publish")
    finally spark.conf.unset(IndexArtifacts.maxDriftConf)
    // above threshold: ONE publishPurgedIndex — every line advances to
    // v2 in the same reconcile, so composed readers never straddle an
    // exact/drifted boundary
    val vs = IndexArtifacts.reconcileIndex(spark, sf, root)
    assert(vs.nonEmpty && vs.get.values.forall(_ == 2L),
      s"lines did not advance together: $vs")
    // sampled exactness: the served lexicon is pp40's patch bit-for-bit
    val served = IndexArtifacts.read(spark, root, "lexicon")
      .collect().map(_.toSeq).toSet
    val exact = ops.Pipelines.pp40PatchLexicon(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == exact, "reconciled lexicon drifts from the exact patch")
    // drift consumed at the root marker: next tick is a no-op and the
    // per-line lexicon marker's cadence is independent (still absent)
    assert(IndexArtifacts.reconcileIndex(spark, sf, root).isEmpty)
    assert(VersionedCorpus.latestVersion(s"$root/lexicon").contains(2L))
  }

  test("MaintenanceRunner.tick: zero jobs below drift, every line + card above") {
    import graft.sources.{IndexArtifacts, MaintenanceRunner}
    val root = s"$tmp/tick"
    IndexArtifacts.publishAll(spark, sf, root)
    val drift = ops.PurgeLedger.keys(spark, sf).size.toLong
    assert(drift > 0, "planted ledger must carry tombstones")
    // below drift: the whole tick is driver-side marker/ledger reads —
    // ZERO Spark jobs, nothing published
    spark.conf.set(IndexArtifacts.maxDriftConf, (drift + 1).toString)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val quiet = MaintenanceRunner.tick(spark, sf, root)
      Thread.sleep(1500) // let trailing listener events drain
      assert(quiet == MaintenanceRunner.Tick(None, None, None, None),
        s"quiet tick did work: $quiet")
      assert(jobs.get == 0, s"quiet tick launched ${jobs.get} jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.unset(IndexArtifacts.maxDriftConf)
    }
    // above drift (default 0): one tick advances every purge-patchable
    // line together, the lexicon cadence no-ops (the full sweep
    // advanced its marker too), and the card publishes LAST
    val t1 = MaintenanceRunner.tick(spark, sf, root)
    assert(t1.reconciled.nonEmpty &&
      t1.reconciled.get.values.forall(_ == 2L),
      s"lines did not advance together: ${t1.reconciled}")
    assert(t1.lexicon.isEmpty,
      "lexicon cadence must no-op right after the full sweep")
    assert(t1.card.contains(1L), s"card not published: ${t1.card}")
    // served reader ≡ rebuild bit-for-bit (postings = pp37's patch,
    // the hash-proven rebuild twin)
    val served = IndexArtifacts.read(spark, root, "postings")
      .collect().map(_.toSeq).toSet
    val rebuilt = ops.Pipelines.pp37PatchPostings(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == rebuilt, "tick-served postings drift from rebuild")
    // drift consumed: the next tick is quiet again
    assert(MaintenanceRunner.tick(spark, sf, root) ==
      MaintenanceRunner.Tick(None, None, None, None))
    // fold tick: ALL THREE dedup lines advance together off the LOADED
    // standing side (safe_keepers via pp49's affected-surface patch —
    // the round-11 retirement of the fail-closed asymmetry), and the
    // card re-describes the folded corpus
    val t3 = MaintenanceRunner.tick(spark, sf, root, foldArrival = true)
    assert(t3.folded.nonEmpty &&
      t3.folded.get.keySet == Set("clusters", "keepers", "safe_keepers",
        "policy_keepers"),
      s"fold did not advance all four dedup lines: ${t3.folded}")
    assert(!t3.rebuildAdvised, s"default ceiling must never advise: $t3")
    assert(t3.card.contains(2L), s"fold tick must republish the card: $t3")
    // the folded safe/policy lines serve EXACTLY the full-corpus
    // rebuilds (patch ≡ rebuild, read back through the fail-closed
    // readers — the marker story must not block freshly-patched lines)
    val servedSafe = IndexArtifacts.dd28FromArtifacts(spark, root)
      .collect().map(_.toSeq).toSet
    val rebuiltSafe = ops.Dedup.dd28SafeKeepBest(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(servedSafe == rebuiltSafe,
      "fold-served safe_keepers drift from the full dd28 rebuild")
    val servedPolicy = IndexArtifacts.dd36FromArtifacts(spark, root)
      .collect().map(_.toSeq).toSet
    val rebuiltPolicy = ops.Dedup.dd36KeeperPolicy(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(servedPolicy == rebuiltPolicy,
      "fold-served policy_keepers drift from the full dd36 rebuild")
  }

  test("fold gate: all-dup batch skips, fresh batch folds, ceiling advises rebuild") {
    import spark.implicits._
    import graft.sources.{IndexArtifacts, MaintenanceRunner}
    // standing corpus (src1) + an ARRIVAL (src0) that duplicates it
    // verbatim: the doc KEY (md5 of normalized text) sets coincide, so
    // sk15's KMV sketches are bit-identical and est_new = 0 exactly
    val standing = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => s"g${i}t$j").mkString(" "))
    }
    val dupBatch = standing.map { case (id, t) => (1000L + id, t) }
    def writeCorpus(dir: String, batch: Seq[(Long, String)]): Unit = {
      (standing.map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
        ++ batch.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) })
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // publishAll's vector lines need SOME embeddings table; the gate
      // under test only reads documents, so the sf one serves as-is
      Tables.embeddings(spark, sf)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    // keep the purge-reconcile cadence quiet (its own test covers it)
    // so the only moving part here is the fold gate
    spark.conf.set(IndexArtifacts.maxDriftConf, "1000000")
    try {
      val dupDir = java.nio.file.Files.createTempDirectory("graft-dup").toString
      writeCorpus(dupDir, dupBatch)
      val root1 = s"$tmp/fold_gate_dup"
      IndexArtifacts.publishAll(spark, dupDir, root1)
      val calls0 = ops.Dedup.propagationCalls.get
      val quiet = MaintenanceRunner.tick(spark, dupDir, root1,
        foldArrival = true)
      assert(quiet.folded.isEmpty && !quiet.rebuildAdvised,
        s"all-dup batch must not fold: $quiet")
      assert(ops.Dedup.propagationCalls.get == calls0,
        "the skipped fold still ran a convergence loop")
      // fresh batch: genuinely new docs → the fold runs
      val freshBatch = (0 until 40).map { i =>
        (1000L + i, (0 until 30).map(j => s"f${i}t$j").mkString(" "))
      }
      val freshDir =
        java.nio.file.Files.createTempDirectory("graft-fresh").toString
      writeCorpus(freshDir, freshBatch)
      val root2 = s"$tmp/fold_gate_fresh"
      IndexArtifacts.publishAll(spark, freshDir, root2)
      val t = MaintenanceRunner.tick(spark, freshDir, root2,
        foldArrival = true)
      assert(t.folded.nonEmpty, s"fresh batch must fold: $t")
      // ceiling: the same fresh batch under a 1-doc rebuild threshold
      // is too new to patch — no fold, rebuild advised
      spark.conf.set(MaintenanceRunner.foldRebuildNewDocsConf, "1")
      try {
        val adv = MaintenanceRunner.tick(spark, freshDir, root2,
          foldArrival = true)
        assert(adv.folded.isEmpty && adv.rebuildAdvised,
          s"ceiling must advise rebuild instead of folding: $adv")
      } finally spark.conf.unset(MaintenanceRunner.foldRebuildNewDocsConf)
    } finally spark.conf.unset(IndexArtifacts.maxDriftConf)
  }

  test("artifact-root TVFs serve published lines and fail closed") {
    import graft.sources.IndexArtifacts
    val root = s"$tmp/tvf_root"
    IndexArtifacts.publishAll(spark, sf, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(s"SELECT * FROM graft_keepers_from('$root')")) ==
      rows(IndexArtifacts.dd07FromArtifacts(spark, root)))
    assert(rows(spark.sql(s"SELECT * FROM graft_clusters_from('$root')")) ==
      rows(IndexArtifacts.dd06FromArtifacts(spark, root)))
    assert(rows(spark.sql(
        s"SELECT * FROM graft_bm25_topk_from('$sf', '$root')")) ==
      rows(IndexArtifacts.ss21FromArtifacts(spark, sf, root)))
    assert(rows(spark.sql(
        s"SELECT * FROM graft_hybrid_topk_from('$sf', '$root')")) ==
      rows(IndexArtifacts.ss24FromArtifacts(spark, sf, root)))
    assert(rows(spark.sql(
        s"SELECT * FROM graft_safe_keepers_from('$root')")) ==
      rows(IndexArtifacts.read(spark, root, "safe_keepers")))
    assert(rows(spark.sql(
        s"SELECT * FROM graft_policy_keepers_from('$root')")) ==
      rows(IndexArtifacts.read(spark, root, "policy_keepers")))
    assert(rows(spark.sql(
        s"SELECT * FROM graft_training_set_from('$sf', '$root')")) ==
      rows(IndexArtifacts.pp50FromArtifacts(spark, sf, root)))
    // the two-arg family validates its arity/literal contract loudly
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25_topk_from('$root')").collect()
    }
    assert(bad.getMessage.contains("graft_bm25_topk_from") ||
      Option(bad.getCause).exists(_.getMessage
        .contains("graft_bm25_topk_from")), s"wrong arity error: $bad")
    // fail-closed: after an upsert invalidates safe_keepers, the TVF
    // inherits dd28FromArtifacts' refusal to serve the stale line
    IndexArtifacts.publishUpsertedDedup(spark, sf, root)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_safe_keepers_from('$root')").collect()
    }
    assert(chain(ex).exists(_.isInstanceOf[IllegalStateException]),
      s"expected the fail-closed IllegalStateException, got $ex")
  }

  test("index artifacts publish once, serve bit-identical reads, and re-point on purge") {
    import graft.sources.IndexArtifacts
    val root = s"$tmp/idx"
    val versions = IndexArtifacts.publishAll(spark, sf, root)
    assert(versions.keySet == IndexArtifacts.names.toSet &&
      versions.values.forall(_ == 1L), s"unexpected versions: $versions")
    // two reader sessions load bit-identical postings without recompute
    def postingsOf(s: org.apache.spark.sql.SparkSession) =
      IndexArtifacts.read(s, root, "postings").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val firstRead = postingsOf(spark)
    val secondRead = postingsOf(spark.newSession())
    assert(firstRead == secondRead && firstRead.nonEmpty)
    // the artifact equals the fresh build (same session → bit-stable)
    val fresh = ops.Similarity.bm25Postings(
        ops.Similarity.termFreqs(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(firstRead == fresh, "published postings drift from the build")
    // served queries equal their build-side twins exactly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(IndexArtifacts.ss21FromArtifacts(spark, sf, root)) ==
      rows(ops.Similarity.ss21Bm25Topk(spark, sf)), "ss21 from artifact drifts")
    assert(rows(IndexArtifacts.ss05FromArtifacts(spark, sf, root)) ==
      rows(ops.Similarity.ss05IvfTopk(spark, sf)), "ss05 from artifact drifts")
    assert(rows(IndexArtifacts.ss22FromArtifacts(spark, sf, root)) ==
      rows(ops.Similarity.ss22NswTopk(spark, sf)), "ss22 from artifact drifts")
    // the flagship hybrid serves END TO END from artifacts: a fresh
    // reader session (no temp state from the build) fuses the walk
    // tier (knn_edges + cells) with the BM25 tier (postings + lexicon
    // + doclens) and matches the build-side ss24 query-for-query
    assert(rows(IndexArtifacts.ss24FromArtifacts(spark.newSession(), sf, root))
      == rows(ops.Similarity.ss24HybridWalk(spark, sf)),
      "ss24 from artifacts drifts from the build-side hybrid")
    // the dedup trio: keepers load bit-identical across sessions with
    // no recompute, and match the build-side chain exactly
    val k1 = rows(IndexArtifacts.dd07FromArtifacts(spark, root))
    assert(k1 == rows(IndexArtifacts.dd07FromArtifacts(spark.newSession(), root))
      && k1 == rows(ops.Dedup.dd07KeepBest(spark, sf)) && k1.nonEmpty,
      "keepers artifact drifts across sessions or from the build")
    assert(rows(IndexArtifacts.dd06FromArtifacts(spark, root)) ==
      rows(ops.Dedup.dd06DupClusters(spark, sf)), "clusters artifact drifts")
    assert(rows(IndexArtifacts.dd28FromArtifacts(spark, root)) ==
      rows(ops.Dedup.dd28SafeKeepBest(spark, sf)),
      "safe_keepers artifact drifts")
    assert(rows(IndexArtifacts.dd36FromArtifacts(spark, root)) ==
      rows(ops.Dedup.dd36KeeperPolicy(spark, sf)),
      "policy_keepers artifact drifts")
    // pp50 served production-shape: policy + clusters loaded, training
    // set ≡ the in-query build query-for-query
    assert(rows(IndexArtifacts.pp50FromArtifacts(spark, sf, root)) ==
      rows(ops.Pipelines.pp50PolicyTrainingSet(spark, sf)),
      "pp50 from artifacts drifts from the in-query build")
    // purge propagation re-points the postings artifact: v2 = pp37's
    // patched index; v1 stays byte-identical (time travel intact)
    val v2 = IndexArtifacts.publishPatchedPostings(spark, sf, root)
    assert(v2 == 2L)
    val patched = ops.Pipelines.pp37PatchPostings(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val v2read = graft.sources.VersionedCorpus
      .readAt(spark, s"$root/postings", 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v2read == patched, "re-pointed artifact drifts from the patch")
    val v1read = graft.sources.VersionedCorpus
      .readAt(spark, s"$root/postings", 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v1read == firstRead, "pre-purge version no longer time-travels")
    // full lexical re-point: after publishPurgedIndex, a reader session
    // serving ss21 from the artifacts gets EXACTLY what a from-scratch
    // rebuild on the survivors-only corpus serves (query side included:
    // a purged query doc's queries vanish on both paths)
    val purged = IndexArtifacts.publishPurgedIndex(spark, sf, root)
    assert(purged.keySet ==
      Set("postings", "lexicon", "doclens", "cells", "knn_edges",
        "clusters", "keepers", "safe_keepers", "policy_keepers")
      && purged("postings") == 3L && purged("lexicon") == 2L,
      s"unexpected re-point versions: $purged")
    // the dedup re-points serve pp39's patch (keepers) and pp45's
    // (safe_keepers — the purge path no longer fail-closes)
    assert(rows(graft.sources.VersionedCorpus
        .readAt(spark, s"$root/keepers", purged("keepers"))) ==
      rows(ops.Pipelines.pp39PatchClusters(spark, sf)),
      "re-pointed keepers drift from pp39's patch")
    assert(rows(IndexArtifacts.dd28FromArtifacts(spark, root)) ==
      rows(ops.Pipelines.pp45PatchSafe(spark, sf)),
      "re-pointed safe_keepers drift from pp45's patch")
    assert(IndexArtifacts.dd36FromArtifacts(spark, root)
        .collect().map(_.toSeq).toSet ==
      ops.Pipelines.pp51PatchPolicy(spark, sf)
        .collect().map(_.toSeq).toSet,
      "re-pointed policy_keepers drift from pp51's patch")
    val keys = ops.PurgeLedger.keys(spark, sf)
    val sdir = java.nio.file.Files
      .createTempDirectory("graft-idx-purged").toString
    Tables.documents(spark, sf).filter(!col("doc_id").isin(keys: _*))
      .write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    Tables.embeddings(spark, sf).filter(!col("vec_id").isin(keys: _*))
      .write.mode("overwrite").parquet(s"$sdir/embeddings.parquet")
    assert(rows(IndexArtifacts.ss21FromArtifacts(spark, sdir, root)) ==
      rows(ops.Similarity.ss21Bm25Topk(spark, sdir)),
      "post-purge reader drifts from the survivors-only rebuild")
    // the graph tier is no longer rebuild-class: the re-pointed
    // knn_edges is ss26's patch, a post-purge walk reader serves the
    // composition over the patched graph + survivor cells, and NO
    // tombstoned doc_id appears anywhere in what it serves
    val knnV2 = graft.sources.VersionedCorpus
      .readAt(spark, s"$root/knn_edges", 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val patchedKnn = ops.Similarity.ss26KnnPurge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knnV2 == patchedKnn, "re-pointed knn_edges drifts from ss26")
    val served = IndexArtifacts.ss22FromArtifacts(spark, sdir, root).collect()
    val tombSet = keys.toSet
    assert(served.nonEmpty &&
      !served.exists(r => tombSet.contains(r.getLong(0)) ||
        tombSet.contains(r.getLong(1))),
      "post-purge walk reader still serves tombstoned doc_ids")
    val expectedWalk = ops.Similarity.nswWalkTopFrom(spark, sdir, 5,
      ops.Similarity.ss26KnnPurge(spark, sf),
      ops.Similarity.cellAssignments(spark, sf)
        .select(col("vec_id"), col("cell"))
        .filter(!col("vec_id").isin(keys: _*))).collect()
    assert(served.map(_.toSeq).toSet == expectedWalk.map(_.toSeq).toSet,
      "post-purge walk reader drifts from the patched-graph walk")
    // the re-pointed safe_keepers equal dd28 REBUILT on the survivors
    // corpus — pp45's patch ≡ rebuild, observed at the serving layer
    assert(rows(IndexArtifacts.dd28FromArtifacts(spark, root)) ==
      rows(ops.Dedup.dd28SafeKeepBest(spark, sdir)),
      "post-purge safe_keepers drift from the survivors-only rebuild")
    // pp50 post-purge: the training set served from the re-pointed
    // policy + clusters lines over the survivor corpus equals the
    // in-query build on that corpus (the composition of two proven
    // patch ≡ rebuild facts: pp51 ≡ dd36-on-survivors and the purged
    // clusters ≡ dd06-on-survivors), and no tombstoned doc_id leaks
    // into any split
    val pp50Post = IndexArtifacts.pp50FromArtifacts(spark, sdir, root)
      .collect()
    assert(pp50Post.map(_.toSeq).toSet ==
      ops.Pipelines.pp50PolicyTrainingSet(spark, sdir)
        .collect().map(_.toSeq).toSet,
      "post-purge pp50 reader drifts from the survivors-only rebuild")
    assert(pp50Post.nonEmpty &&
      !pp50Post.exists(r => tombSet.contains(r.getLong(0))),
      "post-purge pp50 reader serves a tombstoned doc_id")
  }

  test("snapshot reads pin composed lines to completed-publish states") {
    import graft.sources.IndexArtifacts
    val root = java.nio.file.Files
      .createTempDirectory("graft-snap").toString
    val d = "/root/testdata/sf0.001"
    IndexArtifacts.publishAll(spark, d, root)
    // the marker pins every line at its just-published version
    val snap1 = IndexArtifacts.snapshotVersions(root).get
    assert(snap1.keySet == IndexArtifacts.names.toSet &&
      snap1.values.forall(_ == 1L), s"snapshot off: $snap1")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    def withSnapshotReads[T](body: => T): T = {
      spark.conf.set(IndexArtifacts.snapshotReadsConf, "true")
      try body finally spark.conf.unset(IndexArtifacts.snapshotReadsConf)
    }
    // quiesced root: snapshot reads ≡ latest reads
    val latest = rows(IndexArtifacts.pp50FromArtifacts(spark, d, root))
    assert(withSnapshotReads(
      rows(IndexArtifacts.pp50FromArtifacts(spark, d, root))) == latest,
      "snapshot read drifts from latest on a quiesced root")
    // TORN state: advance the clusters line alone, bypassing the
    // producers (as a reader racing a half-finished publish would see
    // it) — every doc into one bogus cluster, so the composed result
    // is GUARANTEED to change (all non-keepers become removals)
    val c1 = IndexArtifacts.read(spark, root, "clusters")
    graft.sources.VersionedCorpus.publish(
      graft.Tables.documents(spark, d).select(col("doc_id"),
        lit(999999L).as("cluster_id")),
      s"$root/clusters", Some("doc_id"))
    val torn = rows(IndexArtifacts.pp50FromArtifacts(spark, d, root))
    assert(torn != latest,
      "the planted tear must be observable through latest reads")
    // snapshot reads still serve the last COMPLETED publish, atomically
    assert(withSnapshotReads(
      rows(IndexArtifacts.pp50FromArtifacts(spark, d, root))) == latest,
      "snapshot read leaked the torn pair")
    // a real producer completes → the snapshot advances to the new
    // consistent state and snapshot reads follow it
    IndexArtifacts.publishUpsertedDedup(spark, d, root)
    val snap2 = IndexArtifacts.snapshotVersions(root).get
    assert(snap2("clusters") == 3L && snap2("keepers") == 2L,
      s"snapshot did not advance with the producer: $snap2")
    assert(withSnapshotReads(
        rows(IndexArtifacts.read(spark, root, "keepers"))) ==
      rows(IndexArtifacts.read(spark, root, "keepers")),
      "snapshot read lags a completed producer")
    // fail-closed: a line missing from the marker must throw, not
    // silently fall back to latest
    val bare = java.nio.file.Files
      .createTempDirectory("graft-snap-bare").toString
    graft.sources.VersionedCorpus.publish(c1, s"$bare/clusters",
      Some("doc_id"))
    val err = intercept[IllegalStateException](withSnapshotReads(
      IndexArtifacts.read(spark, bare, "clusters")))
    assert(err.getMessage.contains("_SNAPSHOT.json"),
      s"wrong failure mode: ${err.getMessage}")
  }

  test("a completing producer never pins another line's torn state") {
    // ADVICE r11: a multi-line producer that crashes mid-publish
    // leaves one line advanced with no snapshot update; the NEXT
    // producer call on any other line must not re-derive that torn
    // latest into the marker — pins merge (previous snapshot + the
    // completing call's own advances), so the torn line keeps its
    // last completed-publish pin
    import graft.sources.IndexArtifacts
    val root = java.nio.file.Files
      .createTempDirectory("graft-snap-merge").toString
    val d = "/root/testdata/sf0.001"
    IndexArtifacts.publishAll(spark, d, root)
    // simulate the crash: safe_keepers advanced out-of-band (as
    // foldDedupLines would have, dying before its partner lines and
    // before the snapshot write)
    graft.sources.VersionedCorpus.publish(
      IndexArtifacts.read(spark, root, "safe_keepers"),
      s"$root/safe_keepers", Some("keeper_id"))
    // an unrelated single-line producer completes
    IndexArtifacts.publishUpsertedKnn(spark, d, root)
    val snap = IndexArtifacts.snapshotVersions(root).get
    assert(snap("knn_edges") == 2L,
      s"the completing call's own line must advance: $snap")
    assert(snap("safe_keepers") == 1L,
      s"the crashed publish's half-advanced line leaked into the snapshot: $snap")
  }
}
