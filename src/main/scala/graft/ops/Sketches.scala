package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation (SURVEY.md §2) — the 100 TB
  * answer to "exact is too expensive": mergeable, fixed-size sketches
  * that partial-aggregate map-side, so the shuffle carries one sketch
  * per group per task instead of the raw values. Sketches built on
  * engine-internal hashes (HLL/GK/KLL/CMS/bloom) cannot hash-match a
  * DuckDB oracle, so those are rows-only entries whose error bounds
  * are asserted against the exact operators in the specs; sk06's KMV
  * — portable hash, integer-exact estimate — is fully hash-checked.
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

  /** sk06: KMV theta-sketch SET ALGEBRA — audience-overlap estimation:
    * distinct purchasers, distinct viewers, their union (a direct
    * sketch estimate — KMV unions by keeping the k smallest hashes of
    * both, the property HLL lacks) and their intersection by
    * inclusion–exclusion. All three sketches build in ONE pass via
    * null-skipping conditional children (`kmv(CASE WHEN segment THEN
    * user END)`); fixed O(k)=128 state per sketch partial-aggregates
    * map-side. Promoted from rows-only: the portable md5 hash and the
    * integer-exact ⌊(k−1)·2⁶⁰/kth⌋ estimate replay bit-exactly in the
    * DuckDB oracle — k is sized so the gate corpus (150 distinct
    * users at sf0.01 > k) exercises the ESTIMATOR branch, not just
    * the exact small-set path; error vs the exact distinct counts
    * stays spec-bounded (SE ≈ 1/√k ≈ 9%). */
  def sk06ThetaSets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Literal, Or}
    val e = Tables.events(s, d).select(col("event_type"), col("user_id"))
    val out = e.queryExecution.analyzed.output
    val et = out.find(_.name == "event_type").get
    val uid = out.find(_.name == "user_id").get
    def seg(types: String*) = {
      val cond = types.map(t => EqualTo(et, Literal(t)):
        org.apache.spark.sql.catalyst.expressions.Expression).reduce(Or(_, _))
      org.apache.spark.sql.graft.GraftDataset.column(
        graft.functions.KmvSketchAgg(CaseWhen(Seq((cond, uid)), None), k = 128)
          .toAggregateExpression())
    }
    e.agg(
        seg("purchase").as("est_a"),
        seg("view").as("est_b"),
        seg("purchase", "view").as("est_u"))
      .select(
        col("est_a").as("est_purchasers"),
        col("est_b").as("est_viewers"),
        col("est_u").as("est_union"),
        (col("est_a") + col("est_b") - col("est_u")).as("est_overlap"))
  }

  /** sk15: KMV set DIFFERENCE — dd23 answers "which batch docs are
    * new" EXACTLY with its bucket-restricted pair join; sk15 is the
    * sketch answer to the planning question one step earlier: HOW
    * MANY of the arriving batch's distinct documents are genuinely
    * new vs already standing — the number that sizes the ingest
    * (dedup work, storage growth, index-upsert cost) BEFORE any join
    * runs. Three KMV sketches in ONE pass (batch = src0 / standing =
    * rest / union = all, sk06's null-skipping conditional-child
    * shape) over a portable 60-bit doc identity (md5 of the
    * normalized text — dd01's key on the integer grid); overlap by
    * inclusion–exclusion, est_new = union − standing (an estimate
    * difference: it can undershoot or even go negative within
    * sketch noise — the spec bounds it against the exact twin).
    * Fixed O(k)=128 state per sketch, map-side partials, fully
    * hash-checked like sk06. */
  def sk15ThetaDiff(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Literal, Not}
    val docs = Tables.documents(s, d).select(col("source"),
      expr("CAST(conv(substring(md5(lower(trim(text))), 1, 15), 16, 10) AS BIGINT)")
        .as("key"))
    val out = docs.queryExecution.analyzed.output
    val src = out.find(_.name == "source").get
    val key = out.find(_.name == "key").get
    def kmv(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.graft.GraftDataset.column(
        graft.functions.KmvSketchAgg(e, k = 128).toAggregateExpression())
    val isBatch = EqualTo(src, Literal("src0"))
    docs.agg(
        kmv(CaseWhen(Seq((isBatch, key)), None)).as("est_batch"),
        kmv(CaseWhen(Seq((Not(isBatch): org.apache.spark.sql.catalyst.expressions.Expression, key)), None))
          .as("est_standing"),
        kmv(key).as("est_union"))
      .select(col("est_batch"), col("est_standing"), col("est_union"),
        (col("est_batch") + col("est_standing") - col("est_union"))
          .as("est_overlap"),
        (col("est_union") - col("est_standing")).as("est_new"))
  }

  /** sk05: Bloom-filter semi-join pre-filter — the membership sketch:
    * high-value order custkeys fold into one bloom (BloomFilterAgg),
    * which broadcasts and probes every customer (BloomMightContain).
    * The audit row compares bloom passes against exact membership:
    * the pattern that prunes a 100 TB probe table down before the
    * real join, at the cost of a spec-bounded false-positive rate. */
  def sk05BloomPrejoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"))
    val keyAttr = big.queryExecution.analyzed.output.find(_.name == "o_custkey").get
    val bloom = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.BloomFilterAgg(keyAttr, expectedItems = 10000L)
        .toAggregateExpression())
    val bloomRow = big.agg(bloom.as("bf"))
    val members = big.distinct().withColumn("is_member", lit(1))
    val probed = Tables.customer(s, d).select(col("c_custkey"))
      .crossJoin(broadcast(bloomRow))
    val probedAttrs = probed.queryExecution.analyzed.output
    val maybe = org.apache.spark.sql.graft.GraftDataset.column(
      graft.functions.BloomMightContain(
        probedAttrs.find(_.name == "bf").get,
        probedAttrs.find(_.name == "c_custkey").get))
    probed.withColumn("maybe", maybe)
      .join(broadcast(members), col("c_custkey") === col("o_custkey"), "left_outer")
      .agg(
        count(when(col("is_member") === 1, 1)).as("n_exact_members"),
        count(when(col("maybe"), 1)).as("n_bloom_pass"),
        count(when(col("maybe") && col("is_member").isNull, 1)).as("n_false_pos"))
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

  /** sk07: mergeable HLL ROLLUP — the canonical 100 TB
    * re-aggregation: per-(type, day) Datasketches HLL sketches are
    * built ONCE from the raw stream, then the per-type totals come
    * from merging the daily sketches (`hll_union_agg`), never from
    * re-scanning raw events. At scale the daily sketch table is the
    * stored artifact (a few KB per cell) and every coarser rollup —
    * week, month, all-time — is a sketch merge. The spec asserts the
    * merged estimate tracks the exact distinct within the lgK=12
    * error envelope. */
  /** sk08: deterministic bottom-k sample per group — the distributed
    * replacement for reservoir sampling: rank rows by a uniform hash
    * draw (md5 of the row key) and keep each group's k smallest via
    * the partial-aggregable TopKPairAggregator on the negated hash.
    * Mergeable (bottom-k of a union = bottom-k of merged bottom-ks —
    * the KMV property), map-side combined, and unlike a reservoir it
    * is ORDER-INDEPENDENT, which is why this one is exactly
    * oracle-checkable while classic reservoir sampling never is. */
  def sk08BottomkSample(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKPairAggregator(5))
    Tables.events(s, d)
      .withColumn("hv", expr(
        "CAST(conv(substring(md5(cast(cast(event_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(topk(negate(col("hv")).cast("double"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "pair")))
      .select(col("event_type"), (col("pos") + 1).as("rk"),
        col("pair._2").as("event_id"))
  }

  def sk07HllRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        count(lit(1)).as("n_ev"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n_ev")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_users_merged"),
        sum(hll_sketch_estimate(col("sk"))).as("sum_daily_est"))
  }

  /** sk12: SLIDING-window distinct — trailing-7-day distinct users
    * per day from the stored daily sketch table, the production
    * answer where ev14's exact rolling distinct re-scans a week of
    * raw events per day: here each day's answer is the HLL union of
    * ≤ 7 daily sketches, so the daily corpus is read ONCE ever (into
    * the sketch table) and every window after that is sketch-merge
    * arithmetic on a calendar-bounded frame (days × 7 rows — free at
    * any event volume; this is also why the sketches must be
    * mergeable: a max or bitmap per day would not compose into
    * windows). Declared approximate (rows+spec): the spec bounds the
    * estimate against the exact trailing distinct at ≤ 5%, the HLL
    * lg_k=12 guarantee. */
  def sk12SlidingHll(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val h = daily.select(col("day").as("h_day"), col("sk"))
    daily.select(col("day"))
      .join(h, col("h_day").between(date_sub(col("day"), 6), col("day")))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_days_present"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_users_7d"))
  }

  /** sk09: exact heavy hitters by two bounded passes — pass 1 runs the
    * Misra–Gries sketch (O(k) state, mergeable, partial-agg'd) over
    * the corpus token stream to get a ≤k candidate set with NO false
    * negatives; pass 2 recounts ONLY the broadcast candidates exactly
    * and keeps tokens above the N/(k+1) frequency threshold. The
    * output is exact and hash-checked against a plain GROUP BY oracle
    * — but unlike the oracle's shape, neither pass ever shuffles a
    * per-token aggregate of the full vocabulary: the first carries ≤k
    * counters per task, the second ≤k tokens. The 100 TB answer to
    * "top tokens" when the vocab itself is shuffle-sized. */
  def sk09HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val K = 64
    val mg = udaf(new graft.functions.MisraGriesAggregator(K))
    val toks = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("tok"))
    val cand = toks
      .agg(mg(col("tok")).as("cands"), count(lit(1)).as("n_total"))
      .select(explode(col("cands")).as("tok"), col("n_total"))
    toks.join(broadcast(cand), Seq("tok"))
      .groupBy(col("tok"), col("n_total"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * (K + 1) > col("n_total"))
      .select(col("tok"), col("n"))
  }

  /** sk10: mergeable raw-moment accumulator — per event type, the
    * five power sums (n, Σv, Σv², Σv³, Σv⁴) on an exact whole-dollar
    * integer grid. This is the fixed-size-summary pattern at its
    * simplest: 5 longs per group, partial-aggregated map-side, merged
    * associatively — mean/variance/skewness/kurtosis all derive from
    * them downstream with NO second pass over the data (the same
    * "accumulate tiny state, derive at the end" contract as the HLL/
    * KLL/CMS family, except the summary is exact). Whole dollars keep
    * Σv⁴ far from int64 overflow (490⁴ ≈ 5.8e10 per row) while still
    * hash-comparable — and the grid is cents-then-integer-divide, NOT
    * round(value, 0): a 2-decimal input like 3.50 sits exactly on a
    * half at 0 decimals, where Spark (HALF_UP) and DuckDB (half-even)
    * disagree. */
  def sk10PowerSums(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(round(value * 100, 0) AS BIGINT) div 100").as("vd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("vd")).as("s1"),
        sum(col("vd") * col("vd")).as("s2"),
        sum(col("vd") * col("vd") * col("vd")).as("s3"),
        sum(col("vd") * col("vd") * col("vd") * col("vd")).as("s4"))

  /** sk11: one-pass multiplier bootstrap — error bars at 100 TB. The
    * classic bootstrap resamples the dataset B times (B full passes,
    * impossible at scale); the multiplier/Poisson trick instead gives
    * every ROW a deterministic per-replicate weight (here md5-derived
    * ∈ {0,1,2}, mean 1 — each replicate is a valid resample) and
    * accumulates all B=16 weighted sums IN THE SAME partial-aggregated
    * pass as the point estimate. The replicate spread prices the
    * estimate's sampling noise: spread/point ≈ 2·CV⁄√n, shrinking as
    * groups grow — exactly the signal a pipeline uses to decide if a
    * per-group metric is trustworthy. Everything stays on the sk10
    * whole-dollar integer grid, so all 16 replicate sums
    * hash-compare; state is 16 longs per group per task — the
    * mergeable-tiny-state contract of the sketch family, except
    * exact. */
  def sk11Bootstrap(s: SparkSession, d: String): DataFrame = {
    val weighted = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT) div 100").as("vd"))
    val repSums = (0 until 16).map { b =>
      sum(col("vd") *
        (expr(s"CAST(conv(substring(md5(concat(CAST(event_id AS STRING), '#$b')), 1, 6), 16, 10) AS BIGINT)") % 3))
        .as(s"rep_$b")
    }
    val aggs = Seq(count(lit(1)).as("n"),
      sum(col("vd")).as("point_sum")) ++ repSums
    weighted.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("rep_min",
        least((0 until 16).map(b => col(s"rep_$b")): _*))
      .withColumn("rep_max",
        greatest((0 until 16).map(b => col(s"rep_$b")): _*))
      .withColumn("spread", col("rep_max") - col("rep_min"))
      .select(col("event_type"), col("n"), col("point_sum"),
        col("rep_min"), col("rep_max"), col("spread"))
  }

  /** sk13: AMS (Alon–Matias–Szegedy) F2 / SELF-JOIN-SIZE estimation —
    * the sketch a query planner consults before committing to a
    * shuffle: Σ f(u)² over the join key is EXACTLY the row count a
    * self-join (or the per-key amplification of any equi-join) will
    * produce, the number q43/q64's skew machinery reacts to after the
    * fact. The AMS estimator gets it in ONE pass with 40 longs of
    * state: estimator i keeps X_i = Σ ±1·f(u) (the sign a
    * deterministic md5 bit of (i, u) — engine-portable, so unlike
    * HLL/KLL this sketch is fully hash-checked), E[X_i²] = F2;
    * variance is tamed the textbook way — means of 8 estimators,
    * median of 5 group means. All integer (±1 sums, squares, floor
    * divs), so estimate AND exact twin replay bit-for-bit in the
    * oracle. State is 40 longs per task regardless of stream length —
    * the mergeable-sketch contract at 100 TB, where the exact twin's
    * groupBy materializes one row per distinct key. */
  def sk13AmsF2(s: SparkSession, d: String): DataFrame =
    sk13AmsF2(s, d, exact = true)

  /** sk13's production switch (VERDICT r9 #7): `exact = false` skips
    * the exact twin entirely — the sketch is the product, the twin is
    * calibration — so the plan runs ZERO groupBy-over-keys jobs: one
    * global partial-merged aggregate (40 longs of state) is the whole
    * query. The graded entry stays `exact = true` (est + twin +
    * err_bp, the calibration row the oracle hash-checks). */
  def sk13AmsF2(s: SparkSession, d: String, exact: Boolean): DataFrame = {
    val e = CacheScope.cached(Tables.events(s, d)
      .filter(col("user_id").isNotNull).select(col("user_id")))
    val est = amsEstimate(e, "CAST(user_id AS STRING)")
      .select(col("ams_est"))
    if (!exact) est
    else {
      val ex = e.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("f2_exact"))
      ex.crossJoin(broadcast(est))
        .withColumn("err_bp",
          expr("abs(ams_est - f2_exact) * 10000 div f2_exact"))
    }
  }

  /** The AMS estimator core shared by sk13/sk14: ONE global aggregate
    * over `df` computing n and the 40 ±1-sign sums (signs from an md5
    * bit of (estimator, key) — engine-portable), then means of 8,
    * median of 5 group means, all on the integer grid (`div` floors,
    * matching the oracle's `//`). Returns a 1-row (n, ams_est) frame.
    * `keyExpr` is the SQL string of the hashed key (pre-cast to
    * string) so the identical text can be emitted into the oracle. */
  private def amsEstimate(df: DataFrame, keyExpr: String): DataFrame = {
    val signs = (0 until 40).map { i =>
      sum(expr(s"CAST(conv(substring(md5(concat('e$i#', $keyExpr)), " +
        "1, 1), 16, 10) AS BIGINT) % 2 * 2 - 1")).as(s"x$i")
    }
    val aggs = count(lit(1)).as("n") +: signs
    val x = df.agg(aggs.head, aggs.tail: _*)
    // integer floor div (`div`), never `/` — Spark's `/` is double
    // division and the oracle's `// 8` is the integer floor
    val groupMeans = (0 until 5).map { j =>
      expr("(" + (8 * j until 8 * j + 8)
        .map(i => s"x$i * x$i").mkString(" + ") + ") div 8").as(s"g$j")
    }
    x.select(col("n") +: groupMeans: _*)
      .select(col("n"), element_at(array_sort(array(
        (0 until 5).map(j => col(s"g$j")): _*)), 3).as("ams_est"))
  }

  /** sk14: the AMS estimate DECIDING (VERDICT r9 #3) — closes sk13's
    * statistic→consumer gap on the q73 precedent: for each candidate
    * aggregation key column on events, the one-pass AMS F2 estimate
    * picks the PHYSICAL aggregation strategy for that column. The
    * routing statistic is the effective key cardinality n²/F̂2 (F2/n²
    * is the collision mass: ≈1 means one dominant key, ≈1/k uniform
    * over k keys); eff ≤ 1000 means per-key groups are huge — the
    * reduce-side hot-key shape q64's salt rewrite exists for — so
    * that column's aggregation routes through a SALTED two-phase plan
    * (partials per (key, salt-of-row), then merge per key: the salt
    * is a deterministic md5 bit of the row id, so replays are
    * stable); eff > 1000 takes the plain single-phase groupBy. The
    * estimate table is driver-collected — one row per candidate
    * column, the q73-sanctioned CBO-statistic class. Graded values
    * (n_keys, max_freq) are strategy-INVARIANT — both physical shapes
    * compute the identical exact numbers — with the chosen route as a
    * column, so the DuckDB oracle replays the estimator arithmetic +
    * threshold rule and the hash proves the router decided
    * identically cross-engine. n² stays in int64 at any graded SF; a
    * 100 TB caller routes on the ratio est div n vs n div 1000 (same
    * decision, no square). */
  def sk14AmsRoute(s: SparkSession, d: String): DataFrame = {
    val ev = CacheScope.cached(Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type")))
    val keyCols = Seq("event_type", "user_id", "event_id")
    // ONE corpus pass for all three estimators, and ONE md5 per row
    // per column: estimator i's ±1 sign is BIT (i mod 4) of hex char
    // (1 + i div 4) of that single digest — 3 hashes per row instead
    // of sk13's 120 fresh ones (sk13 keeps its textbook per-estimator
    // hash: it reads one column once; here the hash bill is ×3 and
    // measured dominant). n is shared: all three columns aggregate
    // the same filtered frame.
    val hashed = ev.select(keyCols.map(kc =>
      expr(s"md5(concat('s14#', CAST($kc AS STRING)))").as(s"h_$kc")): _*)
    def sign(h: String, i: Int): String =
      s"CAST(conv(substring($h, ${1 + i / 4}, 1), 16, 10) AS BIGINT)" +
        s" div ${1 << (i % 4)} % 2 * 2 - 1"
    val aggs = count(lit(1)).as("n") +: keyCols.flatMap(kc =>
      (0 until 40).map(i => sum(expr(sign(s"h_$kc", i))).as(s"x_${kc}_$i")))
    val x = hashed.agg(aggs.head, aggs.tail: _*)
    val gSel = col("n") +: keyCols.flatMap(kc => (0 until 5).map { j =>
      expr("(" + (8 * j until 8 * j + 8)
        .map(i => s"x_${kc}_$i * x_${kc}_$i").mkString(" + ") + ") div 8")
        .as(s"g_${kc}_$j")
    })
    val ests = x.select(gSel: _*)
      .select(col("n") +: keyCols.map(kc =>
        element_at(array_sort(array(
          (0 until 5).map(j => col(s"g_${kc}_$j")): _*)), 3)
          .as(s"est_$kc")): _*)
      .head()
    val n = ests.getLong(0)
    val routed = keyCols.zipWithIndex.map { case (kc, ix) =>
      val e = ev.select(col(kc).cast("string").as("k"),
        col("event_id").cast("string").as("rid"))
      // the estimator is a sum of squares, so ≥ 0; the floor-to-1
      // guard (mirrored as greatest(1, …) in the oracle) only binds
      // on degenerate near-empty inputs
      val est = math.max(1L, ests.getLong(1 + ix))
      // n² wraps int64 beyond ~3.0e9 rows; BigInt keeps the route
      // decision exact at any scale (graded SFs are unchanged — the
      // BigInt quotient equals the long quotient there), with the
      // emitted eff column saturating rather than wrapping
      val eff = (BigInt(n) * BigInt(n) / BigInt(est))
        .min(BigInt(Long.MaxValue)).toLong
      val salted = eff <= 1000L
      val grouped =
        if (salted)
          e.withColumn("salt", expr(
              "CAST(conv(substring(md5(concat('s#', rid)), 1, 2), 16, 10) AS BIGINT) % 16"))
            .groupBy(col("k"), col("salt")).agg(count(lit(1)).as("pc"))
            .groupBy(col("k")).agg(sum(col("pc")).as("c"))
        else e.groupBy(col("k")).agg(count(lit(1)).as("c"))
      grouped.agg(count(lit(1)).as("n_keys"), max(col("c")).as("max_freq"))
        .select(lit(kc).as("key_col"), lit(n).as("n_rows"),
          lit(est).as("ams_est"), lit(eff).as("eff_keys"),
          lit(if (salted) "salted" else "plain").as("route"),
          col("n_keys"), col("max_freq"))
    }
    routed.reduce(_ unionByName _)
  }
}
