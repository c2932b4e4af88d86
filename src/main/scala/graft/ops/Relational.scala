package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational / OLAP core (SURVEY.md §2). Every method is a pure plan
  * builder `(SparkSession, sfDir) => DataFrame` — lazy, no actions, no
  * driver-side data. Dimension tables are broadcast explicitly; fact-fact
  * joins shuffle once on the join key and rely on AQE for runtime
  * coalescing/skew handling.
  *
  * Aggregates over doubles are rounded to 2 decimals in both the Spark
  * plan and the DuckDB oracle so that summation-order noise (~1e-10)
  * cannot flip the comparison hash.
  */
/** Typed row for the q30 Dataset-API demonstration. */
case class OrderRow(o_orderkey: Long, o_orderstatus: String, o_totalprice: Double)

object Relational {

  private def ts(lit0: String) = to_timestamp(lit(lit0))

  /** q01: group-by multi-aggregate with map-side partial aggregation.
    * Scales: partial agg means shuffle carries |groups| rows per
    * partition, not |lineitem|. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("2001-09-01 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q02: selective filter + narrow projection — both must reach the
    * parquet scan (PushedFilters / ReadSchema in explain). */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1999-01-01 00:00:00") &&
              col("l_discount") > 0.08 && col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))

  /** q03: customer ⋈ orders ⋈ lineitem, agg, deterministic top-10.
    * customer side is small relative to facts → broadcast; the
    * orders⋈lineitem join shuffles on orderkey. Top-k is
    * TakeOrderedAndProject (per-partition partial top-k, no full sort). */
  def q03ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        round(col("revenue"), 2).as("revenue"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q04: EXISTS as left-semi join + agg. */
  def q04OrderPriority(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** q05: 6-way star join. region/nation/supplier are tiny → broadcast;
    * the only shuffles are orders⋈lineitem on orderkey and the final agg. */
  def q05LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val li = Tables.lineitem(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** q06: selective scan → scalar aggregate (single-row result). */
  def q06ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00") &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** q07: NOT EXISTS as left-anti join (customers inactive since 2000). */
  def q07NoOrderCustomers(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** q08: global top-k with deterministic tie-break →
    * TakeOrderedAndProject, never a full sort. */
  def q08TopkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** q09: ranking window per customer. */
  def q09WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
  }

  /** q10: running (cumulative) window aggregate per customer. */
  def q10WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
  }

  /** q11: exact distinct aggregation (expands to two-phase agg). */
  def q11DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))

  /** q12: CASE-WHEN conditional aggregation. */
  def q12ConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_quantity") > 25, 1)).as("high_qty"),
        count(when(col("l_quantity") <= 25, 1)).as("low_qty"),
        round(sum(when(col("l_quantity") > 25, col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("high_revenue"))

  /** q13: two-level aggregation including zero-order customers
    * (left outer join before the first agg). */
  def q13OrderHistogram(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
  }

  /** q14: scalar subquery — global average joined back as broadcast. */
  def q14AboveAvgParts(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val avgPrice = p.agg(avg(col("p_retailprice")).as("avg_price"))
    p.join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .select(col("p_partkey"), col("p_name"),
        round(col("p_retailprice"), 2).as("p_retailprice"))
  }

  /** q15: UNION ALL of two filtered aggregates. */
  def q15UnionSegments(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val high = o.filter(col("o_totalprice") > 400000)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .withColumn("tier", lit("high"))
    val low = o.filter(col("o_totalprice") < 50000)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .withColumn("tier", lit("low"))
    high.unionByName(low).select(col("tier"), col("o_orderstatus"), col("cnt"), col("total"))
  }

  /** q16: ROLLUP grouping sets (nulls coalesced for stable compare). */
  def q16RollupSales(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
        col("cnt"), col("total_bal"))

  /** q17: CUBE grouping sets. */
  def q17CubeSales(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("cnt"), col("total"))

  /** q18: pivot (wide conditional aggregation over order status). */
  def q18PivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("c_mktsegment"),
        coalesce(col("O"), lit(0L)).as("cnt_o"),
        coalesce(col("F"), lit(0L)).as("cnt_f"),
        coalesce(col("P"), lit(0L)).as("cnt_p"))

  /** q19: EXISTS against a scalar-subquery threshold (customers holding
    * at least one order above 1.5× the global mean price). */
  def q19ExistsBigOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val thr = o.agg((avg(col("o_totalprice")) * 1.5).as("thr"))
    val bigOrders = o.join(broadcast(thr))
      .filter(col("o_totalprice") > col("thr"))
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** q20: string function battery (codegen'd, no UDFs). */
  def q20StringOps(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        concat(col("p_type"), lit("#"), col("p_brand")).as("typetag"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"))

  /** q21: event-time bucketing to calendar month. */
  def q21MonthlyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))

  /** q23: exact percentiles (median/p90) per group — single-pass
    * percentile aggregate, no global sort. */
  def q23Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price"),
        count(lit(1)).as("cnt"))

  /** q24: per-group top-k via the custom TopKAggregator — single-pass
    * partial-aggregable top-k (each partition keeps ≤k values; merge
    * keeps k of 2k) instead of a window sort over every group row. */
  def q24TopkAgg(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(3))
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(topk(col("o_totalprice")).as("topk"))
      .select(col("o_orderstatus"), posexplode(col("topk")).as(Seq("pos", "price")))
      .select(col("o_orderstatus"), (col("pos") + 1).as("rk"), col("price"))
  }

  /** q25: set operators — INTERSECT and EXCEPT as native Spark
    * operators (planned as semi/anti aggregates, not manual joins). */
  def q25SetOps(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val highValue = o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
    val recent = o.filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
      .select(col("o_custkey"))
    val both = highValue.intersect(recent).withColumn("tag", lit("both"))
    val onlyHigh = highValue.except(recent).withColumn("tag", lit("only_high"))
    both.unionByName(onlyHigh).select(col("tag"), col("o_custkey"))
  }

  /** q26: full outer join of two independent aggregates (nation-level
    * customer vs supplier counts; either side may be missing). */
  def q26FullOuter(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
    val custPerNation = Tables.customer(s, d)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
    val supPerNation = Tables.supplier(s, d)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_suppliers"))
    broadcast(nat)
      .join(custPerNation, col("n_nationkey") === col("c_nationkey"), "left_outer")
      .join(supPerNation, col("n_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        col("n_name"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** q27: analytic window battery — lag/lead, first/last over explicit
    * frames, ntile quartiles; one partition+sort serves all five. */
  def q27WindowSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      first(col("o_totalprice")).over(wAll).as("first_price"),
      last(col("o_totalprice")).over(wAll).as("last_price"),
      ntile(4).over(w).as("quartile"))
  }

  /** q28: non-equi (range-predicate) join — orders banded into price
    * tiers. The tier table is a broadcast literal, so the range join is
    * a streaming pass over the fact side (BroadcastNestedLoopJoin with
    * a 3-row build), never a shuffle. */
  def q28RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tiers = Seq(
      ("low", 0.0, 100000.0),
      ("mid", 100000.0, 300000.0),
      ("high", 300000.0, 1e12)).toDF("tier", "lo", "hi")
    Tables.orders(s, d)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** q29: the SQL-text surface — the same engine consumed through
    * `spark.sql` over registered views (what a BI tool or notebook
    * user writes). The oracle is literally the same SQL. */
  def q29SqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT o_orderpriority,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM orders_v JOIN lineitem_v ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** q30: the typed Dataset surface — case-class rows, compile-time
    * field checks, groupByKey + typed Aggregator. Same engine, same
    * Catalyst plan underneath; the Encoder keeps rows in Tungsten
    * binary format, deserializing only inside the lambda. */
  def q30TypedApi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[OrderRow] = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderRow]
    val sumPrice = new Aggregator[OrderRow, Double, Double] {
      def zero = 0.0
      def reduce(b: Double, o: OrderRow) = b + o.o_totalprice
      def merge(a: Double, b: Double) = a + b
      def finish(b: Double) = b
      def bufferEncoder = Encoders.scalaDouble
      def outputEncoder = Encoders.scalaDouble
    }.toColumn
    ds.groupByKey(_.o_orderstatus)
      .agg(sumPrice.name("total_raw"))
      .toDF("o_orderstatus", "total_raw")
      .select(col("o_orderstatus"), round(col("total_raw"), 2).as("total"))
  }

  /** q31: correlated aggregate comparison — customers ordering more
    * often than their segment's average (the decorrelated two-level
    * aggregate join shape Catalyst produces for correlated scalar
    * subqueries). */
  def q31AboveSegmentAvg(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("n_orders"))
    val segAvg = perCust.groupBy(col("c_mktsegment").as("seg"))
      .agg(avg(col("n_orders")).as("seg_avg"))
    perCust.join(broadcast(segAvg), col("c_mktsegment") === col("seg"))
      .filter(col("n_orders") > col("seg_avg"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_orders"))
  }

  /** q22: multi-column sort with limit and deterministic tie-break. */
  def q22MultiSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
      .orderBy(col("l_returnflag").asc, col("l_quantity").desc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)

  /** q32: EXPLICIT grouping sets — unlike ROLLUP (q16) / CUBE (q17),
    * an arbitrary set list that skips a level: ((status, priority),
    * (priority), ()). One pass, Catalyst expands to a single Expand +
    * aggregate — no N-times re-scan of the fact table. */
  def q32GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus,'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority,'ALL') AS o_orderpriority,
        |  count(*) AS cnt, round(sum(o_totalprice),2) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())""".stripMargin)
  }

  /** q33: arg-max/arg-min aggregation — `max_by`/`min_by` with a
    * composite (value, key) ordering struct for deterministic
    * tie-breaks. Single partial-aggregable pass: no window sort, the
    * per-group champion rides the map-side combine. */
  def q33ArgMinMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("top_order"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("bottom_order"),
        round(max(col("o_totalprice")), 2).as("top_price"))

  /** q34: ordered array aggregation — per-customer sorted distinct
    * priority list serialized to one string. collect_list is only safe
    * under an explicit sort_array: collection order is partition-
    * dependent, the sort makes it deterministic. */
  def q34ArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(array_distinct(collect_list(col("o_orderpriority")))), ",")
          .as("priorities"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))

  /** q35: gaps-and-islands — runs of CONSECUTIVE order days per
    * customer via the day_number − row_number grouping trick. One
    * shuffle on custkey shared by the distinct + window + final agg. */
  def q35GapsIslands(s: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(s, d)
      .select(col("o_custkey"),
        date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
    days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date")) - row_number().over(w))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(min(col("day")).as("island_start"), count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .select(col("o_custkey"), col("island_start"), col("n_days"))
  }

  /** q37: null-aware anti join — `NOT IN (subquery)` over a NULLABLE
    * subquery column has three-valued semantics a plain anti join gets
    * wrong (one NULL in the list empties the result). The nullif keeps
    * the column nullable so Catalyst must plan its null-aware anti
    * join; Spark broadcasts the (small, filtered) list side. */
  def q37NotinAntijoin(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_naaj")
    Tables.orders(s, d).createOrReplaceTempView("orders_naaj")
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer_naaj
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM orders_naaj
        |   WHERE o_totalprice > 450000)""".stripMargin)
  }

  /** q38: normalized-rank analytics — dense_rank / percent_rank /
    * cume_dist sharing ONE window sort. The rank ratios are exact
    * integer quotients evaluated in IEEE double: engine-stable without
    * rounding. */
  def q38RankSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      dense_rank().over(w).as("drk"),
      percent_rank().over(w).as("prk"),
      cume_dist().over(w).as("cd"))
  }

  /** q43: join-skew diagnostics — the heaviest join keys on the fact
    * table plus the share of the whole table they carry (exact bp).
    * THIS is the audit that decides whether a join needs ev08-style
    * salting or AQE skew handling before it runs at 100 TB. */
  def q43JoinSkewAudit(s: SparkSession, d: String): DataFrame = {
    val byKey = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_rows"))
    val total = Tables.lineitem(s, d).agg(count(lit(1)).as("n_total"))
    byKey.orderBy(col("n_rows").desc, col("l_orderkey")).limit(10)
      .crossJoin(broadcast(total))
      .select(col("l_orderkey"), col("n_rows"),
        expr("n_rows * 1000000 div n_total").as("share_ppm"))
  }

  /** q42: bag-semantics set operators — EXCEPT ALL / INTERSECT ALL
    * keep multiplicities (q25's INTERSECT/EXCEPT collapse them): the
    * difference matters for auditing duplicated fact rows. */
  def q42BagSetOps(s: SparkSession, d: String): DataFrame = {
    val high = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
      .select(col("o_custkey"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    high.exceptAll(recent).withColumn("tag", lit("high_minus_recent"))
      .unionByName(high.intersectAll(recent).withColumn("tag", lit("both")))
      .groupBy(col("tag"), col("o_custkey"))
      .agg(count(lit(1)).as("multiplicity"))
  }

  /** q41: RANGE window frame — orders placed by the same customer in
    * the 30 days BEFORE each order (value-based frame over epoch
    * seconds, vs q39's row-count frame). Counting only: integer-exact
    * on both engines. */
  def q41RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ts_s"))
      .rangeBetween(-30L * 86400, -1)
    Tables.orders(s, d)
      .withColumn("ts_s", col("o_orderdate").cast("timestamp").cast("long"))
      .withColumn("n_prior_30d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("n_prior_30d"))
  }

  /** q40: lateral explode — relational fan-out of a computed
    * collection (part-name tokens) with re-aggregation: tokens ranked
    * by how many distinct brands use them. The generate step stays
    * inside the scan stage (no shuffle until the aggregate). */
  def q40LateralExplode(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_brand"), explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(countDistinct(col("p_brand")).as("n_brands"), count(lit(1)).as("n_parts"))
      .orderBy(col("n_brands").desc, col("word"))
      .limit(25)

  /** q39: moving-frame aggregate — trailing 3-order average price per
    * customer (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). Frame sums
    * run on exact integer cents: engines disagree on float frame
    * arithmetic (segment-tree vs running sums), integers cannot. The
    * published average is cents `div` count — exact. */
  def q39MovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("frame_sum_c", sum(col("price_c")).over(w))
      .withColumn("frame_n", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        expr("frame_sum_c div frame_n").as("avg_price_c"))
  }

  /** q36: ratio-to-report — each order's share of its customer's total,
    * in integer basis points. Prices are converted to exact cents
    * (long) FIRST, so the window sum and the division are integer
    * arithmetic end-to-end — a float window sum would be
    * addition-order-dependent and unstable at floor boundaries.
    * One window partition, no second scan of the input. */
  def q36RatioToReport(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, d)
      .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("total_c", sum(col("price_c")).over(w))
      .withColumn("share_bp", expr("price_c * 10000 div total_c"))
      .select(col("o_custkey"), col("o_orderkey"), col("share_bp"))
  }

  /** q44: BUCKETED fact-fact join — orders⋈lineitem with BOTH sides
    * pre-bucketed on the order key, so the join plans with NO Exchange
    * (asserted in SourcesSpec): at 100 TB this is the difference
    * between re-shuffling two fact tables per query and paying the
    * layout cost once at write time. The builder (re)writes the two
    * bucketed tables from the given SF dir — the one deliberately
    * non-lazy entry, standing in for the nightly layout job; revenue
    * is exact integer 10^-4-dollar arithmetic (cents × (100−disc_pc)).
    */
  def q44BucketedJoin(s: SparkSession, d: String): DataFrame = {
    // per-SF table names: a stale table written from another data dir
    // must never satisfy this query
    val suffix = java.lang.Integer.toHexString(d.hashCode)
    val ot = s"graft_orders_bkt_$suffix"
    val lt = s"graft_lineitem_bkt_$suffix"
    // the file-mutating layout step lives behind Sources' explicit
    // layout-job entry point — this builder itself stays a plan
    // constructor plus an idempotent layout precondition
    graft.sources.Sources.ensureBucketedLayout(s, ot, "o_orderkey", 8)(
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority"))
    graft.sources.Sources.ensureBucketedLayout(s, lt, "l_orderkey", 8)(
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount"))
    val o = s.table(ot)
    val l = s.table(lt)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"))
          .as("revenue_c4"))
  }

  /** q46: RUNNING DISTINCT count over a window — SQL window functions
    * reject DISTINCT aggregates, so the standard emulation: flag each
    * (customer, clerk-priority) pair's FIRST row in one keyed window,
    * then a running sum of flags in a second window over the same
    * partition — both windows share the customer exchange. Gives each
    * order the number of distinct priorities the customer has used so
    * far (a breadth-of-behavior feature). */
  def q46WindowDistinct(s: SparkSession, d: String): DataFrame = {
    val wPair = Window.partitionBy(col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("is_first",
        when(row_number().over(wPair) === 1, 1L).otherwise(0L))
      .withColumn("n_distinct_prio", sum(col("is_first")).over(wRun))
      .select(col("o_custkey"), col("o_orderkey"), col("n_distinct_prio"))
  }

  /** q45: exact DECIMAL money aggregation — the audit-grade path:
    * totals cast to DECIMAL(18,2) and summed exactly, so the result is
    * independent of partitioning and summation order (a double sum is
    * neither). Decimal sums partial-aggregate like any numeric, so the
    * exactness is free at 100 TB. Graded outputs are projected to
    * integer cents (BIGINT) — exact, and type-stable across engines
    * (DECIMAL columns canonicalize differently in DuckDB/pandas vs
    * Spark parquet, so the graded contract bans them). */
  def q45DecimalMoney(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("price_d", col("o_totalprice").cast("decimal(18,2)"))
      .groupBy(col("o_orderstatus"))
      .agg(
        (sum(col("price_d")) * lit(100)).cast("long").as("total_c"),
        (min(col("price_d")) * lit(100)).cast("long").as("min_c"),
        (max(col("price_d")) * lit(100)).cast("long").as("max_c"),
        count(lit(1)).as("n_orders"))

  /** q47: higher-order array-function surface — per-order quantity
    * vectors folded with `aggregate`/`transform`/`filter`/`exists`
    * lambdas, all codegen-compatible and driver-free. The collect_list
    * is per-order (bounded ~7 items by the data model), so the array
    * column is small everywhere; the lambdas then run per-row with no
    * further shuffle. Quantities are integral by the data model, so
    * the int cast is exact. */
  def q47HigherOrder(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("int"))).as("qs"))
      .select(col("l_orderkey"),
        expr("size(qs)").as("n_items"),
        expr("aggregate(qs, 0L, (acc, x) -> acc + x)").as("sum_q"),
        expr("size(filter(qs, x -> x > 25))").as("n_big"),
        expr("CAST(exists(qs, x -> x = 50) AS INT)").as("has_50"),
        expr("aggregate(transform(qs, x -> CAST(x AS BIGINT) * x), 0L, " +
          "(acc, x) -> acc + x)").as("sum_sq"))

  /** q48: calendar / interval arithmetic surface — quarter rollup of
    * orders with end-of-month clamping (`add_months` + `last_day`,
    * which both engines clamp identically) and day-offset arithmetic,
    * all on DATE (no timestamp-zone hazard). Per-quarter output stays
    * tiny at any scale; the date functions are codegen'd per-row. */
  def q48CalendarOps(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("qtr_start", date_trunc("quarter", col("o_orderdate"))
        .cast("date"))
      .withColumn("days_into_q", datediff(col("o_orderdate"), col("qtr_start")))
      .withColumn("due_eom", last_day(add_months(col("o_orderdate"), 3)))
      .groupBy(year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("days_into_q")).as("max_days_into_q"),
        min(col("due_eom")).as("min_due_eom"),
        max(col("due_eom")).as("max_due_eom"))

  /** q49: hot/cold ROUTED join — the manual skew-split pattern for
    * when one join key dwarfs the rest and AQE's skew splitting isn't
    * available (e.g. a broadcast-ineligible dimension): keys above a
    * frequency threshold route through a broadcast map-side join (no
    * shuffle of their — dominant — fact rows), the long tail through
    * the ordinary shuffle join, results unioned. The oracle is the
    * plain join aggregate: routing must be a pure execution-strategy
    * choice with zero semantic footprint. Threshold ≥6 items marks
    * ~15% of orders "hot" here; at 100 TB the hot set is whatever
    * fits the broadcast budget. */
  def q49HotColdJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val hotKeys = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 6)
      .select(col("l_orderkey").as("hk"))
    val liTagged = li.join(broadcast(hotKeys),
      col("l_orderkey") === col("hk"), "left_outer")
    val hotSide = liTagged.filter(col("hk").isNotNull)
      .join(broadcast(ord.join(broadcast(hotKeys),
        col("o_orderkey") === col("hk")).drop("hk")),
        col("l_orderkey") === col("o_orderkey"))
    val coldSide = liTagged.filter(col("hk").isNull)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    hotSide.unionByName(coldSide)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)")
          .as("revenue_c"))
  }

  /** q50: NULL-semantics conformance — the SQL corner every engine
    * must agree on before results are portable: NULL as its own GROUP
    * BY group, count(*) vs count(col) over nulls, aggregate null
    * skipping, and null-safe equality (`<=>` here, IS NOT DISTINCT
    * FROM in the oracle) matching the NULL group in a join where
    * plain `=` silently drops it. A derived nullable key
    * (nullif(custkey mod 7, 0)) makes the behavior visible on clean
    * data. */
  def q50NullSemantics(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("x", expr("nullif(o_custkey % 7, 0)"))
    val grouped = o.groupBy(col("x"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("x")).as("n_x"),
        expr("CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)")
          .as("total_c"))
    val dim = grouped.select(col("x").as("y"), col("n_rows").as("dim_rows"))
    grouped.join(dim, col("x") <=> col("y"), "left_outer")
      .select(col("x"), col("n_rows"), col("n_x"), col("total_c"),
        (col("dim_rows") === col("n_rows")).as("nullsafe_match"))
  }

  /** q51: dynamic-partition-pruned fact scan — lineitem laid out
    * hive-partitioned by ship month (yyyymm; bounded cardinality at
    * any SF), then joined to a runtime-derived month dim (months whose
    * order intake beats the monthly average). The month list
    * only exists AFTER scanning orders, so static pruning can't help —
    * Catalyst inserts a DynamicPruningSubquery on the partition column
    * and the fact scan opens ONLY the qualifying month directories
    * (plan-asserted in SourcesSpec). At 100 TB this is the difference
    * between reading 3 months and reading 8 years. The layout job
    * runs once per (session, data dir) — the same non-lazy builder
    * contract as q44. */
  def q51DppJoin(s: SparkSession, d: String): DataFrame = {
    val suffix = java.lang.Integer.toHexString(d.hashCode)
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val path = s"$wh/graft_lineitem_pmon_$suffix"
    if (!new java.io.File(s"$path/_SUCCESS").exists) {
      graft.sources.Sources.writePartitioned(
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          expr("year(l_shipdate) * 100 + month(l_shipdate)").as("l_mon")),
        path, "l_mon")
    }
    // explicit schema: a zero-row source writes a layout with no
    // partition directories, and a schema-less read of that cannot
    // infer (a real condition — an empty ingest day at scale). The
    // explicit contract also skips the footer-sampling inference scan.
    val fact = s.read
      .schema("l_orderkey BIGINT, l_extendedprice DOUBLE, " +
        "l_discount DOUBLE, l_mon INT")
      .parquet(path)
    val intake = Tables.orders(s, d)
      .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mon"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("intake_c"))
    val bar = intake.agg(
      expr("sum(intake_c) div count(1)").as("bar_c"))
    // the literal guard is semantically vacuous (intake is positive)
    // but it is what PartitionPruning's selectivity check needs to see
    // before it will insert the DynamicPruningSubquery
    val hot = intake.join(broadcast(bar))
      .filter(col("intake_c") > col("bar_c") && col("intake_c") > 0)
      .select(col("mon"), col("intake_c"))
    fact.join(broadcast(hot), fact("l_mon") === hot("mon"))
      .groupBy(col("mon"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
          "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"))
          .as("revenue_c4"))
  }

  /** q52: full MERGE semantics — all three clauses (matched-DELETE,
    * matched-UPDATE, not-matched-INSERT) applied to the orders table
    * as ONE declarative plan, plus the audit row a MERGE job emits.
    * The change feed derives deterministically from the key space
    * (key%10: 0 → delete, 1–2 → +5% price update, 3 → insert under a
    * fresh key), so the oracle replays it exactly. Prices stay on the
    * cents integer grid throughout. Scale: delete+update fold into
    * one filtered projection (no join — the clause predicate IS the
    * match), inserts append via union; the audit aggregates are one
    * extra scan. Contrast ev11 (upsert-only) and pp05 (incremental
    * ingest): this is the full three-clause contract. */
  def q52MergeClauses(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val mx = o.agg(max(col("o_orderkey")).as("mx"))
    val kept = o.filter(col("o_orderkey") % 10 =!= 0)
      .withColumn("cents",
        when(col("o_orderkey") % 10 === 1 || col("o_orderkey") % 10 === 2,
          col("cents") + expr("cents div 20")).otherwise(col("cents")))
    val ins = o.filter(col("o_orderkey") % 10 === 3).crossJoin(broadcast(mx))
      .select((col("o_orderkey") + col("mx") + 1).as("o_orderkey"),
        col("cents"))
    val res = kept.select(col("o_orderkey"), col("cents")).unionByName(ins)
    val actions = o.agg(
      count(lit(1)).as("n_target"),
      sum(when(col("o_orderkey") % 10 === 0, 1L).otherwise(0L))
        .as("n_deleted"),
      sum(when(col("o_orderkey") % 10 === 1 ||
        col("o_orderkey") % 10 === 2, 1L).otherwise(0L)).as("n_updated"),
      sum(when(col("o_orderkey") % 10 === 3, 1L).otherwise(0L))
        .as("n_inserted"))
    res.agg(count(lit(1)).as("n_result"),
        sum(col("cents")).as("total_cents"))
      .crossJoin(broadcast(actions))
      .select(col("n_target"), col("n_deleted"), col("n_updated"),
        col("n_inserted"), col("n_result"), col("total_cents"))
  }

  /** q53: WITH RECURSIVE transitive closure — 2-hop reachability over
    * the co-purchase graph from seed parts, written as a recursive CTE
    * (new SQL surface in Spark 4: UnionLoop executes the anchor, then
    * iterates the recursive term on the previous frontier until the
    * hop guard empties it). Per iteration the work is one
    * frontier⋈edges equi-join — frontier-sized, shuffled on the join
    * key — which is exactly the BFS dataflow gr06 spells out by hand;
    * the hop guard (not a row limit) bounds the recursion so the plan
    * is deterministic and oracle-replayable. UNION ALL frontiers can
    * revisit nodes; the final min(hops) aggregate canonicalizes. */
  def q53RecursiveCte(s: SparkSession, d: String): DataFrame = {
    // the e0 CTE (DISTINCT src<dst co-purchase pairs) is definitionally
    // Graph.coPurchaseEdges — register the CACHED frame as the edge
    // source so the recursion's per-iteration edge re-scan reads the
    // shared cache the gr06/gr10/gr16 family already pays for, instead
    // of re-running the pair expansion inside every recursive step
    // (the recursive surface — WITH RECURSIVE reach — is unchanged,
    // and so is every output row; the oracle replays the inline e0)
    Graph.coPurchaseEdges(s, d).createOrReplaceTempView("copurchase_e0_v")
    s.sql(
      """WITH RECURSIVE
        |edges AS (SELECT src, dst FROM copurchase_e0_v
        |          UNION ALL
        |          SELECT dst AS src, src AS dst FROM copurchase_e0_v),
        |reach(p, hops) AS (
        |  SELECT DISTINCT src AS p, 0 AS hops FROM edges WHERE src % 100 = 0
        |  UNION ALL
        |  SELECT DISTINCT e.dst, r.hops + 1
        |  FROM reach r JOIN edges e ON e.src = r.p
        |  WHERE r.hops < 2)
        |SELECT p, CAST(min(hops) AS BIGINT) AS min_hops
        |FROM reach GROUP BY p""".stripMargin)
  }

  /** q54: wide→long reshaping with the Dataset.unpivot operator (the
    * melt/stack surface): three per-priority order metrics computed
    * wide in one aggregate pass, then unpivoted to (priority, metric,
    * value) rows. unpivot plans as a single Expand — metrics × rows
    * with NO shuffle and no self-join back (the naive long-form
    * formulation would re-aggregate the fact table once per metric).
    * All measures cast to one type (long) as the operator requires. */
  def q54Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        countDistinct(col("o_custkey")).cast("long").as("n_customers"),
        expr("CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)")
          .as("total_c"))
    wide.unpivot(
      Array(col("o_orderpriority")),
      Array(col("n_orders"), col("n_customers"), col("total_c")),
      "metric", "value")
  }

  /** q55: the VariantType surface (Spark 4's semi-structured column
    * type) — event props parsed ONCE into variant, then field access
    * via variant_get path expressions. Against the string-backed
    * alternative (ev05's get_json_object) variant is parse-once /
    * read-many: the binary encoding is produced at the scan edge and
    * every downstream access is a cheap typed navigation, not a
    * re-parse — the right trade wherever multiple fields or multiple
    * operators touch the same JSON at 100 TB. try_variant_get on an
    * absent path returns null (not an error), which the miss-count
    * audits. */
  def q55Variant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k"),
        expr("try_variant_get(v, '$.missing', 'int')").as("absent"))
      .groupBy(col("event_type"), expr("k % 10").as("k_mod"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        sum(when(col("absent").isNull, 1L).otherwise(0L)).as("n_miss"))

  /** q56: join-strategy hint surface — the orders⋈lineitem join forced
    * to SHUFFLE_HASH. Planner-default here would be broadcast (orders
    * is tiny at test SF), but at 100 TB neither side broadcasts and the
    * default becomes sort-merge; the hint is the declarative knob that
    * says "the per-partition build side fits executor memory — skip
    * BOTH sorts and hash instead". Same shuffle count as SMJ, strictly
    * less work per partition when it applies; a plan spec asserts the
    * hint actually wins (hints are requests, not commands — an
    * unverified hint is a no-op you keep paying for). */
  def q56ShuffleHashHint(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("price_c"))
      .join(o.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(col("price_c")).as("sum_price_c"))
  }

  /** q57: error-safe evaluation surface — the try_* family
    * (try_divide, try_cast, try_to_timestamp) that turns malformed
    * input into NULL instead of a job-killing exception: at 100 TB a
    * single bad row must never fail the 999,999,999 good ones, and
    * NULL-on-error composes with the usual null-skipping aggregates
    * where a thrown error composes with nothing. Division by zero
    * (linenumber 1), unparseable casts, and non-timestamp strings each
    * produce counted nulls; the floor of the integer-over-integer
    * IEEE division is grid-exact so the sum hash-compares. */
  def q57TryOps(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        expr("try_divide(CAST(l_quantity AS BIGINT), l_linenumber - 1)").as("td"),
        expr("try_cast(CASE WHEN l_linenumber = 1 THEN '42' " +
          "ELSE l_returnflag END AS INT)").as("tc"),
        expr("try_to_timestamp(l_returnflag)").as("tt"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("td").isNull, 1L).otherwise(0L)).as("n_div_null"),
        sum(expr("CAST(floor(td) AS BIGINT)")).as("div_floor_sum"),
        sum(col("tc")).cast("long").as("cast_sum"),
        sum(when(col("tt").isNull, 1L).otherwise(0L)).as("n_ts_null"))

  /** q58: map-typed column surface — per-priority status histogram
    * materialized as a MapType column (map_from_entries over a sorted
    * collect_list for determinism), then consumed with the map
    * function family: cardinality, element_at (absent-key null →
    * coalesce), aggregate(map_values) fold, map_filter. The map is a
    * first-class value a catalog row could store; the derived scalars
    * are what the oracle replays from plain GROUP BYs. One two-level
    * aggregation, both keyed on the priority prefix — the map is
    * per-group metadata-sized, never row-sized, at 100 TB. */
  def q58MapSurface(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("o_orderstatus"), col("c"))))).as("m"))
      .select(col("o_orderpriority"),
        expr("CAST(cardinality(m) AS BIGINT)").as("n_statuses"),
        expr("coalesce(element_at(m, 'O'), 0L)").as("open_cnt"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("total_cnt"),
        expr("CAST(cardinality(map_filter(m, (k, v) -> v >= 100)) AS BIGINT)")
          .as("n_big_statuses"))

  /** q59: one-pass regression sufficient statistics — per return flag,
    * the six mergeable moments (n, Σx, Σy, Σx², Σxy, Σy²) of
    * (quantity, discount-bp) from which corr / OLS slope / intercept /
    * R² are all closed forms. THIS is how a 100 TB engine does
    * statistics: one partial-aggregated scan emits a constant-size
    * state per group that merges associatively across 1000 executors —
    * never a second centering pass, never a driver-side fit. Both
    * series live on exact integer grids (units, basis points), so the
    * sums hash-compare exactly; the cross-multiplied sign of the
    * covariance numerator (n·Σxy − Σx·Σy) is emitted in place of a
    * float slope. Magnitudes stay inside int64 past sf10; beyond that
    * the same plan widens to DECIMAL(38,0). */
  def q59SufficientStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        expr("CAST(round(l_discount * 10000, 0) AS BIGINT)").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("y") * col("y")).as("sum_yy"))
      .withColumn("cov_sign",
        signum(col("n") * col("sum_xy") - col("sum_x") * col("sum_y"))
          .cast("long"))

  /** q60: null-safe equi-join surface — customers keyed on a NULLABLE
    * segment (`nullif` maps one segment to NULL) joined back to a
    * per-segment dimension with `<=>` so the NULL bucket matches the
    * NULL dim row instead of silently dropping. The conformance point:
    * Catalyst accepts EqualNullSafe as a HASH join key (it wraps the
    * key, e.g. coalesce/isnull, rather than falling back to a nested-
    * loop join), so the null-safe join costs the same one shuffle as
    * `=` at 100 TB — asserted by the plan spec alongside q50's
    * null-semantics scalars. Oracle: IS NOT DISTINCT FROM. */
  def q60NullsafeJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(nullif(col("c_mktsegment"), lit("BUILDING")).as("nseg"),
        col("c_acctbal"))
    val dim = cust.groupBy(col("nseg"))
      .agg(expr("CAST(sum(round(c_acctbal * 100, 0)) AS BIGINT)")
        .as("seg_bal_cents"))
      .withColumnRenamed("nseg", "dim_nseg")
    cust.join(dim, col("nseg") <=> col("dim_nseg"))
      .groupBy(col("nseg"))
      .agg(count(lit(1)).as("n_customers"),
        max(col("seg_bal_cents")).as("seg_bal_cents"))
  }

  /** q61: discrete-percentile surface — per return flag, the exact
    * p25/p50/p75 ORDER STATISTICS of quantity via `percentile_disc
    * WITHIN GROUP` (ANSI inverse-distribution aggregate): the smallest
    * value whose cumulative distribution reaches p. Unlike
    * percentile_cont (q23's family) nothing interpolates, so integer
    * data stays integer and the result hash-compares exactly with no
    * rounding contract at all — the right percentile flavor whenever
    * the answer must be a value that ACTUALLY OCCURS (SLA tiers,
    * size-class cutoffs). Partial-aggregable per group at scale; the
    * sketch twin for truly huge groups is sk02/sk04. */
  def q61PercentileDisc(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS BIGINT)")
          .as("p25_qty"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS BIGINT)")
          .as("p50_qty"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS BIGINT)")
          .as("p75_qty"),
        count(lit(1)).as("n_rows"))

  /** q62: the "only late supplier" pattern (TPC-H Q21's shape) — for
    * every multi-supplier order whose shipment slipped more than 60
    * days past the order date, find the supplier who was the ONLY late
    * one (the unambiguous blame assignment). Formulated as per-order
    * aggregation instead of the textbook EXISTS/NOT-EXISTS correlated
    * pair: one co-partitioned fact-fact join on orderkey, one agg per
    * order (distinct supplier counts + the conditional max that
    * recovers the lone late supplier's id), then a supplier-sized
    * rollup with the dim broadcast in — no per-row subquery
    * re-execution, and the order-level frame shuffles once on a key
    * the join already clustered. Top-10 rides TakeOrderedAndProject
    * (per-partition top-k, never a global sort). */
  def q62OnlyLateSupplier(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    val perOrder = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supps") >= 2 && col("n_late") === 1)
    perOrder.groupBy(col("late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("n_blocked_orders"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))), Seq("s_suppkey"))
      .orderBy(col("n_blocked_orders").desc, col("s_suppkey"))
      .limit(10)
  }

  /** q63: order-fulfillment SLA — lead time from order date to the
    * order's LAST shipment, exact p50/p90 per priority class. The
    * percentile machinery is the distributed grouped value-histogram
    * (ev33's pattern): per-(priority, lead_days) counts, a cumulative
    * window over the ≤hundreds-row histogram, and the two bracketing
    * order statistics recombined on the exact ×100 centi-grid — no
    * per-priority sort of the order frame ever happens, so the plan
    * is two partial-agg'd shuffles plus calendar-sized windows at any
    * scale. Day grid in, centi-day grid out: hash-exact on both
    * engines. */
  def q63LeadTimeSla(s: SparkSession, d: String): DataFrame = {
    val lead = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      .select(col("o_orderpriority"),
        datediff(col("last_ship"), col("o_orderdate")).cast("long")
          .as("lead_days"))
    val hist = lead.groupBy(col("o_orderpriority"), col("lead_days"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(
        Window.partitionBy(col("o_orderpriority")).orderBy(col("lead_days"))))
    val tot = lead.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("_n"))
    def pCol(p: Int, out: String): Seq[Column] = Seq(
      min(when(expr(s"_cum >= ($p*(_n-1)) div 100 + 1"), col("lead_days")))
        .as(s"_${out}_lo"),
      min(when(expr(s"_cum >= ($p*(_n-1)+99) div 100 + 1"), col("lead_days")))
        .as(s"_${out}_hi"))
    val aggs: Seq[Column] = Seq(max(col("_n")).as("n_orders"),
      min(col("lead_days")).as("min_days"),
      max(col("lead_days")).as("max_days")) ++
      pCol(50, "p50") ++ pCol(90, "p90")
    hist.join(broadcast(tot), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("o_orderpriority"), col("n_orders"), col("min_days"),
        col("max_days"),
        expr("_p50_lo * (100 - (50*(n_orders-1)) % 100) + " +
          "_p50_hi * ((50*(n_orders-1)) % 100)").as("p50_cd"),
        expr("_p90_lo * (100 - (90*(n_orders-1)) % 100) + " +
          "_p90_hi * ((90*(n_orders-1)) % 100)").as("p90_cd"))
  }

  /** q64: engine-applied skew salting — a hot low-cardinality
    * aggregation run under `spark.graft.saltSkew=16`: the
    * SaltSkewRewrite optimizer rule (plans/SaltSkewRewrite.scala)
    * rewrites the single groupBy into the ev08 two-phase salted shape
    * (phase 1 on (keys, salt), phase 2 combining the partials) with
    * the result ids/names/types untouched — the q43-audit →
    * ev08-shape escalation applied BY THE ENGINE instead of by hand.
    * The flag lives on an isolated `newSession()` (shared state, own
    * conf) so the rest of the suite keeps direct plans. The oracle is
    * the plain ONE-phase SQL — identical values is the whole point:
    * salting is a pure physical-distribution change, provable here
    * because every aggregate rides the exact integer cents grid (a
    * double sum would expose float ordering across the two phases).
    * The plan shape itself is asserted in the spec. */
  def q64AutoSalt(s: SparkSession, d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.graft.saltSkew", "16")
    Tables.lineitem(s2, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_c2"),
        min(round(col("l_extendedprice") * 100, 0).cast("long")).as("min_price_c2"),
        max(round(col("l_extendedprice") * 100, 0).cast("long")).as("max_price_c2"))
  }

  /** The q65 MV layout job: (re)build the lineitem summary table at
    * (l_returnflag, l_linestatus, ship_month) granularity — one fact
    * scan, ~36 rows out — idempotently per source dir. This is the
    * refresh side of the MV contract: the SummaryRewrite rule serves
    * reads, this job owns staleness. */
  private[graft] def ensureSummaryLayout(s: SparkSession, d: String): String = {
    // "summary_", deliberately NOT "lineitem_": SummaryRewrite matches
    // source scans by path name, and an MV that matched its own rule's
    // source predicate would invite a rewrite loop
    val dir = new java.io.File(
      s"/tmp/graft-mv/summary_${java.lang.Integer.toHexString(d.hashCode)}")
    if (!dir.exists()) {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          month(col("l_shipdate")).as("ship_month"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
    }
    // `_MV_SOURCE` sidecar: the exact source path this MV aggregates.
    // SummaryRewrite compares it to the scan's rootPath before firing,
    // so a session holding two scale dirs can never have one dir's
    // queries answered from the other dir's MV. Written even when the
    // data dir pre-exists (sidecar-less dirs from older layouts).
    val sidecar = new java.io.File(dir, "_MV_SOURCE")
    val src = new java.io.File(d, "lineitem.parquet").getAbsolutePath
    if (!sidecar.isFile)
      java.nio.file.Files.write(sidecar.toPath,
        src.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.toString
  }

  /** q65: transparent MATERIALIZED-VIEW rewrite — the query is written
    * (and graded) against the RAW lineitem table; with
    * `spark.graft.summaryDir` set, the SummaryRewrite optimizer rule
    * reroutes it to the pre-aggregated summary and re-aggregates
    * (sum-of-sums / sum-of-counts), so the plan reads ~36 MV rows
    * instead of the fact table. The oracle computes from RAW lineitem
    * — the hash match IS the proof the MV route is lossless. Conf is
    * scoped to a child session (the q64 isolation pattern).
    * `l_quantity` is integral-valued, so the double sums are exact and
    * rollup order cannot perturb the hash. */
  def q65MvRewrite(s: SparkSession, d: String): DataFrame = {
    val mvDir = ensureSummaryLayout(s, d)
    val s2 = s.newSession()
    s2.conf.set("spark.graft.summaryDir", mvDir)
    Tables.lineitem(s2, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
  }

  /** q66: RUNTIME (bloom-filter) row-level join pruning — q51's DPP
    * idea without needing a partitioned layout: orders carries a
    * selective predicate (1-URGENT, ~1/5 of orders), so Catalyst's
    * InjectRuntimeFilter builds a bloom filter over the filtered
    * orderkeys at runtime and pushes `might_contain` into the
    * LINEITEM scan — ~80% of the fact side is dropped BEFORE its
    * shuffle (at 100 TB: the shuffle is the cost; DPP only helps when
    * the layout anticipated the key). Thresholds are conf'd down in a
    * child session (the q64 isolation pattern) because the injection
    * gate reads size ESTIMATES that local test parquet never crosses;
    * on a real warehouse the defaults fire by themselves. Broadcast
    * is disabled for the query so the join actually shuffles — a
    * broadcast join already prunes implicitly and would make the
    * demonstration vacuous. The bloom filter is semantically
    * transparent (false positives only re-admit rows the join then
    * drops): the oracle is the PLAIN join — the hash match proves
    * transparency; the spec asserts the filter is actually in the
    * plan (an uninjected demo is a silent no-op, the q56 lesson). */
  def q66RuntimeBloom(s: SparkSession, d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ord = Tables.orders(s2, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    Tables.lineitem(s2, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("revenue_c"))
  }

  /** q67: SKYLINE (Pareto frontier) of parts — minimize price,
    * maximize size; a part is dominated iff some other part is no
    * worse on both axes and strictly better on one. The naive
    * formulation is an O(n²) self-theta-join; the 2-D structure
    * collapses it to one aggregate + one tiny window: group parts by
    * DISTINCT price (cents grid — the shared double parses exactly)
    * keeping max size per price, run the strictly-cheaper cumulative
    * max over the price-sorted aggregate (∝ distinct prices, never
    * the fact table — the only sorted frame), broadcast it back, and
    * test each part row-locally: dominated ⇔ a strictly cheaper price
    * reaches its size, or its own price bucket exceeds its size. The
    * part scan stays one embarrassingly-parallel pass at 100 TB; the
    * global sort touches only the price-level frame (bounded by the
    * price domain, ~10⁵ cents values). */
  def q67Skyline(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
        round(col("p_retailprice") * 100, 0).cast("long").as("price_c"))
    val wPrev = Window.orderBy(col("price_c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-price frame: ∝ distinct prices — the documented small sorted frame
    val perPrice = Tables.part(s, d)
      .groupBy(round(col("p_retailprice") * 100, 0).cast("long").as("price_c"))
      .agg(max(col("p_size").cast("long")).as("max_here"))
      .withColumn("max_cheaper", max(col("max_here")).over(wPrev))
    parts.join(broadcast(perPrice), Seq("price_c"))
      .filter(!(coalesce(col("max_cheaper"), lit(Long.MinValue)) >= col("p_size") ||
        col("max_here") > col("p_size")))
      .select(col("p_partkey"), col("p_size"), col("price_c"))
  }

  /** q68: EQUI-DEPTH histogram — the statistic a cost-based optimizer
    * actually stores (ANALYZE TABLE ... FOR COLUMNS): 8 buckets of
    * l_extendedprice holding ~equal row counts, unlike q13's
    * fixed-WIDTH buckets that collapse under skew. The 7 interior
    * boundaries are discrete percentiles (percentile_disc — a real
    * data value, engine-agnostic; q61's precedent), computed in ONE
    * aggregate over the cents grid, broadcast as a single row, and
    * each row buckets itself by counting boundaries ≤ its value —
    * row-local, no sort of the fact table anywhere. Half-open
    * [lo, hi) ranges make boundary duplicates deterministic; heavy
    * duplicate values produce visibly unequal depths — that is the
    * histogram telling the optimizer about the skew, not a bug. */
  def q68EquidepthHist(s: SparkSession, d: String): DataFrame = {
    val v = Tables.lineitem(s, d)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
    // Spark's percentile_disc is a single-group sort-collect (11 s at
    // sf0.1, unusable at 100 TB); the boundaries come instead from the
    // q63/ev33 distributed value-histogram: one groupBy(value) shuffle,
    // a cumulative count over the ∝|distinct values| histogram frame,
    // and boundary k = min value whose cumulative count reaches rank
    // ceil(k·n/8) — exactly percentile_disc's definition, so the
    // DuckDB oracle is unchanged and the hash proves the equivalence.
    val hist = v.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = v.agg(count(lit(1)).as("n"))
    val cutCols = (1 to 7).map(k =>
      min(when(col("cum") * 8 >= col("n") * k, col("c"))).as(s"b$k"))
    val cuts = hist.crossJoin(broadcast(tot))
      .agg(cutCols.head, cutCols.tail: _*)
    v.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        (1 to 7).map(k => when(col("c") >= col(s"b$k"), 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("c")).as("min_c"), max(col("c")).as("max_c"))
  }

  /** q69: association rules over order baskets — market-basket
    * support / confidence / lift for BRAND pairs (directed rules
    * a→b), the recommender/assortment classic. Items are collapsed to
    * the brand level FIRST (25 brands — the standard taxonomy-level
    * mining that makes rules statistically meaningful where raw-part
    * pairs are ~unique), so every per-order pair expansion is over a
    * ≤25-element distinct-brand basket — bounded by the taxonomy,
    * never items². Min-support prunes pairs BEFORE the metric joins
    * (the anti-explosion gate real miners apply); supports land on the
    * exact ppm grid, confidence and lift on bp grids with the lift
    * division ordered (pair·N div a-cnt) div b-cnt-scaled to stay
    * int64-exact — both engines replay the identical order. Two
    * aggregates (basket collapse, pair count) + broadcast brand
    * counts; lift > 10⁴ bp ⇔ genuinely associated beyond chance. */
  def q69AssocRules(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b")).distinct()
    val nOrders = Tables.orders(s, d).agg(count(lit(1)).as("n_orders"))
    val brandCnt = li.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val pairs = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.b") =!= col("y.b"))
      .groupBy(col("x.b").as("ante"), col("y.b").as("cons"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= 50)
    pairs
      .join(broadcast(brandCnt.select(col("b").as("ante"), col("cnt").as("a_cnt"))),
        Seq("ante"))
      .join(broadcast(brandCnt.select(col("b").as("cons"), col("cnt").as("c_cnt"))),
        Seq("cons"))
      .crossJoin(broadcast(nOrders))
      .select(col("ante"), col("cons"), col("pair_cnt"),
        expr("pair_cnt * 1000000 div n_orders").as("support_ppm"),
        expr("pair_cnt * 10000 div a_cnt").as("confidence_bp"),
        expr("(pair_cnt * n_orders div a_cnt) * 10000 div c_cnt").as("lift_bp"))
  }

  /** q70: data-quality EXPECTATION suite — the pre-publish gate run AS
    * DATA (the Deequ / Great Expectations shape): every rule reports
    * (n_checked, n_violations, ppm) in one frame a release pipeline
    * can assert on or archive. Five representative rule classes:
    * range (quantity ∈ (0,100]), completeness (shipdate NOT NULL),
    * referential integrity (every lineitem orderkey resolves in
    * orders — a LEFT join + null flag, so the orphan check rides the
    * same scan as the row-local rules), uniqueness (orderkey appears
    * once — rows in >1-count groups), and non-negativity
    * (totalprice ≥ 0). Cost: ONE pass over each fact table (all
    * lineitem rules share a single aggregate; pp12's stack unpivot
    * emits the long form) + the keys-only RI join — a green suite at
    * 100 TB costs two scans, not five. */
  def q70DqExpectations(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    // DISTINCT keys for the RI probe: a duplicate o_orderkey (exactly
    // the failure the uniqueness rule reports) must not fan out
    // lineitem rows and inflate the row-local rule counts
    val li = Tables.lineitem(s, d)
      .join(ord.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
    val liRules = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") <= 0 || col("l_quantity") > 100, 1L)
          .otherwise(0L)).as("v_range"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_ri"))
      .select(expr(
        """stack(3,
          |  'lineitem_quantity_range', n, v_range,
          |  'lineitem_shipdate_complete', n, v_null,
          |  'lineitem_orderkey_resolves', n, v_ri)
          |AS (rule, n_checked, n_violations)""".stripMargin))
    val dupRows = ord.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("v_uniq"),
        coalesce(sum(col("c")), lit(0L)).as("n"))
      .select(expr(
        "stack(1, 'orders_orderkey_unique', n, v_uniq) " +
          "AS (rule, n_checked, n_violations)"))
    val ordRules = ord.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("v_neg"))
      .select(expr(
        "stack(1, 'orders_totalprice_nonneg', n, v_neg) " +
          "AS (rule, n_checked, n_violations)"))
    liRules.unionByName(dupRows).unionByName(ordRules)
      .withColumn("viol_ppm",
        when(col("n_checked") === 0, 0L)
          .otherwise(expr("n_violations * 1000000 div n_checked")))
  }

  /** q71: CONTINGENCY / independence audit — the column-correlation
    * detector a profiler (pp12) stops short of: for the
    * (returnflag × linestatus) grid, each cell's observed count
    * against the independence expectation r·c∕n, with the deviation
    * in exact bp — the signal that tells a CBO (or a data steward)
    * two dimensions are NOT independent, so multiplying their
    * selectivities under-estimates every conjunctive predicate
    * (q68 gives per-column histograms; this is the 2-D correction).
    * Integer discipline: expected on the MILLI grid
    * (r·c·1000 div n — bounded by n²·1000, int64-safe to ~3×10⁶
    * rows per side… at 100 TB swap the milli grid for per-partition
    * pre-scaling, same shape), deviation as abs + direction flag
    * because Spark's `div` truncates while DuckDB's `//` floors —
    * they agree only on nonnegative numerators (grid rule learned
    * here, recorded for every future signed division). Scale: three
    * broadcast dimension aggregates + a |dims|²-row cell frame off
    * one scan. */
  def q71Contingency(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cells = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("observed"))
    val rt = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("r_tot"))
    val ct = li.groupBy(col("l_linestatus")).agg(count(lit(1)).as("c_tot"))
    val n = li.agg(count(lit(1)).as("n"))
    cells.join(broadcast(rt), Seq("l_returnflag"))
      .join(broadcast(ct), Seq("l_linestatus"))
      .crossJoin(broadcast(n))
      .withColumn("expected_milli", expr("r_tot * c_tot * 1000 div n"))
      // zero guard (the pp32 affected_bp pattern): tiny marginals on a
      // huge table truncate expected_milli to 0 — deviation reported as
      // 0 with over_represented carrying the direction, no div-by-zero
      // on either engine
      .withColumn("abs_dev_bp", when(col("expected_milli") === 0, lit(0L))
        .otherwise(expr(
          "abs(observed * 1000 - expected_milli) * 10000 div expected_milli")))
      .withColumn("over_represented",
        col("observed") * 1000 > col("expected_milli"))
      .select(col("l_returnflag"), col("l_linestatus"), col("observed"),
        col("r_tot"), col("c_tot"), col("expected_milli"),
        col("abs_dev_bp"), col("over_represented"))
  }

  /** Core of q72, factored over any (a, b, extra-predicate) triple so
    * the spec can plant a perfectly correlated pair and assert the
    * correction's win. For each (a, b) cell: the row count a CBO
    * would estimate for `a = x AND b = y AND pred` under (i) full
    * independence (sel(a)·sel(b)·sel(pred)·n — what multiplying
    * per-column histograms gives) and (ii) the q71
    * contingency-CORRECTED form (joint(a,b)·sel(pred)·n — the 2-D
    * joint replaces the a×b product, independence retained only for
    * the third predicate), each vs the actual count, errors in exact
    * bp. Integer grid throughout: estimates on the milli grid with
    * the division order written identically in the oracle (Spark div
    * and DuckDB // agree on nonnegative operands); r·c div n ≤ n
    * before the q_cnt multiply keeps every product ≤ n²·1000
    * (int64-safe to ~3×10⁶ rows/side — the q71 bound; pre-scale per
    * partition beyond that). Scale: two broadcast dimension
    * aggregates, one broadcast 1-row total, one |dims|²-cell frame —
    * all off one scan of `df`. */
  private[graft] def selectivityEstimates(df: DataFrame, a: String,
      b: String, pred: Column): DataFrame = {
    val joint = df.groupBy(col(a), col(b))
      .agg(count(lit(1)).as("joint_rows"),
        sum(when(pred, 1L).otherwise(0L)).as("actual_rows"))
    val rt = df.groupBy(col(a)).agg(count(lit(1)).as("r_tot"))
    val ct = df.groupBy(col(b)).agg(count(lit(1)).as("c_tot"))
    val tot = df.agg(count(lit(1)).as("n"),
      sum(when(pred, 1L).otherwise(0L)).as("q_rows"))
    joint.join(broadcast(rt), Seq(a)).join(broadcast(ct), Seq(b))
      .crossJoin(broadcast(tot))
      .withColumn("est_indep_milli",
        expr("(r_tot * c_tot div n) * q_rows * 1000 div n"))
      .withColumn("est_corr_milli",
        expr("joint_rows * q_rows * 1000 div n"))
      // q71's zero-guard rule: an empty cell reports 0 error with
      // actual_rows carrying the interpretation, never a div-by-zero
      .withColumn("err_indep_bp", when(col("actual_rows") === 0, 0L)
        .otherwise(expr(
          "abs(est_indep_milli - actual_rows * 1000) * 10 div actual_rows")))
      .withColumn("err_corr_bp", when(col("actual_rows") === 0, 0L)
        .otherwise(expr(
          "abs(est_corr_milli - actual_rows * 1000) * 10 div actual_rows")))
      .withColumn("corr_improves", col("err_corr_bp") <= col("err_indep_bp"))
      .select(col(a), col(b), col("actual_rows"), col("est_indep_milli"),
        col("est_corr_milli"), col("err_indep_bp"), col("err_corr_bp"),
        col("corr_improves"))
  }

  /** q72: SELECTIVITY-correction estimator — the consumer q71's audit
    * exists for (the q68 → writeEquiDepth closure applied to the
    * contingency table): estimate the conjunctive predicate
    * `l_returnflag = x AND l_linestatus = y AND l_quantity > 25` per
    * cell under independence vs with the q71 joint correcting the
    * correlated (returnflag, linestatus) pair, and report both errors
    * against the actual count — the table a cost-based optimizer
    * reads to decide when multiplied per-column selectivities are
    * lying (TPC-H's returnflag⇔linestatus coupling makes independence
    * misestimate by orders of magnitude on the R/O and A/O cells). */
  def q72SelectivityCorrect(s: SparkSession, d: String): DataFrame =
    selectivityEstimates(Tables.lineitem(s, d), "l_returnflag",
      "l_linestatus", col("l_quantity") > 25)

  /** q73: the estimator DECIDING — closes the statistic→consumer
    * ladder q68→writeEquiDepth opened and q71→q72 extended, at the
    * decision a cost-based optimizer actually makes: per
    * (returnflag, linestatus) cell, q72's contingency-CORRECTED row
    * estimate picks the physical join strategy for that cell's
    * filtered lineitem→orders join. Cells estimated ≤ 5000 rows
    * (est_corr_milli ≤ 5·10⁶ — an ABSOLUTE autoBroadcastJoinThreshold
    * analog, deliberately not a relative quantile: at 100 TB "the
    * smaller half" is still petabytes, and a relative rule would
    * re-introduce the forced-broadcast-on-big-frames bug round 7
    * removed) route down a branch that BROADCASTS the estimated-small
    * lineitem slice into the orders join; the rest take the
    * shuffle-merge branch. The estimate table is driver-collected —
    * ∝ |cells|, the sanctioned statistic class, exactly what a CBO
    * reads at plan time — and the decision is PROVEN in the physical
    * plan (spec: BroadcastHashJoin on the small branch, SortMergeJoin
    * on the big one, on a planted corpus where both fire). Graded
    * output is strategy-INVARIANT in values (n_rows/n_custkeys equal
    * a plain join's) with the chosen strategy as a column, so the
    * DuckDB oracle replays the estimate arithmetic + threshold rule
    * and the hash proves the router decided identically cross-engine. */
  def q73StatsRoutedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val est = q72SelectivityCorrect(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("est_corr_milli"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val T = 5000L * 1000L // broadcast below 5000 estimated rows (milli grid)
    def keysOf(p: Long => Boolean) =
      est.filter(e => p(e._3)).map(e => s"${e._1}|${e._2}").toSeq
    val bKeys = keysOf(_ <= T)
    val sKeys = keysOf(_ > T)
    val li = Tables.lineitem(s, d).filter(col("l_quantity") > 25)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
      .withColumn("cell",
        concat_ws("|", col("l_returnflag"), col("l_linestatus")))
    val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    def agg(j: DataFrame, strat: String) = j
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_custkeys"))
      .withColumn("strategy", lit(strat))
    // the broadcast is SAFE because the estimator bounds the frame —
    // the q72 audit (err_corr_bp) is what makes trusting it honest
    val bJoin = orders.join(
      broadcast(li.filter(col("cell").isin(bKeys: _*))),
      col("o_orderkey") === col("l_orderkey"))
    val sJoin = orders.hint("MERGE").join(
      li.filter(col("cell").isin(sKeys: _*)),
      col("o_orderkey") === col("l_orderkey"))
    val estDf = est.toSeq
      .toDF("l_returnflag", "l_linestatus", "est_corr_milli")
    agg(bJoin, "broadcast").unionByName(agg(sJoin, "shuffle"))
      .join(broadcast(estDf), Seq("l_returnflag", "l_linestatus"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("est_corr_milli"), col("strategy"), col("n_rows"),
        col("n_custkeys"))
  }
}
