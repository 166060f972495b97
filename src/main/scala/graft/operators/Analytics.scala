package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The general SQL-transformation surface (featureform transformations
  * are arbitrary SQL over registered sources —
  * provider/offline.go:533 CreateTransformation,
  * provider/scripts/spark/offline_store_spark_runner.py). Exercised
  * here as declarative DataFrame plans over the TPC-H-ish corpus so
  * Catalyst gets the whole tree: filters push to the parquet scan,
  * small dims broadcast, aggregates partial-combine map-side.
  *
  * Money arithmetic is done in DECIMAL(18,4) so results are exact and
  * engine-independent (double sums are order-dependent).
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** TPC-H Q1: pricing summary. One scan, one shuffle, map-side combine.
    * Sums run in DECIMAL (exact, order-independent) and are emitted as
    * doubles; averages as exact-sum / count (see SparkEntry scaladoc).
    */
  def q1PricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        // scale-8 sums can exceed 2^53 unscaled (cast-to-double then
        // differs by 1 ulp between engines); reducing to scale 4 first
        // keeps the double conversion exact.
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
          .cast("decimal(38,4)").cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: revenue of open orders for one market segment.
    * No broadcast hint on customer: at bench scale Catalyst broadcasts
    * it from size stats anyway, and at warehouse scale (10^8+ rows)
    * forcing a broadcast would be wrong — AQE picks the join side at
    * runtime. The segment filter pushes to the customer scan either way.
    */
  def q3ShippingPriority(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      segment: String
  ): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(
        customer.where(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
        .cast("decimal(38,4)").cast("double").as("revenue"))
      .select(
        col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"),
        col("revenue"))

  /** TPC-H Q5-style: revenue per nation within one region. Broadcast
    * hints only on the provably-tiny dims (region: 5 rows, nation: 25 at
    * every SF); customer/supplier scale with the fact tables, so their
    * join strategy is left to stats + AQE.
    */
  def q5LocalSupplier(
      spark: SparkSession,
      dir: String,
      regionName: String
  ): DataFrame = {
    val region = Tables.load(spark, dir, "region").where(col("r_name") === regionName)
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(
        supplier,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
        .cast("decimal(38,4)").cast("double").as("revenue"))
  }

  /** Window functions: per-customer running spend + order rank. */
  def runningSpend(orders: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
      col("o_custkey"),
      col("o_orderkey"),
      sum(dec(col("o_totalprice")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"),
      row_number().over(w).cast("long").as("order_seq"))
  }

  /** Top-k rows per group (top orders per customer). */
  def topKPerGroup(orders: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rk"))
      .where(col("rk") <= k)
      .withColumnRenamed("rk", "price_rank")
  }

  /** Sessionization: 30-min inactivity gap splits a user's events into
    * sessions. lag + cumulative sum over one entity-partitioned sort —
    * the canonical single-shuffle shape.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events.select(
      col("user_id"),
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      when(
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) > gapUs,
        1).otherwise(0).as("new_sess"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    flagged
      .withColumn(
        "session_id",
        sum(col("new_sess")).over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
  }

  /** Pivot: event counts per user x event_type. */
  def eventPivot(events: DataFrame, eventTypes: Seq[String]): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot(col("event_type"), eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L)

  /** ROLLUP over region/nation of customer account balances. */
  def rollupBalances(
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame
  ): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"))

  /** Exact interpolated percentiles of order value per priority class. */
  def orderPercentiles(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
        count(lit(1)).as("n"))

  /** Sketch-based percentiles — the 100 TB path. Exact `percentile`
    * buffers every value per group; `approx_percentile` keeps a
    * bounded mergeable sketch per partition (map-side combined), so
    * memory is O(accuracy) per group however large the input. Error is
    * bounded by 1/accuracy of rank; the exact variant stays the oracle
    * gate at test SFs (spec asserts the sketch tracks it).
    */
  def orderPercentilesApprox(orders: DataFrame, accuracy: Int = 10000): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        round(approx_percentile(col("o_totalprice"), lit(0.5), lit(accuracy)), 4)
          .as("p50_approx"),
        count(lit(1)).as("n"))

  /** TPC-H Q10-style: top customers by returned-item revenue. Ordered
    * top-N via sort+limit (TakeOrdered — per-partition top-N, no global
    * sort shuffle).
    */
  def q10ReturnedItems(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      nation: DataFrame,
      topN: Int
  ): DataFrame =
    lineitem
      .where(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
        .cast("decimal(38,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(topN)

  /** TPC-H Q6-style forecast revenue: a pure predicate-pushdown scan —
    * every filter reaches the parquet reader (PushedFilters on shipdate
    * range, discount band, quantity cap), then one global sum with
    * map-side partial aggregation. The canonical "scan-speed at 100 TB"
    * query: no join, no wide shuffle, one exchange of partial sums.
    */
  def q6ForecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .where(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("decimal(38,4)").cast("double").as("revenue"))

  /** TPC-H Q4-style order-priority check: orders with at least one late
    * shipment (l_shipdate more than 60 days after the order date) —
    * an EXISTS expressed as a left_semi join whose equi-key is the
    * order and whose residual is the cross-table date inequality. The
    * semi join never multiplies rows and its build side prunes to two
    * columns.
    */
  def q4OrderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val late = lineitem.select(col("l_orderkey"), col("l_shipdate"))
    orders
      .join(
        late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q12-style: conditional CASE aggregation — line counts per
    * order-priority class (high vs low) by line status.
    */
  def q12PriorityClasses(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .cast("long").as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .cast("long").as("low_line_count"))

  /** Anti/semi-join surface (NOT EXISTS / EXISTS): customers without
    * and with orders per segment, using Spark's dedicated left_anti /
    * left_semi joins (no row multiplication, build side prunable).
    */
  def antiSemiCounts(customer: DataFrame, orders: DataFrame): DataFrame = {
    val anti = customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_no_orders"))
    val semi = customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    anti
      .join(semi, Seq("c_mktsegment"), "full_outer")
      .select(
        col("c_mktsegment"),
        coalesce(col("n_no_orders"), lit(0L)).as("n_no_orders"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"))
  }

  /** Correlated-subquery semantics, decorrelated: orders costing more
    * than 2x their customer's average order value. Expressed as
    * aggregate + re-join (what Catalyst's decorrelation produces for
    * the equivalent correlated SQL), so the shuffle is on o_custkey
    * once for the aggregate and once for the join.
    */
  def ordersAboveCustomerAvg(orders: DataFrame): DataFrame = {
    val custAvg = orders
      .groupBy(col("o_custkey"))
      .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
    orders
      .join(custAvg, "o_custkey")
      .where(col("o_totalprice") > col("avg_price") * 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** JSON property extraction from the events `props` column. */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
}
