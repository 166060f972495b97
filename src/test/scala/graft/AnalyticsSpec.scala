package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.sources.Tables

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("eventTransitions counts consecutive same-user steps only") {
    val ev = Seq(
      (1L, 1L, "view", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 00:01:00")),
      (3L, 1L, "purchase", ts("2024-01-01 00:02:00")),
      (4L, 2L, "view", ts("2024-01-01 00:00:00")),
      (5L, 2L, "view", ts("2024-01-01 00:05:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Analytics.eventTransitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        r.getAs[Long]("n"))
      .toMap
    assert(out == Map(
      ("view", "click") -> 1L, ("click", "purchase") -> 1L, ("view", "view") -> 1L))
  }

  test("retentionCohorts assigns first-week cohorts and counts distinct actives") {
    def d(day: Int) = ts(f"1970-01-${day + 1}%02d 10:00:00") // epoch days 0..
    val ev = Seq(
      ("a", d(0)), ("a", d(1)), ("a", d(8)), ("a", d(22)),   // weeks 0,1,3
      ("b", d(2)), ("b", d(3)),                              // week 0 (twice)
      ("c", d(9)), ("c", d(15))                              // weeks 1,2
    ).toDF("user_id", "ts")
    val out = Analytics.retentionCohorts(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        r.getAs[Long]("n_users"))
      .toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("pointInRangeJoin matches the naive theta join, inclusive on both ends") {
    val points = (0 until 50)
      .map(i => (i.toLong, ts(f"2024-01-01 ${i / 4}%02d:${(i % 4) * 15}%02d:00")))
      .toDF("pid", "p_ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:30:00")), // crosses buckets
      (101L, ts("2024-01-01 05:07:00"), ts("2024-01-01 05:08:00")), // matches nothing
      (102L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"))  // single instant
    ).toDF("iid", "i_start", "i_end")
    val got = Analytics
      .pointInRangeJoin(points, "pid", "p_ts", intervals, "iid", "i_start", "i_end",
        bucketUs = 3600L * 1000000L)
      .select("interval_id", "point_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .where(col("p_ts") >= col("i_start") && col("p_ts") <= col("i_end"))
      .select(col("iid"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.contains((100L, 4L)) && got.contains((100L, 10L)), "boundary points included")
    assert(!got.exists(_._1 == 101L))
    assert(got.contains((102L, 0L)), "zero-length interval keeps its instant")
  }

  test("trailingRangeSum: RANGE frame spans trailing time and equal-ts peers") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 12:00:00"), 2.0),
      (3L, 1L, ts("2024-01-02 06:00:00"), 4.0),  // 24h window: 12:00 + self
      (4L, 2L, ts("2024-01-01 00:00:00"), 8.0),  // equal-ts peers
      (5L, 2L, ts("2024-01-01 00:00:00"), 16.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics
      .trailingRangeSum(ev, "user_id", "ts", "event_id", "value", 24L * 3600L * 1000000L)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("trailing_sum"))
      .toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 3.0)
    assert(out(3L) == 6.0, "event at -18h in frame, event at -30h out")
    assert(out(4L) == 24.0 && out(5L) == 24.0, "equal-ts peers share the frame")
  }

  test("gapfillDaily zero-fills missing days across the corpus span") {
    val ev = Seq(
      ("a", ts("2024-01-01 05:00:00")),
      ("a", ts("2024-01-04 05:00:00")),
      ("b", ts("2024-01-02 00:00:00"))
    ).toDF("event_type", "ts")
    val out = Analytics.gapfillDaily(ev, "event_type", "ts")
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("day")) -> r.getAs[Long]("n"))
      .toMap
    val d0 = 19723L // 2024-01-01 epoch day
    assert(out.size == 8, "2 groups x 4 days")
    assert(out(("a", d0)) == 1L && out(("a", d0 + 1)) == 0L &&
      out(("a", d0 + 2)) == 0L && out(("a", d0 + 3)) == 1L)
    assert(out(("b", d0 + 1)) == 1L && out(("b", d0)) == 0L)
  }

  test("scd2Intervals closes each observation at the next and keeps the last open") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 10L, ts("2024-01-03 00:00:00"), 2.0),
      (3L, 11L, ts("2024-01-02 00:00:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics.scd2Intervals(ev, "user_id", "value", "ts", "event_id")
      .collect()
      .map(r => (r.getAs[Long]("entity"), r.getAs[Double]("value")) ->
        ((Option(r.getAs[java.lang.Long]("valid_to_us")), r.getAs[Boolean]("is_current"))))
      .toMap
    assert(out((10L, 1.0)) == ((Some(ts("2024-01-03 00:00:00").getTime * 1000L), false)))
    assert(out((10L, 2.0)) == ((None, true)))
    assert(out((11L, 9.0)) == ((None, true)))
  }

  test("sessionize splits on the inactivity gap") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:10:00")), // same session
      (3L, 1L, ts("2024-01-01 01:00:00")), // 50 min gap -> new session
      (4L, 2L, ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Analytics.sessionize(ev, 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) -> r.getAs[Long]("n_events"))
      .toMap
    assert(out == Map((1L, 0L) -> 2L, (1L, 1L) -> 1L, (2L, 0L) -> 1L))
  }

  test("sessionWindows: inclusive-boundary merge, >gap split, value sums") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.25),
      (2L, 1L, ts("2024-01-01 00:30:00"), 2.50), // EXACTLY gap apart -> still merges
      (3L, 1L, ts("2024-01-01 01:00:01"), 4.00), // gap + 1s -> new session
      (4L, 2L, ts("2024-01-01 00:00:00"), 8.00)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics.sessionWindows(ev, 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us")) ->
        ((r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))))
      .toMap
    def us(s: String) = ts(s).getTime * 1000L
    assert(out.size == 3)
    // session end = last event + gap
    assert(out((1L, us("2024-01-01 00:00:00"))) ==
      ((us("2024-01-01 01:00:00"), 2L, 3.75)))
    assert(out((1L, us("2024-01-01 01:00:01"))) ==
      ((us("2024-01-01 01:30:01"), 1L, 4.0)))
    assert(out((2L, us("2024-01-01 00:00:00"))) ==
      ((us("2024-01-01 00:30:00"), 1L, 8.0)))
  }

  test("zorderLayout: morton interleave by hand; buckets envelope both dimensions") {
    // custkey 5 = 101b, day 3 = 11b ->
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 = 1 | 2 | 0 | 8 | 16 = 27
    val orders = Seq(
      (5L, ts("1995-01-04 00:00:00")), // day 3 -> z = 27
      (0L, ts("1995-01-01 00:00:00"))  // day 0 -> z = 0
    ).toDF("o_custkey", "o_orderdate")
    val out = Analytics.zorderLayout(orders, bucketShift = 0).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("min_cust"), r.getAs[Long]("max_day"))))
      .toMap
    assert(out(27L) == ((1L, 5L, 3L)))
    assert(out(0L) == ((1L, 0L, 0L)))
  }

  test("copurchaseLift: basket-blocked pairs, duplicate lines collapse, exact lift") {
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 2L), // dup line for part 2 collapses
      (2L, 1L), (2L, 2L),
      (3L, 1L),
      (4L, 2L), (4L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Analytics.copurchaseLift(li, minCo = 2).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
        ((r.getAs[Long]("n_co"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("lift"))))
      .toMap
    // only (1,2) co-occurs twice; lift = 2*4/(3*3)
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == ((2L, 3L, 3L, 8.0 / 9.0)))
  }

  test("topKPerGroup keeps exactly the k best with rank ties") {
    val orders = Seq(
      (1L, 10L, 100.0, ts("2024-01-01 00:00:00")),
      (1L, 11L, 300.0, ts("2024-01-02 00:00:00")),
      (1L, 12L, 200.0, ts("2024-01-03 00:00:00")),
      (1L, 13L, 50.0, ts("2024-01-04 00:00:00"))
    ).toDF("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    val keys = Analytics.topKPerGroup(orders, 2)
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    assert(keys == Set(11L, 12L))
  }

  test("approx percentile sketch tracks the exact percentile") {
    val orders = Tables.load(spark, GraftTestSession.Sf0001, "orders")
    val exact = Analytics.orderPercentiles(orders).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val approx = Analytics.orderPercentilesApprox(orders).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50_approx")).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) / exact(k) < 0.02, s"p50 drift for $k: $v vs ${exact(k)}")
    }
  }

  test("histogram quantiles track exact percentiles within one bin width") {
    val orders = Tables.load(spark, GraftTestSession.Sf0001, "orders")
    val exact = Analytics.orderPercentiles(orders).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"))).toMap
    val hist = Analytics.histogramQuantiles(
      orders, "o_orderpriority", "o_totalprice",
      lo = 0.0, width = 128.0, nBins = 8192, qs = Seq(0.25, 0.5, 0.75))
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("q")) -> r.getAs[Double]("est_value"))
      .toMap
    // The estimate lands in the bin containing the target rank; the
    // exact interpolated percentile can sit up to one inter-order-stat
    // gap away (large at small SF), so the gate is relative.
    exact.foreach { case (k, (p25, p50, p75)) =>
      assert(math.abs(hist((k, 0.25)) - p25) / p25 < 0.02, s"$k p25")
      assert(math.abs(hist((k, 0.5)) - p50) / p50 < 0.02, s"$k p50")
      assert(math.abs(hist((k, 0.75)) - p75) / p75 < 0.02, s"$k p75")
    }
    // exactly one row per (group, quantile)
    assert(hist.size == exact.size * 3)
  }

  test("histogram quantiles clamp out-of-range values into edge bins") {
    val df = Seq(("g", -50.0), ("g", 10.0), ("g", 20.0), ("g", 1e9))
      .toDF("grp", "v")
    val out = Analytics.histogramQuantiles(df, "grp", "v", 0.0, 16.0, 4, Seq(0.5))
      .collect()
    assert(out.length == 1)
    // bins: -50 -> 0, 10 -> 0, 20 -> 1, 1e9 -> 3 (clamped); median in bin 0
    assert(out.head.getAs[Long]("bin") == 0L)
    assert(out.head.getAs[Long]("n") == 4L)
  }

  test("q1 pricing summary sums are exact decimals emitted as doubles") {
    val li = Tables.load(spark, GraftTestSession.Sf0001, "lineitem")
    val out = Analytics.q1PricingSummary(li).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("count_order")).sum
    assert(total == li.count())
  }

  test("eventPivot counts fill missing combinations with zero") {
    val ev = Seq((1L, "click"), (1L, "click"), (2L, "view"))
      .toDF("user_id", "event_type")
    val rows = Analytics.eventPivot(ev, Seq("click", "view")).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("click"), r.getAs[Long]("view")))
      .toMap
    assert(rows == Map(1L -> ((2L, 0L)), 2L -> ((0L, 1L))))
  }

  test("cube emits all four grouping sets with matching grouping ids") {
    val cust = Tables.load(spark, GraftTestSession.Sf0001, "customer")
    val nat = Tables.load(spark, GraftTestSession.Sf0001, "nation")
    val reg = Tables.load(spark, GraftTestSession.Sf0001, "region")
    val rows = Analytics.cubeBalances(cust, nat, reg).collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 2L, 3L)) // (r,seg), (r), (seg), ()
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_cust") == cust.count())
  }

  test("q13 counts order-less customers in the zero bucket and excludes urgent orders") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val ords = Seq(
      (10L, 1L, "5-LOW"), (11L, 1L, "5-LOW"),
      (12L, 2L, "1-URGENT") // excluded -> customer 2 lands in the 0 bucket
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val dist = Analytics.q13CustomerDistribution(cust, ords).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    assert(dist == Map(2L -> 1L, 0L -> 2L))
  }

  test("q15 returns every supplier tied at the maximum revenue") {
    val li = Seq(
      (1L, 100.0, 0.0, ts("1996-02-01 00:00:00")),
      (2L, 100.0, 0.0, ts("1996-02-01 00:00:00")),
      (3L, 50.0, 0.0, ts("1996-02-01 00:00:00")),
      (1L, 999.0, 0.0, ts("1997-01-01 00:00:00")) // outside the quarter
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((1L, "s1"), (2L, "s2"), (3L, "s3")).toDF("s_suppkey", "s_name")
    val top = Analytics.q15TopSupplier(li, supp, "1996-01-01").collect()
      .map(_.getAs[String]("s_name")).toSet
    assert(top == Set("s1", "s2"))
  }

  test("q17 keeps only lineitems below half the part's average quantity") {
    // part 1: quantities 10, 10, 1 -> avg 7, half 3.5 -> only the 1 qualifies
    val li = Seq(
      (1L, 10.0, 100.0), (1L, 10.0, 100.0), (1L, 1.0, 7.0),
      (2L, 5.0, 999.0) // not Brand#13
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#13"), (2L, "Brand#22")).toDF("p_partkey", "p_brand")
    val out = Analytics.q17SmallQuantityRevenue(li, part, "Brand#13").collect()
    assert(out.length == 1 && math.abs(out(0).getAs[Double]("avg_yearly") - 1.0) < 1e-9)
  }

  test("q21 picks exactly the last-shipping supplier of multi-supplier F orders") {
    val ords = Seq((1L, "F"), (2L, "F"), (3L, "O")).toDF("o_orderkey", "o_orderstatus")
    val li = Seq(
      // order 1: supplier 20 ships last -> 20 waited on; supplier 10 not
      (1L, 10L, ts("1996-01-01 00:00:00")),
      (1L, 20L, ts("1996-06-01 00:00:00")),
      // order 2: single supplier -> nobody qualifies (no one waited)
      (2L, 10L, ts("1996-01-01 00:00:00")),
      // order 3: status O -> ignored entirely
      (3L, 20L, ts("1996-01-01 00:00:00"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "s10"), (20L, "s20")).toDF("s_suppkey", "s_name")
    val out = Analytics.q21WaitingSupplier(ords, li, supp).collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    assert(out == Map("s20" -> 1L))
  }

  test("q21 ties at the order's last ship date all count as waited-on") {
    val ords = Seq((1L, "F")).toDF("o_orderkey", "o_orderstatus")
    val li = Seq(
      (1L, 10L, ts("1996-06-01 00:00:00")),
      (1L, 20L, ts("1996-06-01 00:00:00"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "s10"), (20L, "s20")).toDF("s_suppkey", "s_name")
    val out = Analytics.q21WaitingSupplier(ords, li, supp).collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    assert(out == Map("s10" -> 1L, "s20" -> 1L))
  }

  test("q22 excludes customers with recent orders and below-average balances") {
    val cust = Seq(
      (1L, 1, 100.0),  // above avg(pos)=55 but has a recent order -> excluded
      (2L, 1, 90.0),   // above avg, dormant -> kept
      (3L, 2, 10.0),   // below avg -> excluded
      (4L, 2, -50.0)   // negative: excluded from avg AND below it
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    // avg over positive balances = (100 + 90 + 10) / 3 = 66.67
    val ords = Seq(
      (10L, 1L, ts("2000-01-01 00:00:00")), // recent -> customer 1 excluded
      (11L, 2L, ts("1998-01-01 00:00:00"))  // old -> customer 2 stays dormant
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Analytics.q22DormantCustomers(cust, ords, "1999-01-01").collect()
      .map(r => r.getAs[Long]("c_nationkey") -> (r.getAs[Long]("numcust"), r.getAs[Double]("totacctbal")))
      .toMap
    assert(out == Map(1L -> ((1L, 90.0))))
  }

  test("funnel counts only users whose stages happen strictly in order") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: clicked BEFORE first view -> stops at view
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: view + click, no purchase
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 10:30:00")),
      // user 4: purchase only -> no funnel entry
      (4L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics
      .funnel(ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getAs[String]("stage") ->
        ((r.getAs[Long]("stage_idx"), r.getAs[Long]("n_users"))))
      .toMap
    assert(out("view") == ((0L, 3L)))
    assert(out("click") == ((1L, 2L)))
    assert(out("purchase") == ((2L, 1L)))
  }

  test("funnel tie timestamps do not advance the stage (strict ordering)") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")) // simultaneous -> not after
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics
      .funnel(ev, "user_id", "event_type", "ts", Seq("view", "click"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map("view" -> 1L, "click" -> 0L))
  }

  test("q2 picks the min-unit-cost supplier per part within the region, keeping ties") {
    val part = Seq((1L, "p1", 2), (2L, "p2", 2), (3L, "p3", 9)).toDF("p_partkey", "p_name", "p_size")
    val supp = Seq((10L, "s10", 0, 5.0), (20L, "s20", 0, 7.0), (30L, "s30", 1, 9.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nat = Seq((0, "n0", 0), (1, "n1", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val li = Seq(
      // part 1: s10 charges unit 2.0 (and once 4.0); s20 charges 3.0 -> s10 wins
      (1L, 10L, 2.0, 4.0), (1L, 10L, 1.0, 4.0), (1L, 20L, 2.0, 6.0),
      // part 2: s10 and s20 tie at unit 5.0 -> both kept
      (2L, 10L, 1.0, 5.0), (2L, 20L, 2.0, 10.0),
      // part 3: size 9 -> filtered out; s30 is EUROPE -> filtered out
      (3L, 10L, 1.0, 1.0), (1L, 30L, 1.0, 0.5)
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val out = Analytics
      .q2MinCostSupplier(part, supp, nat, reg, li, maxSize = 3, regionName = "ASIA")
      .collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("s_name")) ->
        r.getAs[Double]("supply_cost"))
      .toMap
    assert(out == Map((1L, "s10") -> 2.0, (2L, "s10") -> 5.0, (2L, "s20") -> 5.0))
  }

  test("q11 keeps parts whose value exceeds the fraction of the nation total") {
    val supp = Seq((10L, 0), (20L, 1)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((0, "N0"), (1, "N1")).toDF("n_nationkey", "n_name")
    val li = Seq(
      // nation N0 (supplier 10) totals: part 1 = 800, part 2 = 150, part 3 = 50
      (1L, 10L, 800.0, 0.0),
      (2L, 10L, 300.0, 0.5),
      (3L, 10L, 50.0, 0.0),
      // supplier 20 is N1 -> ignored
      (1L, 20L, 9999.0, 0.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    // total = 1000; fraction 0.1 -> threshold 100 -> parts 1 and 2 kept
    val out = Analytics.q11ImportantParts(supp, nat, li, "N0", fraction = 0.1)
      .collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Double]("part_value"))
      .toMap
    assert(out == Map(1L -> 800.0, 2L -> 150.0))
  }

  test("groupingSetsBalances materializes exactly the three requested sets") {
    val cust = Seq(
      (1L, 0L, "BUILDING", 10.0),
      (2L, 0L, "AUTO", 20.0),
      (3L, 1L, "BUILDING", 40.0)
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val nat = Seq((0L, "N0", 0L), (1L, "N1", 1L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0L, "R0"), (1L, "R1")).toDF("r_regionkey", "r_name")
    val rows = Analytics.groupingSetsBalances(cust, nat, reg).collect()
    // 3 (r,seg) pairs + 2 region subtotals + 2 segment subtotals, no grand total
    assert(rows.length == 7)
    assert(!rows.exists(r => r.isNullAt(0) && r.isNullAt(1)), "no grand-total row")
    val regionOnly = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(r => r.getAs[String]("r_name") -> r.getAs[Double]("sum_bal")).toMap
    assert(regionOnly == Map("R0" -> 30.0, "R1" -> 40.0))
    val segOnly = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n_cust")).toMap
    assert(segOnly == Map("BUILDING" -> 2L, "AUTO" -> 1L))
  }

  test("unpivotEventCounts inverts the pivot back to long EAV rows") {
    val ev = Seq(
      (1L, "click"), (1L, "click"), (1L, "view"), (2L, "purchase")
    ).toDF("user_id", "event_type")
    val out = Analytics.unpivotEventCounts(ev, Seq("click", "view", "purchase"))
      .collect()
      .map(r => (r.getAs[Long]("entity"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n_events"))
      .toMap
    assert(out.size == 6) // 2 entities x 3 types, zeros included
    assert(out((1L, "click")) == 2L && out((1L, "view")) == 1L)
    assert(out((1L, "purchase")) == 0L && out((2L, "purchase")) == 1L)
    assert(out((2L, "click")) == 0L)
  }

  test("skyline2d: frontier exact vs quadratic dominance; duplicates and x-ties kept right") {
    val pts = Seq(
      (1L, 1.0, 5.0),  // frontier (cheapest)
      (2L, 2.0, 7.0),  // frontier
      (3L, 2.0, 7.0),  // duplicate of 2: mutually non-dominated, kept
      (4L, 2.0, 6.0),  // same x as 2, lower y: dominated
      (5L, 3.0, 7.0),  // same y as 2, higher x: dominated
      (6L, 4.0, 9.0),  // frontier
      (7L, 5.0, 1.0)   // dominated by everything cheaper & bigger
    ).toDF("id", "price", "size").repartition(3)
    val got = Analytics.skyline2d(pts, "id", "price", "size")
      .collect().map(_.getAs[Long]("id")).toSet
    // quadratic reference
    val raw = Seq((1L, 1.0, 5.0), (2L, 2.0, 7.0), (3L, 2.0, 7.0), (4L, 2.0, 6.0),
      (5L, 3.0, 7.0), (6L, 4.0, 9.0), (7L, 5.0, 1.0))
    val want = raw.filterNot { case (_, x, y) =>
      raw.exists { case (_, qx, qy) => qx <= x && qy >= y && (qx < x || qy > y) }
    }.map(_._1).toSet
    assert(got == want && got == Set(1L, 2L, 3L, 6L))
  }

  test("rfmSegments: exact ntile with big-groups-first remainder split") {
    // 6 users, k=4 -> quartile sizes 2,2,1,1 -> scores 1,1,2,2,3,4 in
    // metric order; all three metrics increase with user id here
    val events = (1L to 6L).flatMap { u =>
      (1L to u).map(i => (u, "purchase", u.toDouble * 10, ts(s"2024-01-0$u 00:00:00")))
    }.toDF("user_id", "event_type", "value", "ts")
    val out = Analytics
      .rfmSegments(events, "user_id", "event_type", "ts", "value", "purchase")
      .collect()
      .map(r => r.getAs[Long]("entity") ->
        ((r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))))
      .toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 6L -> 4L)
    out.foreach { case (u, (r, f, m)) =>
      assert(r == want(u) && f == want(u) && m == want(u), s"user $u scored ($r,$f,$m)")
    }
  }

  test("windowFunnel: earliest-greedy chain, strictly ordered, bounded by the window") {
    def ev(u: Long, t: String, ty: String) = (u, ty, ts(t))
    val events = Seq(
      // completes within a day
      ev(1, "2024-01-01 00:00:00", "click"), ev(1, "2024-01-01 01:00:00", "view"),
      ev(1, "2024-01-01 02:00:00", "purchase"),
      // purchase lands outside the 1-day window: depth 2
      ev(2, "2024-01-01 00:00:00", "click"), ev(2, "2024-01-01 01:00:00", "view"),
      ev(2, "2024-01-03 00:00:00", "purchase"),
      // skips the view stage: depth 1 even though a purchase exists
      ev(3, "2024-01-01 00:00:00", "click"), ev(3, "2024-01-01 01:00:00", "purchase"),
      // view BEFORE the first click doesn't count (strict ordering)
      ev(4, "2024-01-01 00:00:00", "view"), ev(4, "2024-01-01 01:00:00", "click"),
      // never clicks: not in the funnel at all
      ev(5, "2024-01-01 00:00:00", "view"), ev(5, "2024-01-01 01:00:00", "purchase")
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics
      .windowFunnel(events, "user_id", "event_type", "ts",
        Seq("click", "view", "purchase"), windowUs = 86400000000L)
      .collect().map(r => r.getAs[Long]("stage_idx") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(1L -> 4L, 2L -> 2L, 3L -> 1L))
  }

  test("abTestZScore: hash split partitions all users; z matches the closed form") {
    import graft.functions.TextFunctions
    // users 1..200; users with id <= 60 convert (id-keyed, split-agnostic)
    val evs = (1L to 200L).flatMap { u =>
      val base = Seq((u, "view"))
      if (u <= 60) base :+ ((u, "purchase")) else base
    }.toDF("user_id", "event_type")
    val r = Analytics
      .abTestZScore(evs, "user_id", col("event_type") === "purchase", seed = 11L)
      .collect().head
    val (nA, cA, nB, cB) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    assert(nA + nB == 200 && cA + cB == 60)
    // the split itself is the md5 parity, independently recomputed
    val wantNa = (1L to 200L).count { u =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"11:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0
    }
    assert(nA == wantNa)
    val pA = cA.toDouble / nA; val pB = cB.toDouble / nB
    val p = (cA + cB).toDouble / (nA + nB)
    val z = (pA - pB) / math.sqrt(p * (1.0 - p) * (1.0 / nA + 1.0 / nB))
    assert(r.getAs[Long]("z_micro") == math.floor(z * 1000000.0).toLong)
    // degenerate cohorts (everyone converts): z undefined -> NULL, no
    // ANSI divide-by-zero
    val all = (1L to 50L).map(u => (u, "purchase")).toDF("user_id", "event_type")
    val rd = Analytics
      .abTestZScore(all, "user_id", col("event_type") === "purchase", seed = 11L)
      .collect().head
    assert(rd.isNullAt(rd.fieldIndex("z_micro")))
  }

  test("eventPaths counts consecutive k-step sequences per entity; deterministic top-N cut") {
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "b", 4L), // paths a>b>c, b>c>b
      (2L, "a", 1L), (2L, "b", 2L), (2L, "c", 3L),                // path a>b>c
      (3L, "x", 1L), (3L, "y", 2L)                                // too short for 3 steps
    ).toDF("user_id", "event_type", "secs")
      .select(col("user_id"), col("event_type"),
        col("secs").cast("timestamp").as("ts"), col("secs").as("event_id"))
    val out = Analytics
      .eventPaths(ev, "user_id", "event_type", "ts", "event_id", steps = 3, topN = 2)
      .collect().map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
    assert(out.toSeq == Seq("a>b>c" -> 2L, "b>c>b" -> 1L))
  }

  test("multiTouchCredits: linear split conserves value_micro; strict pre-conversion frame") {
    val ev = Seq(
      // user 1: 2 clicks + 1 view before the purchase -> 2/3 vs 1/3 split
      (1L, "click", "2024-01-01 00:00:00", 0.0),
      (1L, "click", "2024-01-01 00:10:00", 0.0),
      (1L, "view", "2024-01-01 00:20:00", 0.0),
      (1L, "purchase", "2024-01-01 01:00:00", 10.0),
      // user 2: the only click is AT the purchase instant -> excluded
      // (frame is strictly before), so no touches at all
      (2L, "click", "2024-01-02 00:00:00", 0.0),
      (2L, "purchase", "2024-01-02 00:00:00", 5.0)
    ).toDF("user_id", "event_type", "s", "value")
      .select(col("user_id"), col("event_type"), col("s").cast("timestamp").as("ts"), col("value"))
    val out = Analytics
      .multiTouchCredits(
        ev, "user_id", "event_type", "ts", "value", "purchase",
        Seq("click", "view"), windowMinutes = 120L)
      .collect()
      .map(r => r.getAs[Long]("entity") ->
        ((r.getAs[Long]("n_click"), r.getAs[Long]("n_view"),
          r.getAs[Long]("credit_click_micro"), r.getAs[Long]("credit_view_micro"),
          r.getAs[Long]("remainder_micro"))))
      .toMap
    // 10.0 -> 10_000_000 micro; 2/3 = 6_666_666, 1/3 = 3_333_333, rem 1
    assert(out(1L) == ((2L, 1L, 6666666L, 3333333L, 1L)))
    // zero touches: all credit unattributed
    assert(out(2L) == ((0L, 0L, 0L, 0L, 5000000L)))
  }

  test("concurrencyPeak: overlap counts, midnight split, touching sessions concurrent") {
    // User 1: 00:00-00:10. User 2: 00:05-00:15 (overlaps 1) -> peak 2.
    // User 3: 23:50 day1 .. 00:20 day2 (one session, crosses midnight).
    // User 4: starts day2 00:20:00 exactly when 3's split-half is still
    // open -> closed-interval semantics count both at that instant.
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")), (2L, 1L, ts("2024-01-01 00:10:00")),
      (3L, 2L, ts("2024-01-01 00:05:00")), (4L, 2L, ts("2024-01-01 00:15:00")),
      (5L, 3L, ts("2024-01-01 23:50:00")), (6L, 3L, ts("2024-01-02 00:20:00")),
      (7L, 4L, ts("2024-01-02 00:20:00"))
    ).toDF("event_id", "user_id", "ts").withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0))
    val out = Analytics.concurrencyPeak(ev, 30).collect()
      .map(r => r.getAs[Long]("day_us") -> r.getAs[Long]("peak")).toMap
    val d1 = ts("2024-01-01 00:00:00").getTime * 1000L
    val d2 = d1 + 86400000000L
    assert(out == Map(d1 -> 2L, d2 -> 2L))
  }

  test("ewmaTrailing: exact power-of-two weights over present lags") {
    // One user, values 1,2,4 at t0<t1<t2, nLags=2 (weights 2,1):
    // row0: num=1M*2, den=2 -> 1_000_000
    // row1: num=2M*2+1M*1, den=3 -> 5M/3 = 1_666_666
    // row2: num=4M*2+2M*1, den=3 -> 10M/3 = 3_333_333
    val ev = Seq(
      (1L, 9L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 9L, ts("2024-01-01 00:01:00"), 2.0),
      (3L, 9L, ts("2024-01-01 00:02:00"), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics.ewmaTrailing(ev, "user_id", "ts", "event_id", "value", nLags = 2)
      .collect().map(r => r.getAs[Long]("tiebreak") -> r.getAs[Long]("ewma_micro")).toMap
    assert(out == Map(1L -> 1000000L, 2L -> 1666666L, 3L -> 3333333L))
  }

  test("rollingDistinct: trailing frame counts distinct values incl current row") {
    // user 9: a@t0, b@t0+1h, a@t0+2h, c@t0+26h (first two fall out of
    // the 24h frame at the last event -> distinct {a,c} = 2)
    val ev = Seq(
      (1L, 9L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 9L, ts("2024-01-01 01:00:00"), "b"),
      (3L, 9L, ts("2024-01-01 02:00:00"), "a"),
      (4L, 9L, ts("2024-01-02 02:00:00"), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Analytics
      .rollingDistinct(ev, "user_id", "ts", "event_id", "event_type", 86400000000L)
      .collect().map(r => r.getAs[Long]("tiebreak") -> r.getAs[Long]("n_distinct")).toMap
    // frame is inclusive on both ends: event 4 at +26h still sees
    // event 3 (+2h)? no: 26h - 2h = 24h exactly -> INCLUDED (range
    // bound is inclusive) -> distinct {a, c} = 2
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("funnelStageLatency: earliest-greedy deltas, window gate, exact integer stats") {
    // user 1: click@0, view@10m, purchase@30m -> dt12=10m, dt23=20m
    // user 2: click@0, view@5m, NO purchase -> only 1->2 (dt=5m)
    // user 3: click@0, view@25h (outside 1d window) -> excluded
    val ev = Seq(
      (1L, 1L, "click", ts("2024-01-01 00:00:00")),
      (2L, 1L, "view", ts("2024-01-01 00:10:00")),
      (3L, 1L, "purchase", ts("2024-01-01 00:30:00")),
      (4L, 2L, "click", ts("2024-01-01 00:00:00")),
      (5L, 2L, "view", ts("2024-01-01 00:05:00")),
      (6L, 3L, "click", ts("2024-01-01 00:00:00")),
      (7L, 3L, "view", ts("2024-01-02 01:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts").withColumn("value", lit(1.0))
    val out = Analytics.funnelStageLatency(
      ev, "user_id", "event_type", "ts",
      Seq("click", "view", "purchase"), windowUs = 86400000000L)
      .collect()
      .map(r => (r.getAs[Long]("stage_from"), r.getAs[Long]("stage_to")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_us"),
          r.getAs[Long]("min_us"), r.getAs[Long]("max_us"))))
      .toMap
    val m10 = 600000000L
    // 1->2: users 1 (10m) and 2 (5m): mean 7.5m
    assert(out((1L, 2L)) == ((2L, m10 * 3 / 4, m10 / 2, m10)))
    // 2->3: user 1 only (20m)
    assert(out((2L, 3L)) == ((1L, m10 * 2, m10 * 2, m10 * 2)))
  }
}
