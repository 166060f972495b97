package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.sources.Tables

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
}
