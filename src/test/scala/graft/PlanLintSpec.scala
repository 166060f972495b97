package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over the ENTIRE query inventory — the static scale guard:
  * a new query (or a refactor of a shared helper) that introduces an
  * unblocked cartesian product or an unpartitioned window would pass
  * value checks at test SFs and only explode at cluster scale, so both
  * are failed here at plan time.
  *
  * BroadcastNestedLoopJoin is allowed: the brute-force kNN family
  * intentionally joins a broadcast query set under a non-equi predicate
  * (self-pair exclusion) — a broadcast × scan, not a shuffle blowup.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("no query plans a CartesianProduct or an unpartitioned Window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, GraftTestSession.Sf0001)
      val cart =
        if (df.queryExecution.sparkPlan.toString.contains("CartesianProduct"))
          Seq(s"$name: CartesianProduct") else Seq.empty
      val badWindows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => s"$name: unpartitioned Window"
      }
      cart ++ badWindows
    }
    assert(offenders.isEmpty, s"scale-unsafe plans:\n${offenders.mkString("\n")}")
  }
}
