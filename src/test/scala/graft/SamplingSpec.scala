package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, GraftTestSession.Sf0001, "documents")

  test("kCenterSelect picks the greedy farthest-point sequence with min-id ties") {
    // 1D line: points at 0, 1, 10, 20 (ids 1..4). Seed = id 1 (x=0).
    // Round 2: farthest is x=20 (d=400). Round 3: min-dists are
    // 1 (x=1), 100 (x=10) -> pick x=10. Round 4: x=1 remains.
    val pts = Seq(
      (1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(10f)), (4L, Seq(20f))
    ).toDF("vec_id", "embedding")
    val out = Sampling.kCenterSelect(pts, "vec_id", "embedding", k = 4)
      .collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[Long]("id"), Option(r.get(r.fieldIndex("dist"))))))
      .toMap
    assert(out(1L)._1 == 1L && out(1L)._2.isEmpty)
    assert(out(2L) == ((4L, Some(400.0))))
    assert(out(3L) == ((3L, Some(100.0))))
    assert(out(4L) == ((2L, Some(1.0))))
  }

  test("perGroupBudget keeps exactly min(n, group size) rows, deterministically") {
    val out = Sampling.perGroupBudget(docs, "lang", "doc_id", n = 10, seed = 17L)
    val counts = out.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(10L, n), s"$lang budget")
    }
    val again = Sampling.perGroupBudget(docs, "lang", "doc_id", n = 10, seed = 17L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(again == out.select(col("doc_id")).collect().map(_.getLong(0)).toSet)
    val otherSeed = Sampling.perGroupBudget(docs, "lang", "doc_id", n = 10, seed = 18L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(otherSeed != again, "different seed should pick a different subset")
  }

  test("hashSample is deterministic, seed-sensitive, and near the target rate") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2, seed = 7L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2, seed = 7L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must select identical rows")
    val c = Sampling.hashSample(docs, "doc_id", 0.2, seed = 8L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a != c, "different seed must reshuffle the selection")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.2) < 0.08, s"rate drifted: ${a.size / n}")
    // a larger fraction with the same seed is a superset (thresholds nest)
    val wide = Sampling.hashSample(docs, "doc_id", 0.5, seed = 7L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wide))
  }

  test("hashSample boundary fractions keep none and (almost) all") {
    assert(Sampling.hashSample(docs, "doc_id", 0.0, seed = 1L).count() == 0)
    val kept = Sampling.hashSample(docs, "doc_id", 1.0, seed = 1L).count()
    assert(kept >= docs.count() - 1) // only an exact 0xffffffff hash drops
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val out = Sampling.stratifiedSample(
      docs, "lang", "doc_id", rates = Map("en" -> 1.0, "de" -> 0.0),
      defaultRate = 0.3, seed = 5L)
    val byLang = out.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("de", 0L) == 0L)
    assert(byLang("en") >= totals("en") - 1)
    val others = (byLang.keySet - "en" - "de").map(byLang(_)).sum.toDouble
    val othersTotal = (totals.keySet - "en" - "de").map(totals(_)).sum.toDouble
    assert(math.abs(others / othersTotal - 0.3) < 0.15)
  }

  test("prioritySample: top-k by w/u with the max(w, tau) estimator") {
    val rows = (1 to 100).map(i => (i.toLong, i.toDouble))
    val df = rows.toDF("id", "w")
    // Recompute the deterministic priorities outside Spark.
    def priority(id: Long, w: Double): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"9:$id".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
      w / u
    }
    val expected = rows.map { case (id, w) => (id, w, priority(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val tau = expected(10)._3 // the 11th priority
    val out = Sampling.prioritySample(df, "id", "w", k = 10, seed = 9L)
      .collect()
      .map(r => (r.getAs[Long]("rank"),
        (r.getAs[Long]("id"), r.getAs[Double]("weight"),
          r.getAs[Double]("priority"), r.getAs[Double]("est_weight"))))
      .toMap
    assert(out.size == 10)
    expected.take(10).zipWithIndex.foreach { case ((id, w, p), i) =>
      val (oid, ow, op, oest) = out(i + 1L)
      assert(oid == id && ow == w, s"rank ${i + 1}")
      assert(op == p, s"priority of $id must be bit-exact")
      assert(oest == math.max(w, tau), s"estimator of $id")
    }
    // Unbiasedness sanity: the estimator sum should be near the true
    // total (5050) — it IS the DLT unbiased estimator, one draw of it.
    val estSum = out.values.map(_._4).sum
    assert(estSum > 2000 && estSum < 13000, s"estimator sum $estSum wildly off")
  }

  test("prioritySample with k >= n keeps everything at its own weight") {
    val df = Seq((1L, 5.0), (2L, 7.0), (3L, 1.0)).toDF("id", "w")
    val out = Sampling.prioritySample(df, "id", "w", k = 10, seed = 1L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("weight"), r.getAs[Double]("est_weight")))).toMap
    assert(out.size == 3)
    // tau = 0 when there is no (k+1)-th row: est_weight == weight.
    out.values.foreach { case (w, est) => assert(est == w) }
  }

  test("prototypePrune keeps exactly the hardest ceil(n/2) of each cluster") {
    val rnd = new scala.util.Random(7)
    // Two separable blobs; within-blob spread gives a hardness order.
    val pts = (0 until 30).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f) else Array(0f, 1f)
      (i.toLong, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val out = graft.operators.Sampling
      .prototypePrune(pts, "vec_id", "embedding", k = 2, iterations = 2, hardFraction = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        (r.getAs[Long]("cluster"), r.getAs[Long]("hardness_rank"), r.getAs[Boolean]("kept"))))
      .toMap
    assert(out.size == 30)
    out.values.groupBy(_._1).foreach { case (_, rows) =>
      val n = rows.size
      assert(rows.map(_._2).toSeq.sorted == (1L to n).toSeq)
      val budget = math.ceil(n * 0.5).toLong
      rows.foreach { case (_, rnk, kept) => assert(kept == (rnk <= budget)) }
    }
    // hardness rank must follow ascending centroid similarity
    val assign = graft.operators.Similarity
      .clusterAssign(pts, "vec_id", "embedding", k = 2, iterations = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cluster"), r.getAs[Double]("csim")))).toMap
    out.groupBy(_._2._1).foreach { case (_, members) =>
      val byRank = members.toSeq.sortBy(_._2._2).map { case (id, _) => assign(id)._2 }
      assert(byRank == byRank.sorted, "ranks must order by ascending csim")
    }
  }

  test("mixture tags each source and samples it at its own rate") {
    val a = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("doc_id", "text")
    val b = Seq((10L, "b"), (11L, "b")).toDF("doc_id", "text")
    val out = Sampling.mixture(Seq(("A", a, 1.0), ("B", b, 0.0)), "doc_id", seed = 3L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("mix_source")))
    assert(out.forall(_._2 == "A"))
    assert(out.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L)) && out.nonEmpty)
  }

  test("temperatureSample: sqrt-scaled budgets upweight small groups, selection exact") {
    import org.apache.spark.sql.functions._
    // 900 'big' rows vs 100 'small' rows: plain proportional budgeting
    // gives small 10%, sqrt scaling gives it 25% (√100/(√900+√100))
    val df = ((1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureSample(df, "source", "doc_id", totalBudget = 100L, seed = 1L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // r_big = 30e6, r_small = 10e6, t = 40e6 → targets 75 / 25 exactly
    assert(bySrc == Map("big" -> 75, "small" -> 25))
    // deterministic: same seed reproduces the same ids
    val again = Sampling.temperatureSample(df, "source", "doc_id", 100L, seed = 1L)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(again == out.map(_._1).toSet)
    // a group smaller than its budget is capped at its size
    val tiny = ((1L to 4L).map(i => (i, "a")) ++ (5L to 400L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val capped = Sampling.temperatureSample(tiny, "source", "doc_id", 300L, seed = 1L)
      .collect().map(r => r.getAs[String]("source"))
    assert(capped.count(_ == "a") == 4) // min(4, budget share)
  }
}
