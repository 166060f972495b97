package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FeatureStore

class FeatureStoreSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // (entity, value, ts, event_id)
    (1L, 10.0, ts("2024-01-01 00:00:00"), 1L),
    (1L, 20.0, ts("2024-01-01 02:00:00"), 2L),
    (1L, 30.0, ts("2024-01-01 01:00:00"), 3L),
    (2L, 99.0, ts("2024-01-01 03:00:00"), 4L)
  ).toDF("user_id", "value", "ts", "event_id")

  test("materializeLatest keeps the latest value per entity") {
    val out = FeatureStore
      .materializeLatest(events, "user_id", "value", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 20.0, 2L -> 99.0))
  }

  test("materializeRange pages by entity order") {
    val m = FeatureStore.materializeLatest(events, "user_id", "value", "ts", "event_id")
    val page = FeatureStore.materializeRange(m, 1, 2).collect()
    assert(page.length == 1 && page.head.getAs[Long]("entity") == 2L)
  }

  test("trainingSet is an inclusive as-of join with deterministic tiebreaks") {
    val labels = Seq(
      (1L, 1.0, ts("2024-01-01 01:00:00"), 100L), // exactly at feature f2's ts
      (1L, 2.0, ts("2024-01-01 00:30:00"), 101L),
      (2L, 3.0, ts("2024-01-01 00:00:00"), 102L)  // before any feature
    ).toDF("user_id", "label_v", "ts", "event_id")
    val feats = Seq(
      (1L, 10.0, ts("2024-01-01 00:00:00")),
      (1L, 30.0, ts("2024-01-01 01:00:00")),
      (2L, 50.0, ts("2024-01-01 05:00:00"))
    ).toDF("user_id", "fv", "fts")
    val out = FeatureStore
      .trainingSet(
        labels, "user_id", "label_v", "ts", "event_id",
        Seq(FeatureStore.FeatureDef("f1", feats, "user_id", "fv", "fts")))
      .collect()
      .map(r => (r.getAs[Double]("label"), Option(r.getAs[Any]("f1"))))
      .toMap
    // label 1.0 at 01:00 sees the 01:00 feature (inclusive); label 2.0 at
    // 00:30 sees the 00:00 feature; label 3.0 precedes all features -> null
    assert(out == Map(1.0 -> Some(30.0), 2.0 -> Some(10.0), 3.0 -> None))
  }

  test("trainingSet carries non-numeric feature types through the as-of join") {
    val labels = Seq((1L, 1.0, ts("2024-01-01 01:00:00"), 1L))
      .toDF("user_id", "label_v", "ts", "event_id")
    val sFeat = Seq((1L, "gold", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "tier", "fts")
    val bFeat = Seq((1L, true, ts("2024-01-01 00:30:00")))
      .toDF("user_id", "active", "fts")
    val row = FeatureStore
      .trainingSet(
        labels, "user_id", "label_v", "ts", "event_id",
        Seq(
          FeatureStore.FeatureDef("tier", sFeat, "user_id", "tier", "fts"),
          FeatureStore.FeatureDef("active", bFeat, "user_id", "active", "fts")))
      .collect().head
    assert(row.getAs[String]("tier") == "gold")
    assert(row.getAs[Boolean]("active"))
  }

  test("lagged features shift visibility forward") {
    val labels = Seq((1L, 1.0, ts("2024-01-01 01:30:00"), 1L))
      .toDF("user_id", "label_v", "ts", "event_id")
    val feats = Seq((1L, 10.0, ts("2024-01-01 01:00:00")))
      .toDF("user_id", "fv", "fts")
    def run(lag: String): Option[Any] =
      FeatureStore
        .trainingSet(
          labels, "user_id", "label_v", "ts", "event_id",
          Seq(FeatureStore.FeatureDef(
            "f1", feats, "user_id", "fv", "fts", lag = Some(expr(s"INTERVAL $lag")))))
        .collect().map(r => Option(r.getAs[Any]("f1"))).head
    assert(run("10 MINUTES") == Some(10.0)) // visible from 01:10
    assert(run("1 HOUR") == None)           // visible only from 02:00
  }

  test("batchFeatures pivots the latest value per (entity, feature)") {
    val ev = Seq(
      (1L, "click", 1.0, ts("2024-01-01 00:00:00"), 1L),
      (1L, "click", 2.0, ts("2024-01-01 01:00:00"), 2L),
      (1L, "view", 9.0, ts("2024-01-01 00:00:00"), 3L)
    ).toDF("user_id", "event_type", "value", "ts", "event_id")
    val row = FeatureStore
      .batchFeatures(ev, "user_id", "event_type", "value", "ts", "event_id",
        Seq("click", "view")).collect().head
    assert(row.getAs[Double]("click") == 2.0 && row.getAs[Double]("view") == 9.0)
  }

  test("trainTestSplit is deterministic and entity-stable") {
    val df = (0L until 1000L).toDF("entity")
    val out = FeatureStore.trainTestSplit(df, "entity", 0.25)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 is uniform: 25% +- a few points
    assert(counts("test") > 180 && counts("test") < 320)
    val again = FeatureStore.trainTestSplit(df, "entity", 0.25)
    assert(out.except(again).count() == 0)
  }

  test("trainTestSplitShuffled: seed reproduces, re-seed re-shuffles") {
    val df = (0L until 1000L).toDF("entity")
    def split(seed: Long) = FeatureStore.trainTestSplitShuffled(df, "entity", 0.25, seed)
    val s42 = split(42L)
    val counts = s42.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("test") > 180 && counts("test") < 320)
    assert(s42.except(split(42L)).count() == 0)     // RandomState reproducibility
    assert(split(7L).except(s42).count() > 0)       // new seed = a different split
    // and the seeded split differs from the unseeded hash split
    assert(s42.except(FeatureStore.trainTestSplit(df, "entity", 0.25)).count() > 0)
  }

  test("materializeIncremental tiebreaks equal-ts rows like the full recompute") {
    // Delta re-delivers an equal-ts row for entity 1 with a LOWER
    // tiebreak than the existing winner: the merge must keep the
    // existing row, exactly as a full recompute over all events would.
    val existing = FeatureStore.materializeLatest(events, "user_id", "value", "ts", "event_id")
    val delta = Seq((1L, 77.0, ts("2024-01-01 02:00:00"), 0L))
      .toDF("user_id", "value", "ts", "event_id")
    val merged = FeatureStore
      .materializeIncremental(existing, delta, "user_id", "value", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = FeatureStore
      .materializeLatest(events.unionByName(delta), "user_id", "value", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(merged == full && merged(1L) == 20.0)
  }

  test("updateTrainingSet equals the full recompute, touching only delta entities") {
    val labels = Seq(
      (1L, 1.0, ts("2024-01-01 01:00:00"), 100L),
      (2L, 2.0, ts("2024-01-01 01:00:00"), 101L),
      (2L, 3.0, ts("2024-01-01 04:00:00"), 102L)  // arrives in the delta window
    ).toDF("user_id", "label_v", "ts", "event_id")
    val feats = Seq(
      (1L, 10.0, ts("2024-01-01 00:00:00")),
      (2L, 20.0, ts("2024-01-01 00:00:00")),
      (2L, 40.0, ts("2024-01-01 03:00:00"))       // arrives in the delta window
    ).toDF("user_id", "fv", "fts")
    val cut = ts("2024-01-01 02:00:00")
    def fd(src: org.apache.spark.sql.DataFrame) =
      Seq(FeatureStore.FeatureDef("f1", src, "user_id", "fv", "fts"))
    val previous = FeatureStore.trainingSet(
      labels.where(col("ts") <= cut), "user_id", "label_v", "ts", "event_id",
      fd(feats.where(col("fts") <= cut)))
    val changed = labels.where(col("ts") > cut).select(col("user_id"))
      .unionByName(feats.where(col("fts") > cut).select(col("user_id")))
    val updated = FeatureStore.updateTrainingSet(
      previous, labels, "user_id", "label_v", "ts", "event_id", fd(feats),
      changed, "user_id")
    val full = FeatureStore.trainingSet(
      labels, "user_id", "label_v", "ts", "event_id", fd(feats))
    assert(updated.except(full).count() == 0 && full.except(updated).count() == 0)
    // the refreshed set sees the delta: label 3.0 joins the 03:00 feature
    val got = updated.collect()
      .map(r => r.getAs[Double]("label") -> Option(r.getAs[Any]("f1"))).toMap
    assert(got(3.0) == Some(40.0))
  }

  test("materializeRange numbering is globally consistent across partitions") {
    // 500 entities >> shuffle partitions: offsets must stitch pages into
    // the exact global entity order with no gaps or dupes.
    val m = (0L until 500L).map(i => (i, i * 2.0)).toDF("entity", "value")
    val all = FeatureStore.materializeRange(m, 0, 500)
      .collect().map(r => (r.getAs[Long]("entity"), r.getAs[Long]("row_number")))
    assert(all.length == 500)
    assert(all.sortBy(_._2).map(_._1).toSeq == (0L until 500L).toSeq)
    val page = FeatureStore.materializeRange(m, 123, 140)
      .collect().map(_.getAs[Long]("entity")).sorted.toSeq
    assert(page == (123L until 140L).toSeq)
  }

  test("pagedMaterialization: iterating all pages reassembles the materialization exactly") {
    val m = (0L until 237L).map(i => (i, i * 2.0)).toDF("entity", "value")
    val pages = FeatureStore.pagedMaterialization(m, pageSize = 50L).toSeq
    // page bounds tile [0, total] with no gaps and a short last page
    assert(pages.map(p => (p._1, p._2)) ==
      Seq((0L, 50L), (50L, 100L), (100L, 150L), (150L, 200L), (200L, 237L)))
    // each page holds exactly its numbered slice, in global entity order
    for ((start, end, df) <- pages) {
      val rows = df.collect().map(r =>
        (r.getAs[Long]("entity"), r.getAs[Long]("row_number"))).sortBy(_._2)
      assert(rows.map(_._2).toSeq == ((start + 1) to end).toSeq, s"page ($start,$end]")
      assert(rows.map(_._1).toSeq == (start until end).toSeq)
    }
    // the union of pages IS the materialization: no dupes, no gaps
    val all = pages.map(_._3).reduce(_ unionByName _)
      .select("entity").collect().map(_.getLong(0)).sorted.toSeq
    assert(all == (0L until 237L).toSeq)
    // empty input -> no pages
    assert(FeatureStore.pagedMaterialization(
      Seq.empty[(Long, Double)].toDF("entity", "value"), 10L).isEmpty)
  }

  test("pagedMaterializationFixedPages: number-once pages equal the sliced form") {
    // r11 optimization gate: the fixed-page-count (full-export) form
    // numbers once and filters per page; every page must still hold
    // exactly its numbered slice, identical to pagedMaterialization's
    // partition-pruned slices at the same page size.
    val m = (0L until 237L).map(i => (i, i * 2.0)).toDF("entity", "value")
    val (psize, pagesIt) = FeatureStore.pagedMaterializationFixedPages(m, nPages = 5)
    val pages = pagesIt.toSeq
    assert(psize == 48L)
    assert(pages.map(p => (p._1, p._2)) ==
      Seq((0L, 48L), (48L, 96L), (96L, 144L), (144L, 192L), (192L, 237L)))
    val sliced = FeatureStore.pagedMaterialization(m, pageSize = psize).toSeq
    for (((start, end, df), (s2, e2, ref)) <- pages.zip(sliced)) {
      assert((start, end) == (s2, e2))
      val got = df.collect().map(r =>
        (r.getAs[Long]("entity"), r.getAs[Long]("row_number"))).sortBy(_._2).toSeq
      val want = ref.collect().map(r =>
        (r.getAs[Long]("entity"), r.getAs[Long]("row_number"))).sortBy(_._2).toSeq
      assert(got == want, s"page ($start,$end]")
    }
    // empty input -> no pages (and the lazy full numbering never runs)
    assert(FeatureStore.pagedMaterializationFixedPages(
      Seq.empty[(Long, Double)].toDF("entity", "value"), 4)._2.isEmpty)
  }

  test("featureDrift: identical windows score ~0, a shifted window drifts") {
    val ref = (0 until 100).map(i => ("stable", ts("2024-01-01 00:00:00"), i % 10 * 1.0)) ++
      (0 until 100).map(i => ("shifted", ts("2024-01-01 00:00:00"), i % 10 * 1.0))
    val cur = (0 until 100).map(i => ("stable", ts("2024-02-01 00:00:00"), i % 10 * 1.0)) ++
      // shifted feature: all current mass lands in the top reference bucket
      (0 until 100).map(_ => ("shifted", ts("2024-02-01 00:00:00"), 9.0))
    val events = (ref ++ cur).toDF("event_type", "ts", "value")
    val out = FeatureStore
      .featureDrift(events, "event_type", "value", "ts", "2024-01-15 00:00:00")
      .collect()
      .map(r => r.getAs[String]("feature") ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("psi"), r.getAs[Boolean]("drifted"))))
      .toMap
    val (nr, nc, psiStable, dStable) = out("stable")
    assert(nr == 100L && nc == 100L)
    assert(math.abs(psiStable) < 1e-9 && !dStable)
    val (_, _, psiShifted, dShifted) = out("shifted")
    assert(psiShifted > 0.25 && dShifted)
  }

  test("asofJoin: backward match within tolerance, stale/no-match null, ties by tiebreak") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L), // clicks at 9:30 & 9:40 -> latest fresh
      (2L, ts("2024-01-01 10:00:00"), 102L), // only a 7:00 click -> stale, nulls
      (3L, ts("2024-01-01 10:00:00"), 103L), // no clicks at all -> nulls
      (4L, ts("2024-01-01 10:00:00"), 104L)  // two clicks AT 10:00 -> higher event_id
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, 1.0, ts("2024-01-01 09:30:00"), 11L),
      (1L, 2.0, ts("2024-01-01 09:40:00"), 12L),
      (2L, 9.0, ts("2024-01-01 07:00:00"), 13L),
      (4L, 5.0, ts("2024-01-01 10:00:00"), 14L),
      (4L, 6.0, ts("2024-01-01 10:00:00"), 15L)
    ).toDF("user_id", "value", "ts", "event_id")
    val out = FeatureStore
      .asofJoin(
        left, "user_id", "ts", "event_id",
        right, "user_id", "value", "ts", "event_id",
        toleranceUs = Some(2L * 3600L * 1000000L))
      .collect()
      .map(r => r.getAs[Long]("entity") ->
        ((Option(r.getAs[java.lang.Double]("matched_value")),
          Option(r.getAs[java.lang.Long]("matched_ts_us")))))
      .toMap
    assert(out(1L)._1.contains(2.0), "latest fresh click wins")
    assert(out(2L) == ((None, None)), "match older than tolerance nulls out")
    assert(out(3L) == ((None, None)), "no right rows at all")
    assert(out(4L)._1.contains(6.0), "equal-ts ties resolve to highest tiebreak")
  }

  test("featureFreshness: age, recent volume, and staleness verdict") {
    val ev = Seq(
      ("fresh", ts("2024-01-14 23:00:00")), ("fresh", ts("2024-01-14 10:00:00")),
      ("stale", ts("2024-01-14 12:00:00"))
    ).toDF("event_type", "ts")
    val out = FeatureStore.featureFreshness(
      ev, "event_type", "ts", "2024-01-15 00:00:00",
      staleAfterUs = 6L * 3600L * 1000000L, recentWindowUs = 6L * 3600L * 1000000L)
      .collect()
      .map(r => r.getAs[String]("feature") ->
        ((r.getAs[Long]("age_us"), r.getAs[Long]("n_recent"), r.getAs[Boolean]("stale"))))
      .toMap
    assert(out("fresh") == ((3600000000L, 1L, false)))
    assert(out("stale") == ((12L * 3600000000L, 0L, true)))
  }

  test("mergeSumAggregate: stored partials + delta == full recompute") {
    val stored = Seq((1L, 10.0), (1L, 5.0), (2L, 7.0)).toDF("user_id", "value")
    val delta = Seq((1L, 2.5), (3L, 4.0)).toDF("user_id", "value")
    val merged = FeatureStore.mergeSumAggregate(
      FeatureStore.sumAggregate(stored, "user_id", "value"),
      delta, "user_id", "value")
      .collect()
      .map(r => r.getAs[Long]("entity") ->
        ((r.getDecimal(1).doubleValue(), r.getAs[Long]("n"))))
      .toMap
    assert(merged(1L) == ((17.5, 3L)), "key in both sides merges")
    assert(merged(2L) == ((7.0, 2L - 1L)), "stored-only key unchanged")
    assert(merged(3L) == ((4.0, 1L)), "delta-only key inserts")
  }

  test("targetEncodeLoo excludes the row's own label; singleton categories null") {
    val rows = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 9.0)
    ).toDF("event_id", "event_type", "value")
    val out = FeatureStore.targetEncodeLoo(rows, "event_id", "event_type", "value")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("loo_encoding")))
      .toMap
    assert(out(1L).contains(2.5) && out(2L).contains(2.0) && out(3L).contains(1.5))
    assert(out(4L).isEmpty, "n=1 has no leave-one-out mean")
  }

  test("featureOutliers flags only |z|>threshold rows; zero-variance emits none") {
    // Feature "a": 99 values at 10.0 and one at 1000.0 — the spike's z
    // is ~sqrt(99) ≈ 9.95 and every 10.0 sits at z ≈ -0.1.
    // Feature "b": constant → std = 0 → no rows at all.
    val rows =
      (1L to 99L).map(i => (i, "a", 10.0)) ++ Seq((100L, "a", 1000.0)) ++
        (200L to 250L).map(i => (i, "b", 7.0))
    val events = rows.toDF("event_id", "event_type", "value")
    val out = FeatureStore
      .featureOutliers(events, "event_id", "event_type", "value", zThreshold = 3.0)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("event_id") == 100L)
    assert(out(0).getAs[String]("feature") == "a")
    val z = out(0).getAs[Double]("z")
    assert(math.abs(z - math.sqrt(99.0)) < 1e-9, s"z=$z")
  }

  test("featureHash: fixed dims, signed integer weights, same value -> same slot") {
    val df = Seq(
      (1L, "gold", 7), (2L, "gold", 8), (3L, "silver", 7)
    ).toDF("id", "tier", "region")
    val out = FeatureStore.featureHash(
      df, "id", Seq("tier" -> col("tier"), "region" -> col("region")), dims = 16)
      .collect()
      .map(r => (r.getAs[Long]("entity"), r.getAs[Long]("feature_idx")) ->
        r.getAs[Long]("weight"))
      .toMap
    // every index in range; with 2 features per entity a within-entity
    // slot collision is legal (weights sum), so |w| <= 2
    assert(out.keys.forall { case (_, idx) => idx >= 0 && idx < 16 })
    assert(out.values.forall(w => math.abs(w) <= 2L))
    // same feature value lands in the same slot with the same sign
    val gold1 = out.filter { case ((e, _), _) => e == 1L }
    val gold2 = out.filter { case ((e, _), _) => e == 2L }
    val sharedGold = gold1.keySet.map(_._2).intersect(gold2.keySet.map(_._2))
    assert(sharedGold.nonEmpty, "entities 1 and 2 share the 'gold' slot")
    // entity 1 and 3 share region=7's slot
    val shared7 = gold1.keySet.map(_._2)
      .intersect(out.filter { case ((e, _), _) => e == 3L }.keySet.map(_._2))
    assert(shared7.nonEmpty, "entities 1 and 3 share the region=7 slot")
    // deterministic across runs
    val again = FeatureStore.featureHash(
      df, "id", Seq("tier" -> col("tier"), "region" -> col("region")), dims = 16)
      .collect()
      .map(r => (r.getAs[Long]("entity"), r.getAs[Long]("feature_idx")) ->
        r.getAs[Long]("weight"))
      .toMap
    assert(again == out)
  }

  test("featureMatrix densifies sparse COO rows; absent slots zero; nnz preserved") {
    val sparse = Seq(
      (1L, 3L, 2L), (1L, 7L, -1L), (2L, 0L, 1L)
    ).toDF("entity", "feature_idx", "weight")
    val out = FeatureStore.featureMatrix(sparse, dims = 8)
      .collect()
      .map(r => r.getAs[Long]("entity") -> r.getSeq[Long](r.fieldIndex("features")).toList)
      .toMap
    assert(out(1L) == List(0L, 0L, 0L, 2L, 0L, 0L, 0L, -1L))
    assert(out(2L) == List(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("featureDrift: constant reference (zero width) puts everything in bucket 0") {
    val events = (
      (0 until 50).map(_ => ("c", ts("2024-01-01 00:00:00"), 5.0)) ++
      (0 until 50).map(_ => ("c", ts("2024-02-01 00:00:00"), 5.0))
    ).toDF("event_type", "ts", "value")
    val r = FeatureStore
      .featureDrift(events, "event_type", "value", "ts", "2024-01-15 00:00:00")
      .collect()(0)
    assert(math.abs(r.getAs[Double]("psi")) < 1e-9)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("outliersMad flags by modified z-score; zero-MAD groups flag nothing") {
    val rows =
      (1 to 9).map(i => (i.toLong, "a", i.toDouble)) ++
        Seq((10L, "a", 100.0)) ++                      // the outlier
        (11 to 15).map(i => (i.toLong, "b", 7.0))      // zero spread
    val out = FeatureStore
      .outliersMad(rows.toDF("event_id", "event_type", "value"),
        "event_type", "value", "event_id", cutoff = 3.5)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("event_id") == 10L)
    // med = 5.5, mad = median(|v-5.5|) = 2.5, Mz = 94.5*0.6745/2.5
    assert(r.getAs[Double]("med") == 5.5 && r.getAs[Double]("mad") == 2.5)
    assert(math.abs(r.getAs[Double]("robust_z") - 94.5 * 0.6745 / 2.5) < 1e-12)
  }

  test("asofNearest picks the closer side, ties backward, null when no match") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // clicks at 09:50 and 10:00:30 -> fwd
      (1L, 101L, ts("2024-01-01 12:00:00")), // clicks at 11:00 and 13:00 -> tie, back
      (2L, 102L, ts("2024-01-01 10:00:00"))  // no clicks for user 2 -> null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 201L, ts("2024-01-01 09:50:00"), 1.0),
      (1L, 202L, ts("2024-01-01 10:00:30"), 2.0),
      (1L, 203L, ts("2024-01-01 11:00:00"), 3.0),
      (1L, 204L, ts("2024-01-01 13:00:00"), 4.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = FeatureStore
      .asofNearest(left, "user_id", "ts", "event_id",
        right, "user_id", "value", "ts", "event_id")
      .collect()
      .map(r => r.getAs[Long]("left_id") ->
        ((Option(r.get(r.fieldIndex("matched_value"))),
          r.getAs[String]("direction"))))
      .toMap
    assert(out(100L) == ((Some(2.0), "fwd")))  // 30s fwd beats 10m back
    assert(out(101L) == ((Some(3.0), "back"))) // exact tie -> backward
    assert(out(102L) == ((None, null)))
  }

  test("leakageAudit: future features counted as leaks, sound rows report staleness") {
    val rows = Seq(
      ("naive", 1000L, 1500L), // leak, lead 500
      ("naive", 1000L, 900L),  // sound, staleness 100
      ("pit", 1000L, 400L),    // sound, staleness 600
      ("pit", 2000L, 2000L)    // exactly-at-label is sound (<=)
    ).toDF("method", "label_ts_us", "f_ts_us")
    val out = FeatureStore.leakageAudit(rows, "method", "label_ts_us", "f_ts_us")
      .collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_leaks"),
          r.getAs[Long]("max_lead_us"), r.getAs[Long]("max_staleness_us"))))
      .toMap
    assert(out("naive") == ((2L, 1L, 500L, 100L)))
    assert(out("pit") == ((2L, 0L, 0L, 600L)))
  }

  test("mergeJoinView: stored view + three delta terms = full recompute, incl. delta x delta") {
    val oldA = Seq((1L, 10L, "a1"), (2L, 20L, "a2")).toDF("k", "ak", "av")
    val dA = Seq((3L, 30L, "a3"), (4L, 10L, "a4")).toDF("k", "ak", "av")
    val oldB = Seq((10L, "b10"), (20L, "b20")).toDF("bk", "bv")
    val dB = Seq((30L, "b30")).toDF("bk", "bv") // matches ONLY the delta-A row 3
    val cond = (a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =>
      a("ak") === b("bk")
    val stored = oldA.join(oldB, cond(oldA, oldB))
    val incr = FeatureStore.mergeJoinView(stored, oldA, dA, oldB, dB, cond)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("bv"))).toSet
    val full = oldA.unionByName(dA).join(oldB.unionByName(dB), $"ak" === $"bk")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("bv"))).toSet
    assert(incr == full)
    assert(incr.contains((3L, "b30")), "the delta x delta corner must be present")
    assert(incr.contains((4L, "b10")), "delta-A against old-B")
  }

  test("dataContract reports violations per check from one pass") {
    import FeatureStore.ContractCheck._
    val df = Seq(
      (1L, Some(5.0), "click"),
      (2L, None, "click"),
      (2L, Some(50.0), "zap"),
      (3L, Some(-1.0), "view")
    ).toDF("id", "v", "kind")
    val out = FeatureStore
      .dataContract(df, Seq(
        NotNull("v"), InRange("v", 0.0, 10.0), InSet("kind", Seq("click", "view")),
        Unique("id")))
      .collect()
      .map(r => (r.getAs[String]("check"), r.getAs[String]("column_name")) ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass")))
      .toMap
    assert(out(("not_null", "v")) == (1L, false))
    assert(out(("in_range", "v")) == (2L, false)) // 50.0 and -1.0; null not counted
    assert(out(("in_set", "kind")) == (1L, false)) // "zap"
    assert(out(("unique", "id")) == (1L, false)) // id 2 twice
    assert(out.values.forall(_._1 >= 0L))
  }

  test("dataContract passes on a clean frame") {
    import FeatureStore.ContractCheck._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val out = FeatureStore
      .dataContract(df, Seq(NotNull("v"), InRange("v", 0.0, 10.0), Unique("id")))
      .collect()
    assert(out.forall(_.getAs[Boolean]("pass")))
    assert(out.forall(_.getAs[Long]("n_rows") == 2L))
  }

  test("cdcApply: latest change wins, deletes remove, untouched keys keep snapshot") {
    val snap = Seq(
      (1L, 10.0, 100L),
      (2L, 20.0, 100L),
      (3L, 30.0, 100L)
    ).toDF("entity", "value", "ts_us")
    val chg = Seq(
      // entity 1: update then delete (delete is later) -> gone
      ("U", 1L, 11.0, 200L, 1L),
      ("D", 1L, 0.0, 300L, 2L),
      // entity 2: two updates, same ts -> higher seq wins
      ("U", 2L, 21.0, 200L, 3L),
      ("U", 2L, 22.0, 200L, 4L),
      // entity 4: fresh insert
      ("I", 4L, 40.0, 200L, 5L)
    ).toDF("op", "entity", "value", "ts_us", "seq")
    val out = FeatureStore.cdcApply(snap, chg)
      .collect().map(r => r.getAs[Long]("entity") -> r.getAs[Double]("value")).toMap
    assert(out == Map(2L -> 22.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("cdcApply: a change always outdates its snapshot row, whatever the ts") {
    val snap = Seq((1L, 10.0, 500L)).toDF("entity", "value", "ts_us")
    // change ts is BEFORE the snapshot ts — the changelog postdating the
    // snapshot is the contract, so the change still wins.
    val chg = Seq(("U", 1L, 11.0, 100L, 1L)).toDF("op", "entity", "value", "ts_us", "seq")
    val out = FeatureStore.cdcApply(snap, chg).collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 11.0)
  }

  test("serveWithTtl: stale entities read as a miss (NULL), not a stale hit") {
    val mat = Seq(
      (1L, 10.0, ts("2024-01-10 00:00:00")), // fresh at serving time
      (2L, 20.0, ts("2024-01-01 00:00:00"))  // 9 days old: expired
    ).toDF("entity", "value", "ts")
      .withColumn("_serve_ts", lit(ts("2024-01-10 12:00:00")))
    val out = FeatureStore
      .serveWithTtl(mat, col("_serve_ts"), expr("INTERVAL 3 DAYS"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(1L) == ((Some(10.0), true, 12L * 3600 * 1000000)))
    assert(out(2L)._1.isEmpty && !out(2L)._2) // stale: NULL value, fresh=false
    assert(out(2L)._3 == (9L * 24 + 12) * 3600 * 1000000) // age still reported
  }

  test("onDemandServe: derived columns see joined features, misses surface as NULL") {
    val requests = Seq((1L, 100.0), (2L, 50.0)).toDF("entity", "amount")
    val fa = Seq((1L, 4.0)).toDF("entity", "value") // entity 2 has no feature
    val out = FeatureStore
      .onDemandServe(
        requests,
        Seq("f_a" -> fa),
        Seq("boosted" -> (col("amount") + coalesce(col("f_a"), lit(0.0)) * 10)))
      .collect()
      .map(r => r.getAs[Long]("entity") ->
        ((Option(r.getAs[Any]("f_a")), r.getAs[Double]("boosted")))).toMap
    assert(out(1L) == ((Some(4.0), 140.0)))
    assert(out(2L) == ((None, 50.0))) // missing feature = NULL into the derivation
  }

  test("mapEntities: aliases resolve through the mapping, unmapped ids pass through") {
    val df = Seq((17L, 1.0), (10L, 2.0), (3L, 3.0)).toDF("user_id", "v")
    val mapping = Seq((17L, 10L)).toDF("alias_id", "canonical_id")
    val out = FeatureStore
      .mapEntities(df, "user_id", mapping, "alias_id", "canonical_id")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("v"))).toSet
    assert(out == Set((10L, 1.0), (10L, 2.0), (3L, 3.0)))
  }

  test("pagedMaterialization composite order: repeated entities page deterministically") {
    val rows = Seq(
      (1L, 10.0, 100L), (1L, 11.0, 200L), (1L, 12.0, 300L),
      (2L, 20.0, 100L), (2L, 21.0, 200L)
    ).toDF("entity", "value", "ts_us").repartition(3)
    val pages = FeatureStore
      .pagedMaterialization(rows, pageSize = 2L, orderCols = Seq("entity", "ts_us"))
      .map { case (start, end, df) =>
        (start, end,
          df.orderBy("row_number")
            .collect().map(r => (r.getAs[Long]("entity"), r.getAs[Long]("ts_us"))).toSeq)
      }.toSeq
    assert(pages.map(p => (p._1, p._2)) == Seq((0L, 2L), (2L, 4L), (4L, 5L)))
    assert(pages.map(_._3) == Seq(
      Seq((1L, 100L), (1L, 200L)),
      Seq((1L, 300L), (2L, 100L)),
      Seq((2L, 200L))))
  }

  test("rollingFeatures: point-in-time clean trailing windows, per horizon") {
    val ev = Seq(
      // entity 1: clicks at 00:00, 00:30, 02:00; purchase at 02:30
      (1L, 5.0, ts("2024-01-01 00:00:00"), "click", 1L),
      (1L, 7.0, ts("2024-01-01 00:30:00"), "click", 2L),
      (1L, 9.0, ts("2024-01-01 02:00:00"), "click", 3L),
      (1L, 99.0, ts("2024-01-01 02:30:00"), "purchase", 4L),
      // entity 2: a click AT the purchase instant must NOT leak in
      (2L, 1.0, ts("2024-01-01 01:00:00"), "click", 5L),
      (2L, 50.0, ts("2024-01-01 01:00:00"), "purchase", 6L)
    ).toDF("user_id", "value", "ts", "event_type", "event_id")
    val out = FeatureStore
      .rollingFeatures(ev, "user_id", "ts", "event_type", "value",
        "purchase", "click", Seq("1h" -> 3600000000L, "24h" -> 86400000000L))
      .collect()
      .map(r => r.getAs[Long]("entity") ->
        ((r.getAs[Long]("n_1h"), r.getAs[Double]("sum_1h"),
          r.getAs[Long]("n_24h"), r.getAs[Double]("sum_24h")))).toMap
    // 1h frame (01:30, 02:30): only the 02:00 click; 24h: all three
    assert(out(1L) == ((1L, 9.0, 3L, 21.0)))
    // same-instant click excluded from both horizons
    assert(out(2L) == ((0L, 0.0, 0L, 0.0)))
  }

  test("onlineExport: shards partition the rows; checksum is the xor of row keys") {
    import graft.functions.TextFunctions
    val mat = (1L to 100L).map(i => (i, i * 1.5, i * 1000L))
      .toDF("entity", "value", "ts_us")
    val out = FeatureStore.onlineExport(mat, shards = 8).collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == 100L)
    // recompute one shard's membership + checksum independently
    val keyed = mat.select(
      org.apache.spark.sql.functions.pmod(
        TextFunctions.md5Long60(col("entity").cast("string")), lit(8L)).as("shard"),
      TextFunctions.md5Long60(
        concat_ws("|", col("entity"), col("ts_us"))).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val shard0 = keyed.filter(_._1 == 0L).map(_._2)
    val row0 = out.find(_.getAs[Long]("shard") == 0L).get
    assert(row0.getAs[Long]("n_rows") == shard0.length)
    assert(row0.getAs[Long]("checksum") == shard0.foldLeft(0L)(_ ^ _))
  }

  test("featureCorrelations: exact +1/-1 on (anti)correlated columns, NULL on zero variance") {
    val df = Seq(
      (1L, 1L, 4L, 7L), (2L, 2L, 3L, 7L), (3L, 3L, 2L, 7L), (4L, 4L, 1L, 7L)
    ).toDF("a", "b", "c", "d") // b == a, c == 5 - a, d constant
    val out = FeatureStore.featureCorrelations(df, Seq("a", "b", "c", "d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[Any]("r_micro")).map(_.asInstanceOf[Long])).toMap
    assert(out(("a", "b")) == Some(1000000L))
    assert(out(("a", "c")) == Some(-1000000L))
    assert(out(("a", "d")).isEmpty && out(("c", "d")).isEmpty) // zero variance -> NULL
    assert(out.size == 6) // all pairs emitted
  }

  test("mutualInformation: zero for independence, ln2 pico-nats for a perfect predictor") {
    // independent: every (bin,label) cell has the same count
    val indep = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
      .toDF("bin", "label")
    val mi0 = FeatureStore.mutualInformation(indep, col("bin"), col("label"))
      .agg(sum("mi_pico")).head.getLong(0)
    assert(mi0 == 0L)
    // bin == label exactly: MI = ln 2 nats
    val dep = Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 1L)).toDF("bin", "label")
    val mi1 = FeatureStore.mutualInformation(dep, col("bin"), col("label"))
      .agg(sum("mi_pico")).head.getLong(0)
    assert(math.abs(mi1 - math.round(math.log(2) * 1e12)) <= 2) // floor error ≤ 1 per cell
  }

  test("scaleFeatures: z-score and min-max from exact moments; degenerate group -> NULL") {
    val df = Seq(
      (1L, "a", 0.0), (2L, "a", 10.0), (3L, "a", 20.0),
      (4L, "b", 7.0), (5L, "b", 7.0) // zero spread
    ).toDF("event_id", "event_type", "value")
    val out = FeatureStore.scaleFeatures(df, "event_id", "event_type", "value")
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[Any]("z")), Option(r.getAs[Any]("minmax"))))
      .toMap
    // group a: mean 10, population std sqrt(200/3)
    val std = math.sqrt(200.0 / 3.0)
    def approx(a: Option[Any], b: Double) =
      math.abs(a.get.asInstanceOf[Double] - b) < 1e-12
    assert(approx(out(1L)._1, -10.0 / std) && approx(out(1L)._2, 0.0))
    assert(approx(out(2L)._1, 0.0) && approx(out(2L)._2, 0.5))
    assert(approx(out(3L)._1, 10.0 / std) && approx(out(3L)._2, 1.0))
    assert(out(4L) == ((None, None)) && out(5L) == ((None, None)))
  }

  test("binFeatures: max lands in the top width bin; freq bins are exact ntiles") {
    val df = (1L to 10L).map(i => (i, "a", i.toDouble)).toDF("event_id", "event_type", "value")
    val out = FeatureStore.binFeatures(df, "event_id", "event_type", "value", nBins = 5)
      .collect()
      .map(r => r.getDouble(2) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1.0) == ((0L, 1L)))
    assert(out(10.0) == ((4L, 5L))) // max clamps to nBins-1, not nBins
    assert(out(5.0) == ((2L, 3L)))  // (5-1)/9*5 = 2.22 -> 2; rank 5 of 10 -> ntile 3
  }

  test("winsorize clips to the exact percentile fences; NULLs stay NULL") {
    val df = ((1L to 9L).map(i => (i, "a", Some(i.toDouble))) :+ ((10L, "a", Option.empty[Double])))
      .toDF("event_id", "event_type", "value")
    // values 1..9 (+1 null): p25 = 3.0, p75 = 7.0 (exact interpolation)
    val out = FeatureStore.winsorize(df, "event_id", "event_type", "value", 0.25, 0.75)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getAs[Any]("clipped")), r.getAs[Int]("was_clipped"))))
      .toMap
    assert(out(1L) == ((Some(3.0), 1)))
    assert(out(5L) == ((Some(5.0), 0)))
    assert(out(9L) == ((Some(7.0), 1)))
    assert(out(10L) == ((None, 0)))
  }

  test("timeSplit: exact chronological boundary at floor(f*n)") {
    val df = (1L to 10L)
      .map(i => (i, ts(f"2024-01-${i}%02d 00:00:00")))
      .toDF("event_id", "ts")
    val out = FeatureStore.timeSplit(df, Seq("ts", "event_id"), trainFraction = 0.75)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("split")).toMap
    // floor(0.75*10) = 7: days 1..7 train, 8..10 test
    assert((1L to 7L).forall(out(_) == "train") && (8L to 10L).forall(out(_) == "test"))
  }

  test("liftTable: exact ntile cut, decile 1 = top scores, integer rates and lift") {
    // 10 entities, scores 10..100 micro ×1e6; positives concentrated in
    // the top two scores -> k=5 groups of 2, decile 1 = scores {90,100}.
    val per = (1L to 10L)
      .map(i => (i, i * 10000000L, if (i >= 9) 1L else 0L))
      .toDF("entity", "score_micro", "label")
    val out = FeatureStore.liftTable(per, k = 5).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_entities"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("pos_rate_micro"), r.getAs[Long]("mean_score_micro"),
          r.getAs[Long]("lift_micro"))))
      .toMap
    // base rate 2/10: decile 1 has both positives -> lift = 1.0/0.2 = 5x
    assert(out(1L) == ((2L, 2L, 1000000L, 95000000L, 5000000L)))
    assert(out(2L) == ((2L, 0L, 0L, 75000000L, 0L)))
    assert(out(5L) == ((2L, 0L, 0L, 15000000L, 0L)))
  }

  test("liftTable: uneven split gives first (n mod k) groups one extra row") {
    val per = (1L to 7L).map(i => (i, i * 1000000L, 0L)).toDF("entity", "score_micro", "label")
    val sizes = FeatureStore.liftTable(per, k = 3).collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("n_entities")).toMap
    // n=7, k=3: the ascending ntile gives its first (lowest-score)
    // group the extra row; after the decile flip the extra sits in the
    // LAST decile: sizes top-down are 2,2,3
    assert(sizes == Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
    // zero positives -> lift undefined (null), not a divide-by-zero
    val lifts = FeatureStore.liftTable(per, k = 3).collect()
      .map(r => Option(r.getAs[Any]("lift_micro"))).toSet
    assert(lifts == Set(None))
  }

  test("labelHorizon: strict-after window labels, exact time-to-outcome, equal-ts excluded") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      // user 1: anchor at 10:00; outcome at 10:00 EXACTLY (excluded),
      // next outcome 11:30 -> label 1, ttc 90min
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "purchase"),
      (3L, ts("2024-01-01 11:30:00"), 1L, "purchase"),
      // user 2: outcome 73h after the anchor -> outside 72h, label 0
      (4L, ts("2024-01-01 00:00:00"), 2L, "click"),
      (5L, ts("2024-01-04 01:00:00"), 2L, "purchase"),
      // user 3: two anchors share the later outcome; only the second
      // is within 72h
      (6L, ts("2024-01-01 00:00:00"), 3L, "click"),
      (7L, ts("2024-01-03 12:00:00"), 3L, "click"),
      (8L, ts("2024-01-05 00:00:00"), 3L, "purchase"),
      // user 4: no outcome at all
      (9L, ts("2024-01-02 00:00:00"), 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = FeatureStore.labelHorizon(
      ev, "user_id", "ts", "event_id",
      col("event_type") === "click", col("event_type") === "purchase",
      horizonUs = 72L * 3600L * 1000000L)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Int]("label"), Option(r.getAs[Any]("ttc_us")))))
      .toMap
    assert(out(1L) == ((1, Some(90L * 60L * 1000000L))))
    assert(out(4L) == ((0, None)))
    assert(out(6L) == ((0, None)))
    assert(out(7L) == ((1, Some(36L * 3600L * 1000000L))))
    assert(out(9L) == ((0, None)))
    assert(out.size == 5) // outcomes never surface as rows
  }

  test("backfillDays: manifest diff recomputes exactly the dirty days; equals full recompute") {
    val mk = (id: Long, day: String, typ: String, v: Double) =>
      (id, ts(s"$day 10:00:00"), typ, v)
    val current = Seq(
      mk(1L, "2024-03-01", "click", 1.5), mk(2L, "2024-03-01", "view", 2.0),
      mk(3L, "2024-03-02", "click", 3.0), mk(4L, "2024-03-02", "click", 0.5),
      mk(5L, "2024-03-03", "view", 1.0)
    ).toDF("event_id", "ts", "event_type", "value")
    // stale snapshot missed event 4 (late data on Mar 2) and contains a
    // row later DELETED from Mar 3 (id 6) — both day shapes must flag
    val stale = current.where(col("event_id") =!= 4L)
      .unionByName(Seq(mk(6L, "2024-03-03", "click", 9.0))
        .toDF("event_id", "ts", "event_type", "value"))
    val out = FeatureStore.backfillDays(
      current, "ts", "event_type", "value", "event_id",
      FeatureStore.dailyAggregate(stale, "ts", "event_type", "value"),
      FeatureStore.dailyManifest(stale, "ts", "event_id", "event_type", "value"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("feature")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("spend_micro"), r.getAs[Int]("backfilled"))))
      .toMap
    val full = FeatureStore.dailyAggregate(current, "ts", "event_type", "value")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("feature")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("spend_micro"))))
      .toMap
    assert(out.view.mapValues(v => (v._1, v._2)).toMap == full)
    // Mar 1 untouched; Mar 2 (late insert) and Mar 3 (delete) recomputed
    assert(out.collect { case ((d, _), (_, _, 1)) => d }.toSet ==
      Set("2024-03-02", "2024-03-03"))
    assert(out(("2024-03-01", "click"))._3 == 0)
  }

  test("backfillDays: IN-PLACE value/type corrections are detected (content-hashed manifest)") {
    val mk = (id: Long, day: String, typ: String, v: Double) =>
      (id, ts(s"$day 10:00:00"), typ, v)
    val current = Seq(
      mk(1L, "2024-03-01", "click", 1.5), mk(2L, "2024-03-01", "view", 2.0),
      mk(3L, "2024-03-02", "click", 3.0), mk(4L, "2024-03-03", "view", 1.0)
    ).toDF("event_id", "ts", "event_type", "value")
    // stale snapshot has the SAME event_ids and per-day row counts —
    // but event 3's value was corrected 9.0 -> 3.0 and event 4's type
    // view -> click. An id-only fingerprint calls every day clean and
    // silently serves the stale aggregate; the content hash must flag
    // exactly Mar 2 and Mar 3.
    val stale = Seq(
      mk(1L, "2024-03-01", "click", 1.5), mk(2L, "2024-03-01", "view", 2.0),
      mk(3L, "2024-03-02", "click", 9.0), mk(4L, "2024-03-03", "click", 1.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = FeatureStore.backfillDays(
      current, "ts", "event_type", "value", "event_id",
      FeatureStore.dailyAggregate(stale, "ts", "event_type", "value"),
      FeatureStore.dailyManifest(stale, "ts", "event_id", "event_type", "value"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("feature")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("spend_micro"), r.getAs[Int]("backfilled"))))
      .toMap
    val full = FeatureStore.dailyAggregate(current, "ts", "event_type", "value")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[String]("feature")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("spend_micro"))))
      .toMap
    assert(out.view.mapValues(v => (v._1, v._2)).toMap == full,
      "corrected days must equal the full recompute")
    assert(out.collect { case ((d, _), (_, _, 1)) => d }.toSet ==
      Set("2024-03-02", "2024-03-03"),
      s"in-place corrections on Mar 2/3 must be flagged dirty: $out")
    assert(out(("2024-03-01", "click"))._3 == 0 && out(("2024-03-01", "view"))._3 == 0)
  }

  test("vocabEncode: frequency-desc/value-asc order, min-count floor -> OOV -1") {
    val df = Seq(
      (1L, "b"), (2L, "b"), (3L, "b"),
      (4L, "a"), (5L, "a"), (6L, "c"),
      (7L, "a"), (8L, "d")).toDF("id", "cat")
    val out = FeatureStore.vocabEncode(df, "id", "cat", minCount = 2L)
      .collect().map(r => r.getAs[Long]("entity") -> r.getAs[Long]("idx")).toMap
    // counts: b=3, a=3, c=1, d=1. Tie b/a broken by value asc -> a=0, b=1.
    // c and d fall below the floor -> OOV -1.
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 0L, 5L -> 0L, 7L -> 0L,
      6L -> -1L, 8L -> -1L))
  }

  test("negativeSample: positives excluded, deterministic, first k slots win") {
    val users = Seq(Tuple1(1L), Tuple1(2L)).toDF("u")
    val items = (0L to 9L).map(Tuple1(_)).toDF("item_id")
    // user 1 has interacted with most of the catalog: negatives must
    // avoid all of 0..7 and can only come from {8, 9}
    val inter = (0L to 7L).map(i => (1L, i)).toDF("u", "i")
    val out = FeatureStore.negativeSample(
      users, "u", inter, "u", "i", items, "item_id",
      proposals = 16, k = 3, seed = "t")
    val byUser = out.collect()
      .groupBy(_.getAs[Long]("user"))
      .view.mapValues(_.map(r => (r.getAs[Long]("item"), r.getAs[Long]("slot"))).toSet)
      .toMap
    assert(byUser(1L).map(_._1).subsetOf(Set(8L, 9L)))
    assert(byUser(2L).size == 3)
    // no sampled negative is a positive
    assert(byUser(1L).map(_._1).intersect((0L to 7L).toSet).isEmpty)
    // deterministic: a second run is identical
    val again = FeatureStore.negativeSample(
      users, "u", inter, "u", "i", items, "item_id",
      proposals = 16, k = 3, seed = "t")
      .collect().map(r =>
        (r.getAs[Long]("user"), r.getAs[Long]("item"), r.getAs[Long]("slot"))).toSet
    assert(again ==
      out.collect().map(r =>
        (r.getAs[Long]("user"), r.getAs[Long]("item"), r.getAs[Long]("slot"))).toSet)
    // within a user, kept slots are the earliest surviving ones:
    // every kept slot is <= every dropped-but-surviving slot
    val all2 = FeatureStore.negativeSample(
      users, "u", inter, "u", "i", items, "item_id",
      proposals = 16, k = 16, seed = "t")
      .where(col("user") === 2L).collect().map(_.getAs[Long]("slot")).sorted
    val kept2 = byUser(2L).map(_._2)
    assert(kept2 == all2.take(3).toSet)
  }

  test("negativeSample: gapped non-dense item keys never yield phantom negatives") {
    val users = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("u")
    // key space [5, 4000] with huge gaps — a mod-max(key)+1 draw lands
    // in a gap (a nonexistent item) with probability > 99.8%
    val realKeys = Set(5L, 100L, 101L, 999L, 4000L)
    val items = realKeys.toSeq.map(Tuple1(_)).toDF("item_id")
    val inter = Seq((1L, 100L)).toDF("u", "i")
    val got = FeatureStore.negativeSample(
      users, "u", inter, "u", "i", items, "item_id",
      proposals = 8, k = 4, seed = "gap")
      .collect()
      .map(r => (r.getAs[Long]("user"), r.getAs[Long]("item")))
    assert(got.nonEmpty)
    assert(got.forall { case (_, item) => realKeys(item) },
      s"every sampled negative must be a real catalog item: ${got.mkString(",")}")
    assert(!got.contains((1L, 100L)), "positives stay excluded")
  }
}
