package graft.operators

import graft.operators.Pins.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The feature-store core: materialization, point-in-time training
  * sets, batch features, splits, profiles.
  *
  * Reference semantics (re-expressed, not ported):
  *  - materialization = latest value per entity:
  *    `row_number() OVER (PARTITION BY entity ORDER BY ts DESC) = 1`
  *    (reference: provider/bigquery.go:444, provider/clickhouse.go:1267)
  *  - training set = for each label row (entity, label, ts), each
  *    feature contributes its latest value with feature.ts <= label.ts
  *    (reference: provider/bigquery.go:590-620, provider/postgres.go:166)
  *  - lag features = value as of ts - delta
  *    (reference: provider/offline.go:160 LagFeatureDef)
  *  - train/test split (reference: provider/clickhouse.go:1132)
  *
  * A feature source is any DataFrame with (entity, value, ts) columns —
  * featureform's universal ResourceSchema.
  */
object FeatureStore {

  /** One feature input for a training set: rows (entity, ts, value),
    * optional lag subtracted from the label timestamp at join time.
    */
  final case class FeatureDef(
      name: String,
      df: DataFrame,
      entityCol: String,
      valueCol: String,
      tsCol: String,
      lag: Option[Column] = None)

  /** Latest value per entity.
    *
    * Scale: implemented as `max_by` aggregation, NOT a window — the
    * aggregate gets map-side partial combine (each input partition
    * reduces to <= |entities| rows before the single shuffle), so a
    * 100TB event log with 10^8 entities shuffles ~entity-cardinality
    * bytes instead of the full log that a window sort would.
    * Deterministic tiebreak on (ts, tiebreakCol).
    */
  def materializeLatest(
      events: DataFrame,
      entityCol: String,
      valueCol: String,
      tsCol: String,
      tiebreakCol: String
  ): DataFrame =
    events
      .groupBy(col(entityCol).as("entity"))
      .agg(
        max_by(
          struct(
            col(valueCol).as("value"), col(tsCol).as("ts"),
            col(tiebreakCol).as("tiebreak")),
          struct(col(tsCol), col(tiebreakCol))).as("latest"))
      .select(
        col("entity"), col("latest.value").as("value"), col("latest.ts").as("ts"),
        col("latest.tiebreak").as("tiebreak"))

  /** Chunked materialization: the reference pages a materialization by
    * a global row_number over entity (provider/bigquery.go:372-382).
    *
    * Scale: a bare `row_number() OVER (ORDER BY entity)` would move the
    * whole materialization through ONE task. Instead: range-partition by
    * entity (so partition p holds a contiguous entity range), pin the
    * partitioning, collect only the per-partition COUNTS (numPartitions
    * rows — the one tiny driver aggregation), turn them into prefix-sum
    * offsets, and number within each partition in parallel. Identical
    * global numbering; partitions whose [offset, offset+count) range
    * cannot intersect the requested page are pruned before any window
    * work runs.
    */
  def materializeRange(
      materialized: DataFrame,
      startExclusive: Long,
      endInclusive: Long
  ): DataFrame = {
    val (parted, offsets) = numberedPartitions(materialized)
    rangeSlice(parted, offsets, startExclusive, endInclusive)
  }

  /** Shared prep for the paged reads: range-partition by entity, pin,
    * and collect per-partition counts into prefix-sum offsets
    * (numPartitions rows — the one tiny driver aggregation).
    * The pin ([[Pins]]) freezes the range partitioning so the count job
    * and the numbering job see the same partitions (range boundaries
    * come from sampling). Cluster runs set `graft.pins.durable=true`
    * (+ a checkpoint dir) and every pin in the engine switches to a
    * reliable checkpoint that survives executor loss.
    */
  private def numberedPartitions(
      materialized: DataFrame,
      orderCols: Seq[String] = Seq("entity")): (DataFrame, Array[(Int, Long, Long)]) = {
    val parted = materialized
      .repartitionByRange(orderCols.map(col): _*)
      .select(col("*"), spark_partition_id().as("_pid"))
      .pinned()
    val counts = parted.groupBy(col("_pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = acc; acc += n; (pid, o, n) }
    (parted, offsets)
  }

  /** One page [startExclusive, endInclusive] of the pinned numbering:
    * partitions whose range cannot intersect the page are pruned by the
    * broadcast inner join before any window work runs.
    */
  private def rangeSlice(
      parted: DataFrame,
      offsets: Array[(Int, Long, Long)],
      startExclusive: Long,
      endInclusive: Long,
      orderCols: Seq[String] = Seq("entity")
  ): DataFrame = {
    val spark = parted.sparkSession
    import spark.implicits._
    val keep = offsets.filter { case (_, o, n) => o < endInclusive && o + n > startExclusive }
    val offDf = broadcast(keep.map { case (p, o, _) => (p, o) }.toSeq.toDF("_pid", "_off"))
    parted
      .join(offDf, Seq("_pid")) // inner join = partition pruning
      .withColumn(
        "row_number",
        (row_number().over(
          Window.partitionBy(col("_pid")).orderBy(orderCols.map(col): _*))
          + col("_off")).cast("long"))
      .where(col("row_number") > startExclusive && col("row_number") <= endInclusive)
      .drop("_pid", "_off")
  }

  /** Paged materialization export — the served-API analog of the
    * reference's materialization chunk iterator (IterateSegment,
    * provider/offline.go:592; paged by a global row number over entity,
    * provider/bigquery.go:372-382): cut the materialization into
    * contiguous `pageSize`-row segments and yield them in order. The
    * entity range-partitioning and prefix-sum offsets are computed ONCE
    * and shared by every page — each page is a partition-pruned slice,
    * so exporting N pages costs one shuffle + N pruned window scans,
    * not N full numberings.
    */
  /** Global 1-based row numbers over `orderCols` (which must be a
    * total order) — the scale-safe `row_number() OVER (ORDER BY …)`:
    * range-partition + per-partition counts to the driver + broadcast
    * prefix offsets, never a single-task window. The shared primitive
    * behind paged exports and quantile scoring.
    */
  def globalRowNumbers(df: DataFrame, orderCols: Seq[String]): DataFrame =
    globalRowNumbersWithTotal(df, orderCols)._1

  /** [[globalRowNumbers]] plus the total row count — already known from
    * the prefix-sum offsets, so rank-based consumers (ntile buckets,
    * fractional splits) need NO second counting pass over the data.
    */
  def globalRowNumbersWithTotal(
      df: DataFrame, orderCols: Seq[String]): (DataFrame, Long) = {
    val (parted, offsets) = numberedPartitions(df, orderCols)
    val total = offsets.map(_._3).sum
    (rangeSlice(parted, offsets, 0L, total, orderCols), total)
  }

  /** Scale-safe RUNNING SUM over a total order — the cumulative
    * companion of [[globalRowNumbers]]: `sum(value) OVER (ORDER BY …)`
    * without the single-task window. Range-partition on the order,
    * one per-partition (count, sum) aggregate to the driver
    * (numPartitions rows), broadcast prefix offsets, then each
    * partition computes its local running sum + its offset. `valueCol`
    * must be integral (use micro-units) so prefix offsets are exact
    * under any partitioning. Returns the input plus `row_number` and
    * `running_sum`.
    */
  def globalRunningSum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String
  ): DataFrame = globalRunningSumWithTotals(df, orderCols, valueCol)._1

  /** [[globalRunningSum]] plus (total rows, total sum) — both already
    * known from the prefix offsets, so share-of-total consumers
    * (Pareto cuts, cumulative distributions) need NO second pass.
    */
  def globalRunningSumWithTotals(
      df: DataFrame,
      orderCols: Seq[String], // must be a TOTAL order
      valueCol: String
  ): (DataFrame, Long, Long) = {
    val parted = df
      .repartitionByRange(orderCols.map(col): _*)
      .select(col("*"), spark_partition_id().as("_pid"))
      .pinned()
    val stats = parted.groupBy(col("_pid"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var accN = 0L
    var accS = 0L
    val offsets = stats.map { case (pid, n, s) =>
      val o = (pid, accN, accS); accN += n; accS += s; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(
      offsets.toSeq.toDF("_pid", "_noff", "_soff"))
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols.map(col): _*)
    val out = parted
      .join(offDf, Seq("_pid"))
      .withColumn("row_number", (row_number().over(w) + col("_noff")).cast("long"))
      .withColumn(
        "running_sum",
        (sum(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("_soff")).cast("long"))
      .drop("_pid", "_noff", "_soff")
    (out, accN, accS)
  }

  def pagedMaterialization(
      materialized: DataFrame,
      pageSize: Long,
      orderCols: Seq[String] = Seq("entity") // must be a TOTAL order
  ): Iterator[(Long, Long, DataFrame)] = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    val (parted, offsets) = numberedPartitions(materialized, orderCols)
    val total = offsets.map(_._3).sum
    Iterator
      .iterate(0L)(_ + pageSize)
      .takeWhile(_ < total)
      .map { start =>
        val end = math.min(start + pageSize, total)
        (start, end, rangeSlice(parted, offsets, start, end, orderCols))
      }
  }

  /** [[pagedMaterialization]] with a FIXED PAGE COUNT instead of a
    * fixed page size — the scale-stable form for "export the whole
    * materialization in shards": page size grows with the data so the
    * number of page reads (and, when a caller unions every page into
    * one job, the number of plan subtrees) stays CONSTANT at any SF.
    * A fixed pageSize is right for a serving API's bounded responses;
    * it is the wrong knob for full exports, where it makes page count
    * — and therefore driver jobs / plan size — grow linearly with the
    * corpus (measured: the 40-row-page full export went super-linear,
    * alpha 1.2, purely from 375 unioned page subtrees at 10x data).
    * Returns (pageSize, pages); the numbering is computed once and
    * shared, same as the fixed-size form.
    *
    * Caller notes (cluster deployments): constructing the page list
    * MATERIALIZES the full numbering eagerly — Iterator.map forces the
    * lazy pin as soon as the first page frame is built, so a caller
    * that builds pages but aborts before reading still pays the
    * numbering job. The pinned numbering also lives in EXECUTOR
    * storage for the lifetime of the paging: size storage for one
    * numbered copy of the materialization, and set
    * `graft.pins.durable=true` (+ a checkpoint dir) if executor loss
    * mid-export must not fail the remaining pages.
    */
  def pagedMaterializationFixedPages(
      materialized: DataFrame,
      nPages: Int,
      orderCols: Seq[String] = Seq("entity")
  ): (Long, Iterator[(Long, Long, DataFrame)]) = {
    require(nPages > 0, s"nPages must be positive, got $nPages")
    val (parted, offsets) = numberedPartitions(materialized, orderCols)
    val total = offsets.map(_._3).sum
    val pageSize = math.max(1L, (total + nPages - 1) / nPages)
    // Full-export form, so number ONCE and pin (r11 optimization):
    // every page of this form gets read — that is its documented
    // contract vs [[pagedMaterialization]]'s serving-API slices — so
    // slicing per page re-ran the offset join + per-partition window
    // nPages times over the same pinned rows (the fs_*_paged plans
    // carried ~60 Exchanges, ~2 per page subtree). One full
    // numbering pass + a pin turns each page into a pure row_number
    // range filter over the pinned numbering: identical page rows and
    // row_number values, zero per-page exchanges. The single-page
    // serving path keeps the partition-pruned slice, where numbering
    // the whole materialization would be the waste. Paired A/B and
    // row-equality are gated in FeatureStoreSpec.
    lazy val numbered =
      Pins.pin(rangeSlice(parted, offsets, 0L, total, orderCols))
    val pages = Iterator
      .iterate(0L)(_ + pageSize)
      .takeWhile(_ < total)
      .map { start =>
        val end = math.min(start + pageSize, total)
        (start, end,
          numbered.where(col("row_number") > start && col("row_number") <= end))
      }
    (pageSize, pages)
  }

  /** Incremental materialization (the reference's UpdateMaterialization,
    * provider/offline.go:544): merge an existing materialization with a
    * delta of new events and keep the per-entity winner. Equivalent to
    * re-materializing from scratch, but touches only |old| + |delta|
    * rows — the 100TB path processes the day's delta, not the log.
    */
  def materializeIncremental(
      existing: DataFrame, // (entity, value, ts, tiebreak) from a prior materialization
      delta: DataFrame,
      entityCol: String,
      valueCol: String,
      tsCol: String,
      tiebreakCol: String
  ): DataFrame = {
    val deltaLatest = materializeLatest(delta, entityCol, valueCol, tsCol, tiebreakCol)
    // The merge tiebreaks on (ts, tiebreak) — the same total order the
    // full recompute uses — so overlapping / re-delivered deltas with
    // equal-ts rows still resolve deterministically to the recompute's
    // winner.
    existing
      .select(col("entity"), col("value"), col("ts"), col("tiebreak"))
      .unionByName(deltaLatest)
      .groupBy(col("entity"))
      .agg(
        max_by(
          struct(col("value"), col("ts"), col("tiebreak")),
          struct(col("ts"), col("tiebreak"))).as("latest"))
      .select(
        col("entity"), col("latest.value").as("value"), col("latest.ts").as("ts"),
        col("latest.tiebreak").as("tiebreak"))
  }

  /** Point-in-time training set.
    *
    * For each label row, each feature's value as of (label.ts - lag),
    * inclusive. Implemented as union + sorted window with
    * `last(_, ignoreNulls)` running over (ts, kind, tiebreak):
    * one shuffle on entity, O(n log n) per partition, and — unlike the
    * naive `feature.ts <= label.ts` inequality join the reference's SQL
    * providers emit — no O(|labels| x |features|) intermediate blowup,
    * which is what survives a 100TB event log.
    */
  def trainingSet(
      labels: DataFrame,
      labelEntity: String,
      labelValue: String,
      labelTs: String,
      labelTiebreak: String,
      features: Seq[FeatureDef]
  ): DataFrame = {
    val featCols = features.map(_.name)
    // Features keep their own value types (featureform features may be
    // string/bool/int, not just double — provider/offline.go TableSchema).
    val featType: Map[String, org.apache.spark.sql.types.DataType] =
      features.map(f => f.name -> f.df.schema(f.valueCol).dataType).toMap
    // kind=1 marks label rows; features sort first at an equal ts so the
    // as-of boundary is inclusive, matching the reference's `ts <= t0.ts`.
    val labelSide = labels.select(
      Seq(
        col(labelEntity).as("entity"),
        col(labelTs).as("ts"),
        lit(1).as("kind"),
        col(labelTiebreak).cast("long").as("tb"),
        col(labelValue).as("label")
      ) ++ featCols.map(n => lit(null).cast(featType(n)).as(n)): _*)
    val featureSides = features.map { f =>
      // A lag shifts the feature's visibility forward: value as of
      // (label.ts - lag) <=> (feature.ts + lag) <= label.ts.
      val effTs = f.lag.fold(col(f.tsCol))(l => col(f.tsCol) + l)
      f.df.select(
        Seq(
          col(f.entityCol).as("entity"),
          effTs.as("ts"),
          lit(0).as("kind"),
          lit(0L).as("tb"),
          lit(null).cast(labels.schema(labelValue).dataType).as("label")
        ) ++ featCols.map(n =>
          (if (n == f.name) col(f.valueCol)
           else lit(null).cast(featType(n))).as(n)): _*)
    }
    val unioned = featureSides.foldLeft(labelSide)(_.unionByName(_))
    val w = Window
      .partitionBy(col("entity"))
      .orderBy(col("ts"), col("kind"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = featCols.foldLeft(unioned) { (df, n) =>
      df.withColumn(n, last(col(n), ignoreNulls = true).over(w))
    }
    filled
      .where(col("kind") === 1)
      .select(col("entity") +: col("ts") +: col("label") +: featCols.map(col): _*)
  }

  /** Generic as-of join with a staleness tolerance — pandas
    * `merge_asof(direction='backward', tolerance=...)` / Flink temporal
    * join surface, generalizing [[trainingSet]]'s PIT machinery: every
    * left row gets the right side's latest (value, ts) with
    * right.ts <= left.ts, but only if that match is no staler than
    * `toleranceUs` microseconds — otherwise null (a feature too old to
    * trust is no feature). Same scale shape as the PIT join: tagged
    * union, ONE shuffle on the join key, one sorted window — never the
    * O(|left| x |right|) inequality-join blowup. Right rows at the
    * exact left ts are visible (inclusive boundary), and equal-ts
    * right rows resolve to the highest tiebreak, so the result is
    * total-order deterministic.
    */
  def asofJoin(
      left: DataFrame,
      leftEntity: String,
      leftTs: String,
      leftTiebreak: String,
      right: DataFrame,
      rightEntity: String,
      rightValue: String,
      rightTs: String,
      rightTiebreak: String,
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    val vType = right.schema(rightValue).dataType
    val l = left.select(
      col(leftEntity).as("entity"), col(leftTs).as("ts"),
      lit(1).as("kind"), col(leftTiebreak).cast("long").as("tb"),
      lit(null).cast(vType).as("v"))
    val r = right.select(
      col(rightEntity).as("entity"), col(rightTs).as("ts"),
      lit(0).as("kind"), col(rightTiebreak).cast("long").as("tb"),
      col(rightValue).as("v"))
    val w = Window
      .partitionBy(col("entity"))
      .orderBy(col("ts"), col("kind"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r).withColumn(
      "mv",
      last(when(col("kind") === 0, struct(col("ts").as("mts"), col("v").as("mval"))),
        ignoreNulls = true).over(w))
    val fresh = toleranceUs.fold(lit(true))(t =>
      unix_micros(col("mv.mts")) >= unix_micros(col("ts")) - t)
    filled
      .where(col("kind") === 1)
      .select(
        col("entity"), col("tb").as("left_id"), unix_micros(col("ts")).as("ts_us"),
        when(fresh, col("mv.mval")).as("matched_value"),
        when(fresh, unix_micros(col("mv.mts"))).as("matched_ts_us"))
  }

  /** Batch features (OfflineStoreBatchFeature, provider/offline.go:515):
    * the latest value of each named feature per entity, one row per
    * entity, one column per feature. Partial-aggregated then pivoted.
    */
  def batchFeatures(
      events: DataFrame,
      entityCol: String,
      featureNameCol: String,
      valueCol: String,
      tsCol: String,
      tiebreakCol: String,
      featureNames: Seq[String]
  ): DataFrame =
    events
      .where(col(featureNameCol).isin(featureNames: _*))
      .groupBy(col(entityCol).as("entity"))
      .pivot(featureNameCol, featureNames)
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tiebreakCol))))

  /** Deterministic train/test split: stable under re-runs and engine
    * changes because it keys on md5(entity), not on row order or RNG
    * (the reference splits on row_number over a shuffled order,
    * clickhouse.go:1132 — hash-of-entity is the distributed-safe
    * equivalent and keeps all rows of one entity in one side).
    * Returns the input with a `split` column: 'train' | 'test'.
    */
  def trainTestSplit(df: DataFrame, entityCol: String, testFraction: Double): DataFrame = {
    // Fixed-width comparison only holds for thresholds that fit 4 hex
    // chars — testFraction = 1.0 would need the 5-char "10000", which
    // sorts BEFORE "ffff" lexicographically. Degenerate splits have no
    // use anyway; reject them loudly.
    require(
      testFraction >= 0.0 && testFraction < 1.0,
      s"testFraction must be in [0, 1), got $testFraction")
    // First 4 hex chars of md5 = 16 bits; fixed-width lowercase hex
    // compares lexicographically == numerically, so a plain string
    // comparison is engine-portable.
    val bucket = substring(md5(col(entityCol).cast("string")), 1, 4)
    val threshold = f"${(testFraction * 65536).toInt}%04x"
    df.withColumn(
      "split",
      when(bucket < lit(threshold), lit("test")).otherwise(lit("train")))
  }

  /** Seeded shuffled train/test split — parity with the reference's
    * TrainTestSplitDef {TestSize, Shuffle, RandomState}
    * (reference: provider/offline.go:335-341; clickhouse.go:1132 splits
    * on row_number over a seeded shuffled order). The distributed-safe
    * equivalent of "shuffle with RandomState r" is bucketing on a seeded
    * hash: md5(seed || ':' || entity) is a deterministic pseudo-random
    * permutation of entities, so `TestSize` of the (uniform) hash space
    * lands in 'test', re-seeding yields an independent split, and all
    * rows of one entity stay on one side. No shuffle, no RNG state on
    * executors — a narrow projection.
    */
  def trainTestSplitShuffled(
      df: DataFrame,
      entityCol: String,
      testFraction: Double,
      seed: Long
  ): DataFrame = {
    require(
      testFraction >= 0.0 && testFraction < 1.0,
      s"testFraction must be in [0, 1), got $testFraction")
    val bucket =
      substring(md5(concat(lit(s"$seed:"), col(entityCol).cast("string"))), 1, 4)
    val threshold = f"${(testFraction * 65536).toInt}%04x"
    df.withColumn(
      "split",
      when(bucket < lit(threshold), lit("test")).otherwise(lit("train")))
  }

  /** Incremental training-set refresh — the reference's
    * UpdateTrainingSet (provider/offline.go:551). Only entities present
    * in the delta get a PIT recompute; every other entity's rows are
    * carried over from the previous training set untouched. Equivalent
    * to a full recompute because a label/feature row can only influence
    * rows of its own entity (the PIT join partitions by entity).
    *
    * Scale: the carried-over side is a left_anti join on the (small)
    * changed-entity set — broadcastable — and the recompute side
    * restricts every input by left_semi before the window, so the
    * refresh cost tracks |delta entities|, not the full log.
    */
  def updateTrainingSet(
      previous: DataFrame, // output of trainingSet: (entity, ts, label, features...)
      labels: DataFrame,
      labelEntity: String,
      labelValue: String,
      labelTs: String,
      labelTiebreak: String,
      features: Seq[FeatureDef],
      changed: DataFrame,
      changedCol: String
  ): DataFrame = {
    val ch = changed.select(col(changedCol).as("entity")).distinct()
    val keep = previous.join(ch, Seq("entity"), "left_anti")
    val labelsTouched = labels.join(ch, labels(labelEntity) === ch("entity"), "left_semi")
    val featuresTouched = features.map(f =>
      f.copy(df = f.df.join(ch, f.df(f.entityCol) === ch("entity"), "left_semi")))
    keep.unionByName(
      trainingSet(labelsTouched, labelEntity, labelValue, labelTs, labelTiebreak,
        featuresTouched))
  }

  /** Column profile per feature group: the stats surface the reference
    * exposes in its dashboard/metadata (count, nulls, min/max/avg,
    * distinct entities).
    */
  /** Per-feature distribution drift between a reference window
    * (ts < splitTs) and the current window (ts >= splitTs): the
    * Population Stability Index over `nBuckets` fixed-width buckets
    * whose edges come from the REFERENCE window's min/max — the
    * standard production monitor for "did this feature's distribution
    * move since training" (PSI; public risk-modeling practice,
    * conventional read: <0.1 stable, >0.25 action).
    *
    * Engineering choices, all for cross-engine determinism and scale:
    * fixed-width buckets (quantile edges are engine-ambiguous under
    * ties), current-window values clamped into [0, nBuckets-1] so
    * out-of-range drift lands in the edge buckets, frequencies floored
    * at 1e-6 before the log ratio (zero-bucket guard), PSI rounded to
    * 6dp. Features with NO reference-window rows are omitted (PSI has
    * no meaning without a reference distribution — a new-feature alert
    * is a different monitor); null values are excluded from both
    * windows, so n_ref/n_cur count non-null observations. Plan: one tiny per-feature stats aggregate (broadcast), one
    * (feature, bucket) aggregate per window with map-side combine, a
    * features x buckets frame to make empty buckets explicit — no
    * window functions, no sort, scan-bound at any corpus size.
    */
  def featureDrift(
      events: DataFrame,
      featureCol: String,
      valueCol: String,
      tsCol: String,
      splitTs: String,
      nBuckets: Int = 10
  ): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val split = lit(splitTs).cast("timestamp")
    val base = events.select(
      col(featureCol).as("feature"),
      col(valueCol).cast("double").as("v"),
      (col(tsCol) < split).as("is_ref"))
    val refStats = base
      .where(col("is_ref"))
      .groupBy(col("feature"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("w", (col("mx") - col("mn")) / nBuckets)
    val bucketed = base
      .join(broadcast(refStats), "feature")
      .withColumn(
        "bucket",
        when(col("w") === 0.0, lit(0)).otherwise(
          least(
            greatest(floor((col("v") - col("mn")) / col("w")).cast("int"), lit(0)),
            lit(nBuckets - 1))))
      .groupBy(col("feature"), col("bucket"))
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    // explicit (feature x bucket) frame: buckets empty in BOTH windows
    // still contribute their floored frequencies to the PSI sum
    val frame = refStats
      .select(col("feature"))
      .withColumn("bucket", explode(sequence(lit(0), lit(nBuckets - 1))))
    val eps = 1e-6
    frame
      .join(bucketed, Seq("feature", "bucket"), "left_outer")
      .na.fill(0L, Seq("c_ref", "c_cur"))
      .withColumn("t_ref", sum(col("c_ref")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("feature"))))
      .withColumn("t_cur", sum(col("c_cur")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("feature"))))
      .withColumn("pa", greatest(col("c_ref") / col("t_ref"), lit(eps)))
      .withColumn("pb", greatest(col("c_cur") / col("t_cur"), lit(eps)))
      // per-bucket term rounded to 12dp and summed as exact decimals:
      // a plain double sum is partition-order-dependent, which would
      // make the 6dp psi value irreproducible across engines
      .withColumn(
        "term",
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 12)
          .cast("decimal(28,12)"))
      .groupBy(col("feature"))
      .agg(
        sum(col("c_ref")).as("n_ref"),
        sum(col("c_cur")).as("n_cur"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.25)
  }

  /** Feature freshness report — the "is my pipeline stuck" monitor:
    * per feature, the newest observation, its age relative to `asOf`,
    * recent-arrival volume, and a staleness verdict. One tiny
    * aggregate; pure scan shape.
    */
  def featureFreshness(
      events: DataFrame,
      featureCol: String,
      tsCol: String,
      asOf: String,
      staleAfterUs: Long,
      recentWindowUs: Long
  ): DataFrame = {
    val asOfUs = unix_micros(lit(asOf).cast("timestamp"))
    events
      .groupBy(col(featureCol).as("feature"))
      .agg(
        max(unix_micros(col(tsCol))).as("last_ts_us"),
        sum(
          when(unix_micros(col(tsCol)) >= asOfUs - recentWindowUs &&
            unix_micros(col(tsCol)) <= asOfUs, 1L).otherwise(0L)).as("n_recent"))
      .select(
        col("feature"), col("last_ts_us"), col("n_recent"),
        (asOfUs - col("last_ts_us")).as("age_us"),
        (asOfUs - col("last_ts_us") > staleAfterUs).as("stale"))
  }

  /** Incremental additive-aggregate maintenance — the materialized-
    * view refresh shape: a stored per-key (sum, count) aggregate plus
    * a new-rows delta re-aggregates to EXACTLY the full recompute,
    * because decimal sums and counts are mergeable partials. Cost
    * scales with |delta| + |stored keys|, never the full history —
    * the aggregate-table analog of [[materializeIncremental]].
    * `stored` carries (entity, total_dec, n) as produced by
    * [[sumAggregate]].
    */
  def sumAggregate(
      rows: DataFrame,
      keyCol: String,
      valueCol: String
  ): DataFrame =
    rows
      .groupBy(col(keyCol).as("entity"))
      .agg(
        sum(col(valueCol).cast("decimal(18,4)")).as("total_dec"),
        count(lit(1)).as("n"))

  def mergeSumAggregate(stored: DataFrame, deltaRows: DataFrame, keyCol: String, valueCol: String): DataFrame =
    stored
      .unionByName(sumAggregate(deltaRows, keyCol, valueCol))
      .groupBy(col("entity"))
      .agg(sum(col("total_dec")).as("total_dec"), sum(col("n")).as("n"))

  /** Insert-only incremental equi-join view maintenance — the classic
    * bilinear delta rule: for a materialized view V = A ⋈ B and
    * append-only deltas ΔA, ΔB,
    *   V' = V ∪ (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB).
    * The expensive A_old ⋈ B_old is NEVER recomputed — that is the
    * stored view streaming through untouched.
    *
    * Scale: each delta term joins a daily-sized delta against one
    * base; with the delta broadcastable the base side never shuffles,
    * so maintenance cost scales with |Δ|, not |V|. Insert-only is the
    * contract (event/order streams); updates need the upsert path
    * (see [[graft.operators.Similarity.upsert]]) on the base BEFORE
    * the view refresh.
    */
  def mergeJoinView(
      stored: DataFrame,
      oldA: DataFrame,
      deltaA: DataFrame,
      oldB: DataFrame,
      deltaB: DataFrame,
      cond: (DataFrame, DataFrame) => org.apache.spark.sql.Column
  ): DataFrame =
    stored
      .unionByName(deltaA.join(oldB, cond(deltaA, oldB)))
      .unionByName(oldA.join(deltaB, cond(oldA, deltaB)))
      .unionByName(deltaA.join(deltaB, cond(deltaA, deltaB)))

  /** Point-in-time LEAKAGE AUDIT — the correctness gate for any
    * feature/label join: given joined rows tagged with the join method
    * and carrying (label ts, feature ts), report per method how many
    * rows used a feature from the FUTURE of its label (n_leaks — must
    * be 0 for a sound training set), how far ahead the worst leak
    * reached, and the worst-case staleness of the sound rows. Run it
    * over a candidate join before shipping a training set; a non-zero
    * n_leaks row is a blocked release.
    *
    * One map-side-combined aggregation over the joined rows — audit
    * cost is a scan, never a re-join.
    */
  def leakageAudit(
      rows: DataFrame,
      methodCol: String,
      labelTsUsCol: String,
      featureTsUsCol: String
  ): DataFrame = {
    val lts = col(labelTsUsCol)
    val fts = col(featureTsUsCol)
    rows
      .groupBy(col(methodCol).as("method"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(fts > lts, 1L).otherwise(0L)).as("n_leaks"),
        coalesce(max(when(fts > lts, fts - lts)), lit(0L)).as("max_lead_us"),
        coalesce(max(when(fts <= lts, lts - fts)), lit(0L)).as("max_staleness_us"))
  }

  /** Leave-one-out target encoding — the classic high-cardinality
    * categorical encoder: each row's category becomes the mean target
    * of OTHER rows in that category, (Σy − y)/(n−1), so a row never
    * leaks its own label into its feature. Singleton categories encode
    * null. One tiny per-category aggregate broadcast back over the
    * scan; sums are exact decimals, so every encoding is
    * partition-order independent.
    */
  def targetEncodeLoo(
      rows: DataFrame,
      idCol: String,
      categoryCol: String,
      targetCol: String
  ): DataFrame = {
    val dec = col(targetCol).cast("decimal(18,4)")
    val stats = rows
      .groupBy(col(categoryCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(dec).as("sy"))
    rows
      .join(broadcast(stats), col(categoryCol) === col("category"))
      .select(
        col(idCol),
        col("category"),
        col(targetCol).as("target"),
        when(col("n") > 1, (col("sy") - dec).cast("double") / (col("n") - 1))
          .as("loo_encoding"))
  }

  /** Per-feature z-score outlier gate — the row-level companion of the
    * distribution-level [[featureDrift]] monitor: flag observations
    * more than `zThreshold` standard deviations from their feature's
    * mean (ingest validation / bad-sensor triage before values reach
    * materialization). Population std from one tiny per-feature
    * aggregate (broadcast back over the scan); moments are EXACT
    * decimal sums (values are fixed-point in practice; 18,4 here), so
    * mean/std — and therefore every emitted z — are bit-reproducible
    * regardless of partition order. Zero-variance features emit no
    * outliers (z is undefined).
    */
  def featureOutliers(
      events: DataFrame,
      idCol: String,
      featureCol: String,
      valueCol: String,
      zThreshold: Double
  ): DataFrame = {
    val dec = col(valueCol).cast("decimal(18,4)")
    val moments = events
      .groupBy(col(featureCol).as("feature"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec).cast("double").as("svd"),
        sum(dec * dec).cast("double").as("sv2d"))
      .select(
        col("feature"),
        (col("svd") / col("n")).as("mean"),
        sqrt(col("sv2d") / col("n") - (col("svd") / col("n")) * (col("svd") / col("n")))
          .as("std"))
    events
      .join(broadcast(moments), col(featureCol) === col("feature"))
      .where(col("std") > 0 && abs((col(valueCol) - col("mean")) / col("std")) > zThreshold)
      .select(
        col(idCol),
        col("feature"),
        col(valueCol).as("value"),
        ((col(valueCol) - col("mean")) / col("std")).as("z"))
  }

  /** Feature scaling — the standard (z-score) and min-max normalizations
    * every training pipeline applies before gradient descent, as a
    * distributed transform: ONE exact-decimal moment aggregation per
    * feature group (order-independent, so the moments are engine-exact),
    * broadcast back over a single scan. z and minmax are then fixed
    * sequences of IEEE double ops on those exact ingredients —
    * bit-reproducible across engines. Groups with zero spread scale to
    * NULL (no information, not 0): a degenerate feature must be visible
    * to the caller, not silently centered.
    *
    * Scale: moments are |features| rows — broadcast; the transform is a
    * narrow map over the event scan. No shuffle of the data itself.
    */
  def scaleFeatures(
      events: DataFrame,
      idCol: String,
      featureCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = col(valueCol).cast("decimal(18,4)")
    val moments = events
      .groupBy(col(featureCol).as("feature"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec).cast("double").as("svd"),
        sum(dec * dec).cast("double").as("sv2d"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))
      .select(
        col("feature"),
        (col("svd") / col("n")).as("mean"),
        sqrt(col("sv2d") / col("n") - (col("svd") / col("n")) * (col("svd") / col("n")))
          .as("std"),
        col("mn"), col("mx"))
    events
      .join(broadcast(moments), col(featureCol) === col("feature"))
      .select(
        col(idCol),
        col("feature"),
        col(valueCol).as("value"),
        when(col("std") > 0, (col(valueCol) - col("mean")) / col("std")).as("z"),
        when(col("mx") > col("mn"), (col(valueCol) - col("mn")) / (col("mx") - col("mn")))
          .as("minmax"))
  }

  /** Feature discretization: equal-width and equal-frequency binning per
    * feature group — the two standard featurizations of a continuous
    * column (histogram features, WoE/target-encoding prep, monotone
    * binning for trees).
    *
    * width_bin: integer floor over the broadcast (min, max) range —
    * exact integer output, narrow map. freq_bin: NTILE over the
    * per-feature value order with the row id as deterministic tiebreak —
    * one shuffle partitioned BY FEATURE (not a global window), which at
    * 100 TB is the per-group sort any exact quantile assignment costs;
    * the approximate path for extreme groups is percentile_approx
    * thresholds broadcast like the width path (same shape as
    * [[featureStats]]'s note).
    */
  def binFeatures(
      events: DataFrame,
      idCol: String,
      featureCol: String,
      valueCol: String,
      nBins: Int
  ): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val ranges = events
      .groupBy(col(featureCol).as("feature"))
      .agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    val w = Window
      .partitionBy(col(featureCol))
      .orderBy(col(valueCol).asc_nulls_first, col(idCol))
    events
      .join(broadcast(ranges), col(featureCol) === col("feature"))
      .select(
        col(idCol),
        col("feature"),
        col(valueCol).as("value"),
        when(col(valueCol).isNull, lit(null))
          .when(
            col("mx") > col("mn"),
            least(
              floor((col(valueCol) - col("mn")) / (col("mx") - col("mn")) * nBins),
              lit(nBins - 1L)))
          .otherwise(lit(0L)).as("width_bin"),
        ntile(nBins).over(w).cast("long").as("freq_bin"))
  }

  /** Winsorization — clip each feature to its [lo, hi] exact
    * interpolated percentiles (the robust alternative to dropping
    * outliers: heavy tails are pulled to the fence, sample size
    * preserved). Complements [[scaleFeatures]]: winsorize first, scale
    * second is the standard robust-prep chain. Percentiles are the
    * portable exact-interpolation pair (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the q_percentiles-proven path); the clip is
    * least/greatest on broadcast fences — a narrow map over one scan.
    * NULL values stay NULL (guarded: engines disagree on
    * least/greatest NULL semantics, so the clip never sees a NULL).
    */
  def winsorize(
      events: DataFrame,
      idCol: String,
      featureCol: String,
      valueCol: String,
      lo: Double,
      hi: Double
  ): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val fences = events
      .groupBy(col(featureCol).as("feature"))
      .agg(
        percentile(col(valueCol), lit(lo)).as("p_lo"),
        percentile(col(valueCol), lit(hi)).as("p_hi"))
    events
      .join(broadcast(fences), col(featureCol) === col("feature"))
      .select(
        col(idCol),
        col("feature"),
        col(valueCol).as("value"),
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
          .as("clipped"),
        coalesce(
          (col(valueCol) < col("p_lo") || col(valueCol) > col("p_hi")).cast("int"),
          lit(0)).as("was_clipped"))
  }

  /** Leakage-safe chronological split: train on the past, evaluate on
    * the future — the split a time-series / feature-store pipeline must
    * use when the hash splits ([[trainTestSplit]]) would leak future
    * rows into training. The boundary is the exact floor(f·n)-th row of
    * the (ts, tiebreak) total order, computed with the scale-safe
    * numbering primitive ([[globalRowNumbers]]'s range-partition +
    * prefix-sum offsets — never a single-task global window).
    */
  def timeSplit(
      df: DataFrame,
      orderCols: Seq[String], // must be a TOTAL order, time first
      trainFraction: Double
  ): DataFrame = {
    require(
      trainFraction > 0.0 && trainFraction < 1.0,
      s"trainFraction must be in (0, 1), got $trainFraction")
    val (parted, offsets) = numberedPartitions(df, orderCols)
    val total = offsets.map(_._3).sum
    val cut = math.floor(trainFraction * total).toLong
    rangeSlice(parted, offsets, 0L, total, orderCols)
      .withColumn(
        "split",
        when(col("row_number") <= cut, lit("train")).otherwise(lit("test")))
      .drop("row_number")
  }

  /** The hashing trick (Weinberger et al., ICML'09): map arbitrary
    * categorical features into a fixed D-dimensional sparse vector
    * with a signed hash — no vocabulary build, no dictionary shuffle,
    * memory O(1) however many distinct values arrive (THE featurizer
    * for unbounded-cardinality columns at 100 TB). Feature index =
    * md5-top-60-bits("name:value") mod D; the sign bit (hash bit 59)
    * debiases collisions (E[collision contribution] = 0). Output is
    * the sparse COO form (entity, feature_idx, weight): weights are
    * exact integers (sum of ±1), so the whole featurization
    * hash-matches in any engine. One narrow projection + explode +
    * one map-side-combined aggregation — scan-speed, no joins.
    */
  def featureHash(
      df: DataFrame,
      entityCol: String,
      features: Seq[(String, Column)],
      dims: Int
  ): DataFrame = {
    require(dims > 0, "dims must be positive")
    val feats = features.map { case (name, c) =>
      val h = graft.functions.TextFunctions.md5Long60(
        concat_ws(":", lit(name), c.cast("string")))
      struct(
        pmod(h, lit(dims.toLong)).as("feature_idx"),
        (shiftright(h, 59).bitwiseAND(lit(1L)) * 2L - 1L).as("w"))
    }
    df
      .select(col(entityCol).as("entity"), explode(array(feats: _*)).as("f"))
      .groupBy(col("entity"), col("f.feature_idx").as("feature_idx"))
      .agg(sum(col("f.w")).as("weight"))
  }

  /** Assemble the sparse COO output of [[featureHash]] into dense
    * fixed-width vectors (the VectorAssembler step before model
    * training). One per-entity aggregation; the map lookup makes the
    * result independent of collection order. Absent slots are 0.
    */
  def featureMatrix(sparse: DataFrame, dims: Int): DataFrame =
    sparse
      .groupBy(col("entity"))
      .agg(map_from_entries(
        collect_list(struct(col("feature_idx"), col("weight")))).as("m"))
      .select(
        col("entity"),
        transform(
          sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))).as("features"))

  def featureStats(
      events: DataFrame,
      groupCol: String,
      valueCol: String,
      entityCol: String
  ): DataFrame =
    events
      .groupBy(col(groupCol).as("feature"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(valueCol).isNull, 1).otherwise(0)).as("n_null"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        // exact-decimal sum / count: order-independent, oracle-exact
        (sum(col(valueCol).cast("decimal(18,6)")).cast("double") / count(col(valueCol)))
          .as("avg_value"),
        count_distinct(col(entityCol)).as("n_entities"))

  /** Robust (median/MAD) outlier gate — the companion of
    * [[outlierValues]]'s z-score gate for the heavy-tailed features
    * where mean/std are themselves dragged by the outliers. Per
    * feature group: median, MAD = median(|v − median|), and the
    * modified z-score 0.6745·(v − median)/MAD (Iglewicz–Hoaglin);
    * rows with |Mz| > `cutoff` (conventionally 3.5) are flagged. A
    * zero MAD (half the group at one value) defines no spread — such
    * groups flag nothing, mirroring std = 0 in the z-gate.
    *
    * Exactness: medians come from exact interpolated percentiles (the
    * q_percentiles-proven portable path) and Mz is a fixed sequence
    * of IEEE ops on them — bit-reproducible, so the cutoff decision
    * is too. Scale: two tiny per-group aggregations broadcast back
    * over one scan each; exact `percentile` buffers each group's
    * values (the orderPercentilesApprox note applies — swap in the
    * mergeable sketch at extreme group sizes).
    */
  def outliersMad(
      events: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      cutoff: Double
  ): DataFrame = {
    val med = events
      .groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val mad = events
      .join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        first(col("med")).as("med"),
        percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"))
    events
      .join(broadcast(mad), Seq(groupCol))
      .withColumn(
        "robust_z",
        (col(valueCol) - col("med")) * lit(0.6745) / col("mad"))
      .where(col("mad") > 0 && abs(col("robust_z")) > cutoff)
      .select(
        col(idCol), col(groupCol), col(valueCol),
        col("med"), col("mad"), col("robust_z"))
  }

  /** Nearest-in-time as-of join — pandas `merge_asof(direction =
    * 'nearest')` parity, completing [[asofJoin]]'s backward+tolerance
    * surface: every left row gets the right row whose ts is CLOSEST in
    * either direction (ties go backward, the conservative
    * no-future-leakage default). Same single-shuffle shape as the PIT
    * join: tagged union, one exchange on the entity key, then TWO
    * frames over the SAME window sort (trailing last + leading first
    * — one WindowExec, no second sort), never an inequality-join
    * blowup. Equal-ts right rows sort before the left row (inclusive
    * backward boundary, distance 0) and resolve by tiebreak.
    *
    * Returns (entity, left_id, ts_us, matched_value, matched_ts_us,
    * direction 'back'|'fwd'|null).
    */
  def asofNearest(
      left: DataFrame,
      leftEntity: String,
      leftTs: String,
      leftTiebreak: String,
      right: DataFrame,
      rightEntity: String,
      rightValue: String,
      rightTs: String,
      rightTiebreak: String
  ): DataFrame = {
    val vType = right.schema(rightValue).dataType
    val l = left.select(
      col(leftEntity).as("entity"), col(leftTs).as("ts"),
      lit(1).as("kind"), col(leftTiebreak).cast("long").as("tb"),
      lit(null).cast(vType).as("v"))
    val r = right.select(
      col(rightEntity).as("entity"), col(rightTs).as("ts"),
      lit(0).as("kind"), col(rightTiebreak).cast("long").as("tb"),
      col(rightValue).as("v"))
    val sorted = Window
      .partitionBy(col("entity"))
      .orderBy(col("ts"), col("kind"), col("tb"))
    val back = sorted.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = sorted.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightRow =
      when(col("kind") === 0, struct(col("ts").as("mts"), col("v").as("mval")))
    val filled = l.unionByName(r)
      .withColumn("mb", last(rightRow, ignoreNulls = true).over(back))
      .withColumn("mf", first(rightRow, ignoreNulls = true).over(fwd))
    val dBack = unix_micros(col("ts")) - unix_micros(col("mb.mts"))
    val dFwd = unix_micros(col("mf.mts")) - unix_micros(col("ts"))
    val useBack = col("mb").isNotNull && (col("mf").isNull || dBack <= dFwd)
    filled
      .where(col("kind") === 1)
      .select(
        col("entity"), col("tb").as("left_id"), unix_micros(col("ts")).as("ts_us"),
        when(useBack, col("mb.mval")).otherwise(col("mf.mval")).as("matched_value"),
        when(useBack, unix_micros(col("mb.mts")))
          .otherwise(unix_micros(col("mf.mts"))).as("matched_ts_us"),
        when(col("mb").isNull && col("mf").isNull, lit(null).cast("string"))
          .when(useBack, lit("back")).otherwise(lit("fwd")).as("direction"))
  }

  /** A declarative data-quality contract check (the "expectations"
    * gate a feature pipeline runs before registering a source —
    * featureform validates source schemas at registration,
    * provider/offline.go ResourceSchema; this is the value-level
    * counterpart). Each check yields one report row
    * (check, column, n_violations, n_rows, pass).
    *
    * Scale shape: every row-level check compiles to one conditional
    * sum inside a SINGLE map-side-combined aggregate over one scan —
    * adding a check adds an accumulator, not a pass. Uniqueness
    * checks need real distinct-counting, so each adds one
    * count(DISTINCT col) to the same aggregate (Spark plans the
    * distincts via Expand — still one scan of the input).
    */
  sealed trait ContractCheck { def column: String }
  object ContractCheck {
    /** Column must never be null. */
    case class NotNull(column: String) extends ContractCheck
    /** Non-null values must lie in [lo, hi]. */
    case class InRange(column: String, lo: Double, hi: Double) extends ContractCheck
    /** Non-null values must be one of `allowed`. */
    case class InSet(column: String, allowed: Seq[String]) extends ContractCheck
    /** Non-null values must be distinct (duplicates are violations). */
    case class Unique(column: String) extends ContractCheck
  }

  def dataContract(df: DataFrame, checks: Seq[ContractCheck]): DataFrame = {
    import ContractCheck._
    def cnt(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
    val aggs = checks.zipWithIndex.map { case (chk, i) =>
      val c = col(chk.column)
      val violations = chk match {
        case NotNull(_)        => cnt(c.isNull)
        case InRange(_, lo, hi) => cnt(c.isNotNull && (c < lo || c > hi))
        case InSet(_, allowed) => cnt(c.isNotNull && !c.isin(allowed: _*))
        case Unique(_)         => count(c) - countDistinct(c)
      }
      violations.as(s"v$i")
    }
    val name: ContractCheck => String = {
      case NotNull(_)     => "not_null"
      case InRange(_, _, _) => "in_range"
      case InSet(_, _)    => "in_set"
      case Unique(_)      => "unique"
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val reportRows = checks.zipWithIndex.map { case (chk, i) =>
      struct(
        lit(name(chk)).as("check"),
        lit(chk.column).as("column_name"),
        coalesce(col(s"v$i"), lit(0L)).as("n_violations"))
    }
    one
      .select(col("n_rows"), explode(array(reportRows: _*)).as("c"))
      .select(
        col("c.check").as("check"), col("c.column_name").as("column_name"),
        col("c.n_violations").as("n_violations"), col("n_rows"),
        (col("c.n_violations") === 0L).as("pass"))
  }

  /** Apply a CDC changelog (op ∈ I/U/D) to a snapshot — the merge
    * step every warehouse-fed feature table runs on a Debezium-style
    * feed. Contract: the changelog postdates the snapshot, so any
    * change to a key outdates its snapshot row; among changes the
    * latest (ts, seq) wins; a winning D deletes the key; untouched
    * keys keep their snapshot value.
    *
    * Same single-shuffle tagged-union window as [[materializeLatest]]:
    * union both sides, ONE hash exchange on entity, per-entity sort,
    * keep the top row, drop deletes. No join of snapshot × changelog,
    * so at 100 TB cost is (|snapshot| + |log|) log-sorted per
    * partition — and with a daily log the AQE-coalesced exchange is
    * dominated by the snapshot scan itself.
    */
  def cdcApply(
      snapshot: DataFrame, // (entity, value, ts_us)
      changes: DataFrame // (op, entity, value, ts_us, seq)
  ): DataFrame = {
    val snap = snapshot.select(
      col("entity"), col("value"), col("ts_us"),
      lit("I").as("op"), lit(0).as("pri"), lit(Long.MinValue).as("seq"))
    val chg = changes.select(
      col("entity"), col("value"), col("ts_us"),
      col("op"), lit(1).as("pri"), col("seq"))
    val w = Window
      .partitionBy(col("entity"))
      .orderBy(col("pri").desc, col("ts_us").desc, col("seq").desc)
    snap
      .unionByName(chg)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("entity"), col("value"), col("ts_us"))
  }

  /** Multi-horizon rolling features at label times — the classic
    * feature-store "aggregations over sliding event-time windows"
    * surface (count/sum of feature events in the trailing 1h / 24h /
    * … as of each label event). Point-in-time clean by construction:
    * each frame is (label_ts − window, label_ts − 1µs], so nothing
    * at-or-after the label leaks in.
    *
    * Plan shape: every horizon shares ONE partition-by-entity /
    * order-by-ts sort — Spark evaluates all the range frames inside a
    * single Window operator over a single shuffle, so adding a horizon
    * adds zero exchanges. Value sums run in DECIMAL (order-exact).
    */
  def rollingFeatures(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      labelType: String,
      featureType: String,
      windowsUs: Seq[(String, Long)] // (suffix, window length in µs)
  ): DataFrame = {
    val base = events.select(
      col(entityCol).as("entity"), unix_micros(col(tsCol)).as("ts_us"),
      col(typeCol).as("etype"), col(valueCol).as("value"))
    val isF = col("etype") === featureType
    // all horizons in ONE select: same-frame exprs merge into a single
    // Window operator per horizon, all sharing one Exchange+Sort
    val winCols = windowsUs.flatMap { case (name, us) =>
      val w = Window.partitionBy(col("entity")).orderBy(col("ts_us"))
        .rangeBetween(-us, -1)
      Seq(
        coalesce(sum(when(isF, 1L)).over(w), lit(0L)).as(s"n_$name"),
        coalesce(
          sum(when(isF, col("value").cast("decimal(18,6)"))).over(w).cast("double"),
          lit(0.0)).as(s"sum_$name"))
    }
    base
      .select(col("*") +: winCols: _*)
      .where(col("etype") === labelType)
      .select(
        Seq(col("entity"), col("ts_us"), col("value").as("label")) ++
          windowsUs.flatMap { case (n, _) => Seq(col(s"n_$n"), col(s"sum_$n")) }: _*)
  }

  /** Online-store bulk-load manifest — the offline→online
    * materialization handoff (featureform materializes features into
    * Redis/Dynamo-class stores; the bulk path ships hash shards). The
    * latest materialization is hash-sharded on entity (md5-based, so
    * any engine reproduces the assignment) and each shard reports its
    * row count, exact value sum, entity span, and an order-independent
    * content checksum (bit-XOR of per-row md5 keys) — what a loader
    * needs to verify a shard landed complete. One aggregate, map-side
    * combined; `shards` output rows.
    */
  def onlineExport(mat: DataFrame, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val shard = pmod(
      graft.functions.TextFunctions.md5Long60(col("entity").cast("string")), lit(shards.toLong))
    val rowKey = graft.functions.TextFunctions.md5Long60(
      concat_ws("|", col("entity"), col("ts_us")))
    mat
      .withColumn("_row_key", rowKey)
      .groupBy(shard.as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        min(col("entity")).as("min_entity"),
        max(col("entity")).as("max_entity"),
        expr("bit_xor(_row_key)").as("checksum"))
  }

  /** TTL-gated serving view — the batch analog of an online store's
    * feature TTL (a materialized value older than `ttl` at serving
    * time must not be served; it reads as a miss, not a stale hit).
    * `matWithServingTs` is a materialization carrying a serving
    * timestamp column (typically cross-joined from a 1-row broadcast
    * aggregate); stale entities keep their row with a NULL value and
    * `fresh = false`, so coverage accounting still sees them.
    * Pure row-local projection — no shuffle beyond the input's.
    */
  def serveWithTtl(
      matWithServingTs: DataFrame, // (entity, value, ts, <servingTs>)
      servingTs: Column,
      ttl: Column // an INTERVAL expression
  ): DataFrame = {
    val fresh = col("ts") >= servingTs - ttl
    matWithServingTs.select(
      col("entity"),
      when(fresh, col("value")).as("value"),
      fresh.as("fresh"),
      (unix_micros(servingTs) - unix_micros(col("ts"))).as("age_us"))
  }

  /** On-demand features (featureform's client-computed features:
    * functions of request-time inputs plus precomputed features,
    * evaluated at serving — not materialized). Batch analog: left-join
    * each named feature view onto the request frame by entity, then
    * evaluate the derived columns row-locally. Missing features
    * surface as NULLs to the derivation (exactly what the serving
    * runtime sees), and the derived exprs are plain Catalyst columns —
    * whole-stage codegen, no UDFs.
    */
  def onDemandServe(
      requests: DataFrame, // carries `entity` plus request context cols
      features: Seq[(String, DataFrame)], // name -> (entity, value)
      derived: Seq[(String, Column)]
  ): DataFrame = {
    val joined = features.foldLeft(requests) { case (acc, (name, f)) =>
      acc.join(f.select(col("entity"), col("value").as(name)), Seq("entity"), "left")
    }
    derived.foldLeft(joined) { case (acc, (name, c)) => acc.withColumn(name, c) }
  }

  /** Entity mapping (featureform's EntityMappings on SQL
    * transformations: raw source ids resolved to canonical entities
    * before materialization). Ids absent from the mapping pass through
    * unchanged. The mapping is broadcast by default — an identity map
    * is a classic small dim — set `broadcastMapping=false` when it is
    * itself large (then the hash join shuffles on the entity key the
    * downstream materialization needs anyway).
    */
  def mapEntities(
      df: DataFrame,
      entityCol: String,
      mapping: DataFrame,
      aliasCol: String,
      canonicalCol: String,
      broadcastMapping: Boolean = true
  ): DataFrame = {
    val m0 = mapping.select(col(aliasCol).as("_alias"), col(canonicalCol).as("_canon"))
    val m = if (broadcastMapping) broadcast(m0) else m0
    df.join(m, df(entityCol) === m("_alias"), "left")
      .withColumn(entityCol, coalesce(col("_canon"), col(entityCol)))
      .drop("_alias", "_canon")
  }

  /** Pairwise Pearson correlations across integer feature columns —
    * the redundancy screen that pairs with [[mutualInformation]]'s
    * relevance screen (drop one of two features that say the same
    * thing). ONE map-side-combined aggregate computes every Σx, Σx²
    * and Σxy (adding a feature adds accumulators, not passes); r is
    * assembled from the exact integer sums with mirrored IEEE ops and
    * emitted in fixed-point micro-units. Zero-variance features yield
    * NULL r (not an ANSI divide-by-zero). Caller guarantees the sums
    * fit a long (integer features, corpus < ~2^26 rows at count-like
    * magnitudes — cast upstream for more).
    */
  def featureCorrelations(df: DataFrame, features: Seq[String]): DataFrame = {
    require(features.size >= 2, "need at least two features to correlate")
    val pairs = for {
      i <- features.indices; j <- (i + 1) until features.size
    } yield (features(i), features(j))
    val aggs =
      features.flatMap(f => Seq(
        sum(col(f)).as(s"s_$f"),
        sum(col(f) * col(f)).as(s"ss_$f"))) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") } :+
        count(lit(1)).as("n")
    val t = df.agg(aggs.head, aggs.tail: _*)
    def rMicro(a: String, b: String): Column = {
      val va = col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")
      val vb = col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")
      val num = col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      when(va > 0 && vb > 0,
        floor(num.cast("double") / sqrt(va.cast("double") * vb.cast("double"))
          * lit(1000000.0)).cast("long"))
    }
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("feat_a"), lit(b).as("feat_b"), rMicro(a, b).as("r_micro"))
    }
    t.select(explode(array(rows: _*)).as("e")).select(col("e.*"))
  }

  /** Mutual information between a (binned) feature and a label —
    * feature-selection screening over a materialized frame. Emits one
    * row per (bin, label) cell with its joint/marginal counts and the
    * cell's MI contribution p·ln(p/(px·py)) in FIXED-POINT pico-nats
    * (the same engine-portable integer-units trick as entropyScore:
    * every float op is an IEEE op both engines execute identically,
    * and floor pins the result, so the BIGINT is hash-exact). Total MI
    * is the plain sum of `mi_pico` over the cells.
    *
    * Plan: one groupBy to the cell table (≤ |bins|·|labels| rows),
    * then marginals and the total are broadcast joins of frames
    * derived from it — nothing rescans the input.
    */
  def mutualInformation(
      df: DataFrame,
      featureBin: Column,
      label: Column
  ): DataFrame = {
    val cells = df
      .select(featureBin.as("bin"), label.as("label"))
      .groupBy(col("bin"), col("label"))
      .agg(count(lit(1)).as("n"))
      .pinned() // cells are tiny; compute once, derive thrice
    val bins = cells.groupBy(col("bin")).agg(sum(col("n")).as("nb"))
    val labels = cells.groupBy(col("label")).agg(sum(col("n")).as("nl"))
    val total = cells.agg(sum(col("n")).as("nt"))
    cells
      .join(broadcast(bins), "bin")
      .join(broadcast(labels), "label")
      .crossJoin(broadcast(total))
      .select(
        col("bin"), col("label"), col("n"), col("nb"), col("nl"), col("nt"),
        floor(
          log((col("n").cast("double") * col("nt")) /
              (col("nb").cast("double") * col("nl")))
            * col("n") * lit(1000000000000.0) / col("nt"))
          .cast("long").as("mi_pico"))
  }

  /** Decile lift / calibration table — the model-monitoring view of a
    * scored population: rank entities by score, cut into k exact
    * quantile groups (decile 1 = highest scores), and report per group
    * the positive rate, mean score, and lift vs the base rate. All
    * integer arithmetic (scores arrive in micro-units; rates and lift
    * leave as truncating micro-ratios), so the table is reproducible
    * across engines and partitionings.
    *
    * Input contract: one row per entity with `entity`, `score_micro`
    * (BIGINT), `label` (0/1). Ranking uses the distributed prefix-sum
    * numbering ([[globalRowNumbers]]) — no single-partition window —
    * with `entity` as the total-order tiebreak; group sizes follow the
    * standard ntile split (first n mod k groups one larger). The only
    * driver-side value is the 1-row population count.
    */
  def liftTable(scored: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val base = scored.select(col("entity"), col("score_micro"), col("label"))
      .pinned() // numbering + totals over one computed base
    val n = base.count()
    require(n >= k, s"need at least k=$k entities, got $n")
    val big = n % k
    val q = n / k
    val ntile =
      when(col("row_number") <= big * (q + 1),
        expr(s"(row_number - 1) div ${q + 1}"))
        .otherwise(lit(big) + expr(s"(row_number - ${big * (q + 1)} - 1) div $q")) +
        lit(1L)
    val totals = base.agg(
      count(lit(1)).as("n_total"), sum(col("label")).as("pos_total"))
    globalRowNumbers(base, Seq("score_micro", "entity"))
      .withColumn("decile", lit(k + 1L) - ntile)
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_entities"),
        sum(col("label")).as("n_pos"),
        sum(col("score_micro")).as("sum_score"))
      .crossJoin(broadcast(totals))
      .select(
        col("decile"),
        col("n_entities"),
        col("n_pos"),
        expr("n_pos * 1000000 div n_entities").as("pos_rate_micro"),
        expr("sum_score div n_entities").as("mean_score_micro"),
        when(col("pos_total") > 0,
          expr("n_pos * n_total * 1000000 div (n_entities * pos_total)"))
          .as("lift_micro"))
  }

  /** Exact categorical vocabulary encoder — the StringIndexer /
    * label-vocabulary step of classical feature engineering (the
    * non-hashed counterpart of [[featureHash]]; featureform users run
    * this as a SQL transformation before materialization). Vocabulary =
    * categories whose corpus frequency >= `minCount`, indexed 0..V-1 by
    * (frequency desc, value asc) so the layout is fully deterministic;
    * everything below the floor (and anything unseen at apply time)
    * encodes as the OOV index -1.
    *
    * Scale shape: one map-side-combined groupBy builds the counts
    * (output bounded by category CARDINALITY, not corpus size); the
    * ordered indexing runs over those V vocab rows through
    * [[globalRowNumbers]] — the distributed prefix-sum numbering, so
    * even a pathological high-cardinality vocabulary (ids-as-
    * categories) never funnels into a single-task sort. The APPLY side
    * defaults to a broadcast hash join — scan + broadcast-probe, no
    * corpus shuffle — which assumes a broadcast-SIZED vocabulary; for
    * the ids-as-categories regime (a vocabulary too big to broadcast)
    * pass `broadcastVocab = false` and the apply becomes a plain
    * shuffled hash join on the category key (one corpus shuffle,
    * no driver/executor-memory ceiling). The indexing side survives
    * either regime; the flag only picks the apply-join strategy.
    */
  def vocabEncode(
      df: DataFrame,
      entityCol: String,
      featureCol: String,
      minCount: Long = 1L,
      broadcastVocab: Boolean = true
  ): DataFrame = {
    val counts = df
      .groupBy(col(featureCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      // (-cnt, value) ascending == (frequency desc, value asc); the
      // pair is a total order because values are distinct post-groupBy
      .withColumn("neg_cnt", -col("cnt"))
    val vocab0 = globalRowNumbers(counts, Seq("neg_cnt", featureCol))
      .select(col(featureCol), (col("row_number") - 1L).as("idx"))
    val vocab = if (broadcastVocab) broadcast(vocab0) else vocab0
    df.select(col(entityCol).as("entity"), col(featureCol).as("category"))
      .join(vocab, col("category") === vocab(featureCol), "left")
      .select(
        col("entity"),
        col("category"),
        coalesce(col("idx"), lit(-1L)).as("idx"))
  }

  /** Deterministic negative sampling — the candidate-generation step of
    * contrastive / recommender training data: for each user, up to `k`
    * items the user has NOT interacted with, drawn by content-keyed
    * pseudo-random proposals so the sample is reproducible across runs,
    * engines, and partitionings (md5-keyed like [[graft.operators.Sampling]]).
    *
    * Each user gets `proposals` candidate draws (slot 0..proposals-1);
    * draw = md5(seed:user:slot) mod |items|, mapped to a REAL item
    * through a dense 0..|items|-1 index over the item table (built
    * with [[globalRowNumbers]] — the distributed prefix-sum, never a
    * single-task window). Sampling the INDEX rather than the raw key
    * space means every emitted negative exists in the catalog even
    * when item keys are sparse or non-zero-based — a raw
    * `mod max(key)+1` draw proposes phantom items in every key gap,
    * which survive the anti join (never positives) and poison the
    * training set with nonexistent "negatives". Positives are removed
    * with a left-anti join, duplicate draws collapse to their first
    * slot, and the earliest `k` surviving slots win.
    *
    * Scale shape: proposals are generated by explode over users —
    * O(users x proposals) rows, never the users x items cross join that
    * the naive formulation implies. The draw→item mapping is one hash
    * join on the dense index (items-sized, broadcast when small); the
    * anti join hash-partitions on (user, item) — linear in
    * interactions — and the final top-k window partitions by user over
    * <= `proposals` rows per key. |items| comes from the index's own
    * prefix-sum offsets — no extra counting pass.
    */
  def negativeSample(
      users: DataFrame,
      userCol: String,
      interactions: DataFrame,
      iUserCol: String,
      iItemCol: String,
      items: DataFrame,
      itemKeyCol: String,
      proposals: Int,
      k: Int,
      seed: String
  ): DataFrame = {
    require(proposals >= k, s"proposals=$proposals must be >= k=$k")
    val (numbered, nItems) = globalRowNumbersWithTotal(
      items.select(col(itemKeyCol).cast("long").as("item")).distinct(),
      Seq("item"))
    require(nItems > 0, "negativeSample needs a non-empty item table")
    val itemIdx = numbered.select((col("row_number") - 1L).as("_draw"), col("item"))
    val prop = users
      .select(col(userCol).cast("long").as("user"))
      .select(
        col("user"),
        explode(sequence(lit(0L), lit(proposals - 1L))).as("slot"))
      .withColumn(
        "_draw",
        conv(
          substring(
            md5(concat(
              lit(s"$seed:"), col("user").cast("string"),
              lit(":"), col("slot").cast("string"))),
            1, 15),
          16, 10).cast("long") % lit(nItems))
      .join(itemIdx, Seq("_draw"))
      .select(col("user"), col("slot"), col("item"))
    val pos = interactions
      .select(
        col(iUserCol).cast("long").as("user"),
        col(iItemCol).cast("long").as("item"))
      .distinct()
    prop
      .join(pos, Seq("user", "item"), "left_anti")
      .groupBy(col("user"), col("item"))
      .agg(min(col("slot")).as("slot"))
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("user")).orderBy(col("slot"), col("item"))))
      .where(col("rk") <= k)
      .select(col("user"), col("item"), col("slot"))
  }

  /** Forward-looking label generation — the churn/conversion label
    * builder: for every anchor event, label 1 iff the same entity has
    * an outcome event STRICTLY after the anchor and within
    * `horizonUs`, plus the exact time-to-outcome when it does. The
    * mirror image of the point-in-time training set (features look
    * back, labels look forward); `fs_leakage_audit` polices the
    * backward side, this builds the forward side.
    *
    * Plan: anchors and outcomes merge into ONE per-entity stream and a
    * single window pass computes each anchor's next outcome timestamp
    * (running min over the reversed order; equal-timestamp outcomes
    * sort below the anchor so "strictly after" is exact) — one shuffle
    * on entity, NEVER the anchor×outcome inequality join whose hot
    * entities explode quadratically at 100 TB. `anchorIs`/`outcomeIs`
    * must be disjoint predicates.
    */
  def labelHorizon(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      anchorIs: Column,
      outcomeIs: Column,
      horizonUs: Long
  ): DataFrame = {
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val tagged = events
      .where(anchorIs || outcomeIs)
      .select(
        col(entityCol).as("entity"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).as("event_id"),
        when(outcomeIs, 0).otherwise(1).as("flag"))
    // ascending order is (ts, flag, id): an outcome at the anchor's
    // exact timestamp (flag 0) sorts BEFORE the anchor, so the
    // suffix-min below never counts it. The window runs the REVERSE
    // of that order with a strict preceding frame = suffix of the
    // ascending order.
    val w = Window
      .partitionBy(col("entity"))
      .orderBy(col("ts_us").desc, col("flag").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn(
        "next_us", min(when(col("flag") === 0, col("ts_us"))).over(w))
      .where(col("flag") === 1)
      .select(
        col("event_id"),
        col("entity"),
        col("ts_us"),
        (col("next_us").isNotNull &&
          col("next_us") <= col("ts_us") + horizonUs).cast("int").as("label"),
        when(
          col("next_us") <= col("ts_us") + horizonUs,
          col("next_us") - col("ts_us")).as("ttc_us"))
  }

  /** Per-day aggregate of an event stream: (day, feature) -> row count
    * + exact micro-unit spend. The materialized table that
    * [[backfillDays]] maintains.
    */
  def dailyAggregate(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String): DataFrame =
    events
      .groupBy(
        to_date(col(tsCol)).as("day"), col(typeCol).as("feature"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col(valueCol) * 1000000.0).cast("long")).as("spend_micro"))

  /** Per-day source fingerprint: row count + order-independent xor of
    * md5 over the FULL row content (id, feature type, exact timestamp,
    * micro-unit value) — written alongside a daily materialization so
    * a later snapshot can be diffed per PARTITION without comparing
    * row data. Hashing content, not just the id, is what lets
    * [[backfillDays]] detect IN-PLACE CORRECTIONS (same event_id,
    * changed value/type/ts) — an id-only fingerprint is blind to
    * exactly the late-correction case selective backfill exists for.
    * One map-side-combined pass; ~30 rows/month output.
    */
  def dailyManifest(
      events: DataFrame,
      tsCol: String,
      idCol: String,
      typeCol: String,
      valueCol: String
  ): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr(
          s"""bit_xor(cast(conv(substring(md5(concat_ws(':',
             |cast($idCol as string), cast($typeCol as string),
             |cast(unix_micros($tsCol) as string),
             |cast(floor($valueCol * 1000000) as string))), 1, 15), 16, 10) as bigint))"""
            .stripMargin.replaceAll("\n", " "))
          .as("xor_key"))

  /** Selective partition backfill — the pattern that makes a 100 TB
    * backfill affordable: when late/corrected data lands, do NOT
    * recompute three years of daily aggregates; diff the per-day
    * manifests (current snapshot vs the one the materialization was
    * built from), recompute ONLY the dirty days, and carry every clean
    * day's rows forward untouched. On a date-partitioned source (see
    * `source_partitioned_prune`) the dirty-day semi join prunes the
    * recompute scan to the dirty partitions at planning time.
    *
    * Returns the refreshed daily aggregate, each row flagged
    * `backfilled` (1 = recomputed this run) — equal to a full
    * recompute from the current snapshot (the oracle), with the flag
    * auditing that detection fired on exactly the changed days.
    * `dirtyDays` is day-count-sized, hence the broadcast joins.
    */
  def backfillDays(
      current: DataFrame,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      idCol: String,
      staleAgg: DataFrame,
      staleManifest: DataFrame
  ): DataFrame = {
    val curM = dailyManifest(current, tsCol, idCol, typeCol, valueCol)
      .select(col("day"), col("n_rows").as("cn"), col("xor_key").as("cx"))
    val dirtyDays = curM
      .join(
        staleManifest.select(
          col("day"), col("n_rows").as("sn"), col("xor_key").as("sx")),
        Seq("day"), "full_outer")
      .where(
        col("cn").isNull || col("sn").isNull ||
          col("cn") =!= col("sn") || col("cx") =!= col("sx"))
      .select(col("day"))
      // pin: both output branches (anti-join keep, semi-join
      // recompute) consume the dirty-day set; unpinned, each branch
      // re-evaluates the manifest diff — TWO extra full corpus scans
      // at 100 TB for a frame of at most #days rows.
      .pinned()
    val recomputed = dailyAggregate(
      current
        .withColumn("day", to_date(col(tsCol)))
        .join(broadcast(dirtyDays), Seq("day"), "left_semi"),
      tsCol, typeCol, valueCol)
      .withColumn("backfilled", lit(1))
    staleAgg
      .join(broadcast(dirtyDays), Seq("day"), "left_anti")
      .withColumn("backfilled", lit(0))
      .unionByName(recomputed)
  }
}
