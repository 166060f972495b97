package graft.sources

import graft.operators.Pins.PinOps
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log table format — the graft analog of the
  * reference's lakehouse registration path (its Spark runner reads and
  * writes Iceberg/Delta catalogs, reference:
  * provider/scripts/spark/offline_store_spark_runner.py:193 IcebergClient,
  * :213 DeltaClient). Those libraries aren't on this classpath, so graft
  * implements the protocol core itself on plain parquet + a JSON commit
  * log — the same design Delta's spec describes publicly:
  *
  *   <root>/<table>/data/v<ver>-<nonce>/part-*.parquet (immutable files)
  *   <root>/<table>/_log/v%08d.json                  (ordered commits)
  *
  * Each commit is one atomically-created log file listing the data
  * directories it ADDS and whether it REPLACES the prior snapshot
  * (overwrite) or extends it (append). A reader reconstructs any
  * snapshot by replaying the log up to a version — time travel — and a
  * writer claims version N+1 by `create(overwrite=false)`, so two racing
  * writers cannot both commit the same version (optimistic concurrency;
  * the loser retries on the next version number).
  *
  * Why this scales: commits are O(1) driver-side metadata (a few hundred
  * bytes each, never row data); snapshot resolution reads only the log
  * (versions × small JSON), and the data read is a plain multi-path
  * parquet scan, so partition pruning / filter pushdown work exactly as
  * on any parquet source. At 100 TB the data directories are the same
  * files a raw-parquet layout would have — the log adds snapshot
  * isolation and time travel without touching the data path.
  */
object Lakehouse {

  /** Per-file zone map for one clustering column: [lo, hi] of the
    * column's values in that file (doubles — numeric cluster keys).
    */
  case class FileStat(path: String, lo: Double, hi: Double)

  /** Zone maps for one column, attached to a commit by
    * [[commitClustered]] / [[commitZOrdered]].
    */
  case class ClusterStats(column: String, files: Seq[FileStat])

  /** One replayed commit. `batchId` marks idempotent streaming appends;
    * `clusters` carries per-column zone maps when the commit was
    * clustered (one entry for a range-clustered commit, one per
    * dimension for a z-ordered commit).
    */
  case class Commit(
      version: Int,
      action: String,
      dataDirs: Seq[String],
      batchId: Option[Long] = None,
      clusters: Seq[ClusterStats] = Nil)

  private def logDir(root: String, table: String) = new Path(s"$root/$table/_log")
  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logPath(root: String, table: String, version: Int): Path =
    new Path(logDir(root, table), f"v$version%08d.json")

  /** All committed versions, ascending. Ignores foreign files in _log. */
  def versions(spark: SparkSession, root: String, table: String): Seq[Int] = {
    val dir = logDir(root, table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.matches("v\\d{8}\\.json") => n.substring(1, 9).toInt }
        .sorted
  }

  private def readCommit(spark: SparkSession, root: String, table: String, v: Int): Commit = {
    val p = logPath(root, table, v)
    val in = fs(spark, p).open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseCommit(v, body)
  }

  /** Every commit in the log, ascending — including ones an overwrite
    * has superseded (they remain time-travelable and batchId-visible).
    */
  def allCommits(spark: SparkSession, root: String, table: String): Seq[Commit] =
    versions(spark, root, table).map(v => readCommit(spark, root, table, v))

  /** Replay the log up to `versionAsOf` (inclusive; latest when None)
    * and return the commits that survive: everything since the last
    * overwrite at-or-before the pin.
    *
    * Replay cost is bounded by LOG CHECKPOINTS ([[checkpoint]]): when
    * one exists at-or-before the pin, replay starts from its snapshot
    * instead of version 1 — a year of minutely appends resolves from
    * the last checkpoint + tail, not 500k JSON reads.
    */
  def snapshotCommits(
      spark: SparkSession,
      root: String,
      table: String,
      versionAsOf: Option[Int] = None
  ): Seq[Commit] = {
    val vs = versions(spark, root, table)
    require(
      versionAsOf.forall(p => vs.contains(p)),
      s"version ${versionAsOf.getOrElse(-1)} of $table does not exist (have: $vs)")
    val upTo = vs.filter(v => versionAsOf.forall(v <= _))
    val ckpt = checkpointVersions(spark, root, table)
      .filter(v => upTo.contains(v)).lastOption
    val base = ckpt.fold(Seq.empty[Commit]) { cv =>
      readCheckpoint(spark, root, table, cv)
    }
    val tail = upTo.filter(v => ckpt.forall(v > _))
      .map(v => readCommit(spark, root, table, v))
    val commits = base ++ tail
    val lastOverwrite = commits.lastIndexWhere(_.action == "overwrite")
    if (lastOverwrite < 0) commits else commits.drop(lastOverwrite)
  }

  /** Row-level changes between two versions — the Delta "change data
    * feed" / `table_changes(from, to)` read. Returns the to-version's
    * rows that the from-version lacked as `change_type = 'insert'` and
    * the removed rows as `'delete'` (multiset semantics: a row present
    * twice then once yields one delete).
    *
    * Scale path: when every commit in (from, to] is a plain APPEND,
    * the answer is just the parquet in those commits' own data dirs —
    * read ~delta bytes, no diff computation at all (the common case:
    * a feature table growing by daily appends). Anything else
    * (overwrite / merge / delete rewrites) falls back to a full
    * `exceptAll` diff of the two snapshots — two scans + one shuffle,
    * the honest cost of diffing rewritten files without row ids.
    */
  def tableChanges(
      spark: SparkSession,
      root: String,
      table: String,
      fromVersion: Int,
      toVersion: Int
  ): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromVersion <= toVersion, s"need from <= to, got $fromVersion > $toVersion")
    val vs = versions(spark, root, table)
    require(
      Seq(fromVersion, toVersion).forall(vs.contains),
      s"versions ($fromVersion, $toVersion) must exist in $table (have: $vs)")
    val between = vs
      .filter(v => v > fromVersion && v <= toVersion)
      .map(v => readCommit(spark, root, table, v))
    if (between.isEmpty)
      return read(spark, root, table, Some(toVersion)).limit(0)
        .withColumn("change_type", lit("insert"))
    if (between.forall(_.action == "append")) {
      val dirs = between.flatMap(_.dataDirs)
      spark.read.option("mergeSchema", "true").parquet(dirs: _*)
        .withColumn("change_type", lit("insert"))
    } else {
      import org.apache.spark.sql.functions.col
      val from = read(spark, root, table, Some(fromVersion))
      val to = read(spark, root, table, Some(toVersion))
      // Align the from-snapshot to the to-schema: a schema-evolved
      // column absent at fromVersion reads as NULL there (the same
      // thing a mergeSchema read of the old files yields).
      val fromAligned = from.select(to.schema.fields.toSeq.map { f =>
        (if (from.columns.contains(f.name)) col(f.name)
         else lit(null).cast(f.dataType)).as(f.name)
      }: _*)
      to.exceptAll(fromAligned)
        .withColumn("change_type", lit("insert"))
        .unionByName(
          fromAligned.exceptAll(to).withColumn("change_type", lit("delete")))
    }
  }

  /** Write a log checkpoint at the current tip: one file holding the
    * commits that survive replay AT that version (everything since the
    * last overwrite), so later readers resolve snapshots from it plus
    * the tail — Delta's _last_checkpoint design. Readers that predate
    * the checkpoint are unaffected (per-version commit files are never
    * rewritten); pins BEFORE the checkpoint still replay the raw log.
    * Returns the checkpointed version (the current tip), or None for an
    * empty table.
    */
  def checkpoint(spark: SparkSession, root: String, table: String): Option[Int] = {
    val vs = versions(spark, root, table)
    vs.lastOption.map { tip =>
      // surviving commits at the tip, resolved through any prior ckpt
      val commits = snapshotCommits(spark, root, table, Some(tip))
      val body = commits.map(commitJson).mkString("[", ",", "]")
      val p = checkpointPath(root, table, tip)
      val f = fs(spark, p)
      f.mkdirs(p.getParent)
      val out = f.create(p, true) // deterministic content: overwrite ok
      try out.write(body.getBytes("UTF-8"))
      finally out.close()
      tip
    }
  }

  /** Checkpointed versions, ascending. */
  def checkpointVersions(spark: SparkSession, root: String, table: String): Seq[Int] = {
    val dir = logDir(root, table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.matches("v\\d{8}\\.checkpoint\\.json") =>
          n.substring(1, 9).toInt }
        .sorted
  }

  private def checkpointPath(root: String, table: String, version: Int): Path =
    new Path(logDir(root, table), f"v$version%08d.checkpoint.json")

  private def readCheckpoint(
      spark: SparkSession, root: String, table: String, v: Int): Seq[Commit] = {
    val p = checkpointPath(root, table, v)
    val in = fs(spark, p).open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // split the top-level array into per-commit objects on version keys
    "\\{\"version\":(\\d+),".r.findAllMatchIn(body).map(_.start).toSeq match {
      case Seq() => Seq.empty
      case starts =>
        val bounds = starts :+ (body.length - 1)
        bounds.sliding(2).map { case Seq(s, e) =>
          val obj = body.substring(s, e).stripSuffix(",")
          val ver = "\"version\":(\\d+)".r.findFirstMatchIn(obj).get.group(1).toInt
          parseCommit(ver, obj)
        }.toSeq
    }
  }

  /** A commit's canonical JSON — shared by the log writer and the
    * checkpoint writer so replay-from-checkpoint parses identically.
    */
  private def commitJson(c: Commit): String = {
    val batchField = c.batchId.fold("")(b => s""","batchId":$b""")
    val clusterField =
      if (c.clusters.isEmpty) ""
      else {
        val blocks = c.clusters.map { cs =>
          val files = cs.files
            .map(st => s"""{"f":"${st.path}","lo":${st.lo},"hi":${st.hi}}""")
            .mkString(",")
          s"""{"col":"${cs.column}","files":[$files]}"""
        }
        s""","clusters":[${blocks.mkString(",")}]"""
      }
    val dirsField = c.dataDirs.map(d => s""""$d"""").mkString("[", ",", "]")
    s"""{"version":${c.version},"action":"${c.action}","dataDirs":$dirsField$batchField$clusterField}"""
  }

  /** Read a snapshot as a DataFrame (latest, or pinned to a version).
    * `mergeSchema` is on so a schema-evolved snapshot (see
    * `evolveSchema` on [[commit]]) surfaces the union schema, with
    * nulls for columns a pre-evolution file lacks.
    */
  def read(
      spark: SparkSession,
      root: String,
      table: String,
      versionAsOf: Option[Int] = None
  ): DataFrame = {
    val dirs = snapshotCommits(spark, root, table, versionAsOf).flatMap(_.dataDirs)
    require(dirs.nonEmpty, s"table $table has no committed data")
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** Append-time schema contract: an append must carry every column of
    * the current snapshot with matching types. With `evolveSchema` it
    * may ADD new columns (readers see nulls for old files via
    * mergeSchema); dropping or retyping columns is always rejected —
    * silent drift is how a feature store poisons its training sets.
    */
  private def checkAppendSchema(
      spark: SparkSession,
      root: String,
      table: String,
      incoming: org.apache.spark.sql.types.StructType,
      evolveSchema: Boolean
  ): Unit = {
    if (versions(spark, root, table).isEmpty) return
    val current = read(spark, root, table).schema
    val in = incoming.fields.map(f => f.name -> f.dataType).toMap
    val missing = current.fields.filterNot(f => in.get(f.name).contains(f.dataType))
    require(
      missing.isEmpty,
      s"append to $table drops or retypes columns: " +
        missing.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ") +
        " (schema contract; overwrite to change the schema)")
    if (!evolveSchema) {
      val cur = current.fields.map(f => f.name -> f.dataType).toMap
      val added = incoming.fields.filterNot(f => cur.get(f.name).contains(f.dataType))
      require(
        added.isEmpty,
        s"append to $table adds columns ${added.map(_.name).mkString(", ")}; " +
          "pass evolveSchema=true to allow additive evolution")
    }
  }

  /** Commit `df` as the next version. `mode` is "append" or
    * "overwrite". Returns the committed version number. Data files are
    * fully written BEFORE the log entry is created, so a reader can
    * never observe a half-written snapshot, and a crashed writer leaves
    * only an unreferenced data directory (harmless garbage — see
    * [[vacuum]]).
    */
  def commit(
      df: DataFrame,
      root: String,
      table: String,
      mode: String,
      evolveSchema: Boolean = false
  ): Int = {
    if (mode == "append")
      checkAppendSchema(df.sparkSession, root, table, df.schema, evolveSchema)
    commitInternal(root, table, mode, None, dataDir => {
      df.write.mode("overwrite").parquet(dataDir)
      Nil
    })
  }

  /** Commit with RANGE CLUSTERING + per-file zone maps — the lakehouse
    * data-skipping feature (Delta OPTIMIZE ZORDER / Iceberg sort
    * orders; graft already has the multi-column Morton layout in
    * q_zorder_layout — this is the single-column range variant wired
    * into the table format). The data is range-partitioned and sorted
    * on `clusterCol` into `numFiles` files, each owning a disjoint
    * value range; one post-write scan records [min,max] per file into
    * the commit, and [[readPruned]] skips files whose range misses the
    * predicate. At 100 TB this is the difference between scanning the
    * corpus and scanning the one-in-a-thousand files a point query
    * touches.
    */
  def commitClustered(
      df: DataFrame,
      root: String,
      table: String,
      mode: String,
      clusterCol: String,
      numFiles: Int
  ): Int = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    if (mode == "append")
      checkAppendSchema(df.sparkSession, root, table, df.schema, evolveSchema = false)
    commitInternal(root, table, mode, None, dataDir => {
      df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(clusterCol))
        .sortWithinPartitions(clusterCol)
        .write.mode("overwrite").parquet(dataDir)
      zoneMaps(df.sparkSession, dataDir, Seq(clusterCol))
    })
  }

  /** Z-ORDER clustered commit — multi-dimensional data skipping (Delta
    * OPTIMIZE ZORDER BY; the single-table analog of graft's
    * q_zorder_layout Morton study). The 16 low bits of each cluster
    * column (bigint-cast) are interleaved into one Morton code; files
    * are range-partitioned on that code, so file locality follows ALL
    * dimensions at once and zone maps stay tight on every column —
    * point/range predicates on any clustered dimension prune files,
    * not just the first sort key (the failure mode of lexicographic
    * sorting). Zone maps for every cluster column are recorded in the
    * commit; [[readPruned]] with any subset of them skips files.
    */
  def commitZOrdered(
      df: DataFrame,
      root: String,
      table: String,
      mode: String,
      zCols: Seq[String],
      numFiles: Int
  ): Int = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(zCols.nonEmpty, "zCols must be non-empty")
    if (mode == "append")
      checkAppendSchema(df.sparkSession, root, table, df.schema, evolveSchema = false)
    // selective import: functions.mode would shadow the `mode` parameter
    import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}
    val n = zCols.size
    // bit i of column j lands at position i*n + j — the standard Morton
    // interleave, 16 bits per dimension
    val morton = (0 until 16).flatMap { i =>
      zCols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(col(c).cast("bigint"), i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
    commitInternal(root, table, mode, None, dataDir => {
      df.withColumn("_z", morton)
        .repartitionByRange(numFiles, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(dataDir)
      zoneMaps(df.sparkSession, dataDir, zCols)
    })
  }

  /** Per-file [min,max] of each stat column over a just-written data
    * dir: ONE aggregate scan, numFiles × |cols| doubles to the driver,
    * stored as commit metadata.
    */
  private def zoneMaps(
      spark: SparkSession,
      dataDir: String,
      cols: Seq[String]
  ): Seq[ClusterStats] = {
    import org.apache.spark.sql.functions._
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"_lo_$c"),
      max(col(c)).cast("double").as(s"_hi_$c")))
    val rows = spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    cols.map { c =>
      ClusterStats(
        c,
        rows.map(r => FileStat(
          r.getAs[String]("f"), r.getAs[Double](s"_lo_$c"), r.getAs[Double](s"_hi_$c"))).toSeq)
    }
  }

  /** Zone-map-pruned snapshot read: keep only the files whose [lo, hi]
    * range on `clusterCol` intersects [lo, hi] (files without stats —
    * unclustered commits — are always kept). The predicate itself is
    * ALSO applied, so pruning is purely an IO optimization and the
    * result equals `read(...).where(col between lo and hi)` exactly.
    */
  def readPruned(
      spark: SparkSession,
      root: String,
      table: String,
      clusterCol: String,
      lo: Double,
      hi: Double,
      versionAsOf: Option[Int] = None
  ): DataFrame =
    readPrunedMulti(spark, root, table, Seq((clusterCol, lo, hi)), versionAsOf)

  /** Multi-predicate zone-map read: a file survives only if EVERY
    * predicate's [lo, hi] intersects that file's recorded range for the
    * predicate column — the payoff of z-order clustering, where zone
    * maps are tight on all dimensions at once. Commits without stats
    * for some predicate column are kept whole for correctness; all
    * predicates are re-applied, so the result equals the unpruned
    * filtered read exactly.
    */
  def readPrunedMulti(
      spark: SparkSession,
      root: String,
      table: String,
      predicates: Seq[(String, Double, Double)],
      versionAsOf: Option[Int] = None
  ): DataFrame = {
    require(predicates.nonEmpty, "predicates must be non-empty")
    val commits = snapshotCommits(spark, root, table, versionAsOf)
    val paths = commits.flatMap { c =>
      val statCols = c.clusters.map(_.column).toSet
      val applicable = predicates.filter(p => statCols.contains(p._1))
      if (applicable.isEmpty) c.dataDirs
      else {
        val byCol = c.clusters.map(cs => cs.column -> cs.files).toMap
        // files surviving every applicable predicate's zone map
        applicable
          .map { case (cName, lo, hi) =>
            byCol(cName).collect { case f if f.hi >= lo && f.lo <= hi => f.path }.toSet
          }
          .reduce(_ intersect _).toSeq.sorted
      }
    }
    import org.apache.spark.sql.functions.col
    val pred = predicates
      .map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    if (paths.isEmpty) {
      // every file pruned: empty frame with the table's schema
      read(spark, root, table, versionAsOf).where(pred).limit(0)
    } else spark.read.parquet(paths: _*).where(pred)
  }

  /** What a [[merge]] did: the committed version plus how many files it
    * actually rewrote vs carried forward untouched.
    */
  case class MergeStats(version: Int, rewrittenFiles: Int, retainedFiles: Int)

  /** MERGE INTO (the Delta/Iceberg upsert statement, batch semantics —
    * reference registers its features into exactly these formats,
    * provider/scripts/spark/offline_store_spark_runner.py:193/213):
    * target rows whose `keyCol` matches a source row are replaced by
    * that source row — or deleted when the source row satisfies
    * `deleteWhen` — unmatched source rows (minus deletes) are inserted,
    * and unmatched target rows survive unchanged. Source keys must be
    * unique per key (multiple matches per target row is Delta's
    * MERGE cardinality violation and would make the rewrite ambiguous;
    * callers dedup first).
    *
    * Scale path: only files whose `keyCol` zone map can contain a
    * source key are read and rewritten; every other file of the
    * snapshot is RE-REFERENCED in the new commit byte-untouched, its
    * zone map carried forward — so merge cost follows the files the
    * delta touches, not table size. When the source has ≤ `maxPruneKeys`
    * distinct keys the overlap test is per-key (binary search of the
    * sorted key array against each file's [lo, hi]) — a point-delta
    * against a range-clustered 100 TB table rewrites a handful of
    * files; beyond the cap it falls back to the source's global key
    * range. Commits without `keyCol` stats are rewritten wholesale:
    * cluster on the merge key ([[commitClustered]]/[[commitZOrdered]])
    * to keep merges cheap.
    */
  def merge(
      spark: SparkSession,
      root: String,
      table: String,
      source: DataFrame,
      keyCol: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None,
      maxPruneKeys: Int = 100000
  ): MergeStats = {
    import org.apache.spark.sql.functions.col
    val commits = snapshotCommits(spark, root, table)
    require(commits.nonEmpty, s"table $table has no committed data")
    val snapSchema = read(spark, root, table).schema
    // the source must carry every snapshot column (update-all /
    // insert-all semantics); EXTRA source columns are fine — they feed
    // `deleteWhen` (e.g. a CDC op flag) and are dropped on write
    val in = source.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = snapSchema.fields.filterNot(f => in.get(f.name).contains(f.dataType))
    require(
      missing.isEmpty,
      s"merge source for $table is missing or retypes columns: " +
        missing.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))

    // distinct non-null source keys in the zone-map domain (double),
    // capped: ≤ cap ⇒ exact per-key pruning, > cap ⇒ global range only
    val keys = source.select(col(keyCol).cast("double"))
      .where(col(keyCol).isNotNull)
      .distinct().limit(maxPruneKeys + 1)
      .collect().map(_.getDouble(0)).sorted
    val exact = keys.length <= maxPruneKeys
    def overlaps(lo: Double, hi: Double): Boolean =
      if (keys.isEmpty) false
      else if (exact) {
        val i = java.util.Arrays.binarySearch(keys, lo)
        val idx = if (i >= 0) i else -i - 1
        idx < keys.length && keys(idx) <= hi
      } else keys.last >= lo && keys.head <= hi

    val touchedB = Seq.newBuilder[String]
    val retainedB = Seq.newBuilder[FileStat]
    commits.foreach { c =>
      c.clusters.find(_.column == keyCol) match {
        case Some(cs) =>
          cs.files.foreach { f =>
            if (f.lo.isNaN || f.hi.isNaN || overlaps(f.lo, f.hi)) touchedB += f.path
            else retainedB += f
          }
        case None => touchedB ++= c.dataDirs // no stats: must rewrite
      }
    }
    val touched = touchedB.result()
    val retained = retainedB.result()

    val target =
      if (touched.nonEmpty) spark.read.option("mergeSchema", "true").parquet(touched: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snapSchema)
    val upserts = deleteWhen.fold(source)(d => source.where(!d))
    val cols = snapSchema.fieldNames.toSeq.map(col)
    val rewrite = target
      .join(source.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .select(cols: _*)
      .unionByName(upserts.select(cols: _*))
    val numFiles = math.max(1, touched.size)
    val version = commitInternal(root, table, "overwrite", None, dataDir => {
      rewrite
        .repartitionByRange(numFiles, col(keyCol))
        .sortWithinPartitions(keyCol)
        .write.mode("overwrite").parquet(dataDir)
      val fresh = zoneMaps(spark, dataDir, Seq(keyCol))
      Seq(ClusterStats(keyCol, retained ++ fresh.head.files))
    }, extraDirs = retained.map(_.path))
    MergeStats(version, touched.size, retained.size)
  }

  /** DELETE WHERE — predicate deletion over the snapshot (the
    * GDPR/right-to-erasure path every lakehouse needs; Delta/Iceberg
    * DELETE). Rows matching `predicate` are removed; the rest survive
    * byte-identical. With a `prune` hint (column, lo, hi) — the
    * caller's assertion that every matching row has prune-col ∈
    * [lo, hi] — files whose zone map misses that range are
    * RE-REFERENCED untouched (zone maps carried forward) and only
    * overlapping files rewrite: a single-entity erasure against an
    * entity-clustered 100 TB table rewrites one file, not the corpus.
    * Without the hint every file is rewritten (still one commit, still
    * time-travel safe).
    */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      table: String,
      predicate: org.apache.spark.sql.Column,
      prune: Option[(String, Double, Double)] = None
  ): MergeStats = {
    import org.apache.spark.sql.functions.col
    val commits = snapshotCommits(spark, root, table)
    require(commits.nonEmpty, s"table $table has no committed data")
    val touchedB = Seq.newBuilder[String]
    val retainedB = Seq.newBuilder[FileStat]
    commits.foreach { c =>
      prune.flatMap { case (cName, _, _) => c.clusters.find(_.column == cName) } match {
        case Some(cs) =>
          val (_, lo, hi) = prune.get
          cs.files.foreach { f =>
            if (f.lo.isNaN || f.hi.isNaN || (f.hi >= lo && f.lo <= hi)) touchedB += f.path
            else retainedB += f
          }
        case None => touchedB ++= c.dataDirs
      }
    }
    val touched = touchedB.result()
    val retained = retainedB.result()
    require(touched.nonEmpty || retained.nonEmpty, s"table $table resolves to no files")
    val kept =
      if (touched.isEmpty) null
      else spark.read.option("mergeSchema", "true").parquet(touched: _*).where(!predicate)
    val version = commitInternal(root, table, "overwrite", None, dataDir => {
      val df =
        if (kept != null) kept
        else { // nothing overlapped: commit an empty rewrite dir
          val schema = read(spark, root, table).schema
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        }
      prune match {
        case Some((cName, _, _)) =>
          df.repartitionByRange(math.max(1, touched.size), col(cName))
            .sortWithinPartitions(cName)
            .write.mode("overwrite").parquet(dataDir)
          val fresh = zoneMaps(spark, dataDir, Seq(cName))
          Seq(ClusterStats(cName, retained ++ fresh.head.files))
        case None =>
          df.write.mode("overwrite").parquet(dataDir)
          Nil
      }
    }, extraDirs = retained.map(_.path))
    MergeStats(version, touched.size, retained.size)
  }

  /** Compact the current snapshot into ~`targetFileBytes` files — the
    * small-file problem is THE operational failure of streaming appends
    * at scale (a year of minutely commits = half a million tiny files;
    * every reader pays the open() tax). Rewrites the snapshot as one
    * overwrite commit of ceil(bytes/target) files; prior versions stay
    * time-travelable until [[vacuum]]-after-expiry policies say
    * otherwise (this vacuum only ever touches UNREFERENCED dirs).
    */
  def compact(
      spark: SparkSession,
      root: String,
      table: String,
      targetFileBytes: Long
  ): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    val dirs = snapshotCommits(spark, root, table).flatMap(_.dataDirs)
    val totalBytes = dirs.map { d =>
      val p = new Path(d)
      val f = fs(spark, p)
      if (f.exists(p))
        f.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getLen).sum
      else 0L
    }.sum
    val numFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    commit(read(spark, root, table).repartition(numFiles), root, table, "overwrite")
  }

  /** Compaction policy — the maintenance loop a streaming table needs
    * (minutely appends accrete commits forever; every reader pays the
    * per-commit open() tax). Compacts ONLY when the live snapshot
    * spans more than `maxSnapshotCommits` commits; otherwise a no-op —
    * safe to call after every append/micro-batch. Returns the compact
    * commit's version when it ran.
    */
  def autoCompact(
      spark: SparkSession,
      root: String,
      table: String,
      maxSnapshotCommits: Int,
      targetFileBytes: Long
  ): Option[Int] = {
    require(maxSnapshotCommits >= 1, "maxSnapshotCommits must be >= 1")
    val live = snapshotCommits(spark, root, table)
    if (live.size > maxSnapshotCommits)
      Some(compact(spark, root, table, targetFileBytes))
    else None
  }

  /** Delete data directories referenced by NO commit in the log — the
    * garbage of crashed or race-losing writers. Never touches a dir any
    * version references, so time travel is unaffected.
    */
  def vacuum(spark: SparkSession, root: String, table: String): Seq[String] = {
    val referenced = allCommits(spark, root, table)
      .flatMap(_.dataDirs)
      .map(d => new Path(d).toUri.getPath).toSet
    val dataRoot = new Path(s"$root/$table/data")
    val f = fs(spark, dataRoot)
    if (!f.exists(dataRoot)) return Seq.empty
    val removed = f.listStatus(dataRoot).toSeq
      .map(_.getPath)
      .filterNot(p => referenced.contains(p.toUri.getPath))
    removed.foreach(p => f.delete(p, true))
    removed.map(_.toString)
  }

  /** Idempotent micro-batch append — the foreachBatch body of a
    * streaming lakehouse sink. A batchId already present in the log is
    * a replayed batch (restart after a sink-side crash): skipped, so
    * stream restarts never double-append. Returns the committed
    * version, or None when the batch was a replay.
    */
  def appendBatch(df: DataFrame, root: String, table: String, batchId: Long): Option[Int] = {
    val spark = df.sparkSession
    val seen = allCommits(spark, root, table).exists(_.batchId.contains(batchId))
    if (!seen) checkAppendSchema(spark, root, table, df.schema, evolveSchema = false)
    if (seen) None
    else Some(commitInternal(root, table, "append", Some(batchId), dataDir => {
      df.write.mode("overwrite").parquet(dataDir)
      Nil
    }))
  }

  /** Structured-Streaming sink: append each micro-batch as one
    * idempotent commit. `stream.writeStream` options (trigger,
    * checkpointLocation) are the caller's; this supplies the
    * foreachBatch body.
    */
  def streamAppend(
      stream: DataFrame,
      root: String,
      table: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatch(batch, root, table, batchId): Unit
    }

  /** Self-maintaining streaming sink: [[streamAppend]]'s idempotent
    * per-batch commit plus [[autoCompact]] after each batch — the full
    * operational loop, so a long-running stream never accretes
    * unbounded commits or files. Replay detection is unaffected by
    * compaction: batchIds live in the immutable log history, which
    * compaction never rewrites.
    */
  def streamAppendMaintained(
      stream: DataFrame,
      root: String,
      table: String,
      maxSnapshotCommits: Int,
      targetFileBytes: Long
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (appendBatch(batch, root, table, batchId).nonEmpty)
        autoCompact(batch.sparkSession, root, table, maxSnapshotCommits, targetFileBytes): Unit
    }

  /** Shared commit protocol: write data (and optional zone maps), then
    * atomically claim the next version in the log; on a lost race,
    * delete the orphan data dir and retry at the new tip.
    *
    * The candidate data dir carries a per-writer NONCE
    * (`data/v<N>-<nonce>`): data is written BEFORE the version is
    * claimed, so two writers racing the same tip would otherwise write
    * the SAME `data/v<N>` path and clobber each other's in-flight
    * files (found by the 8-writer race spec). Readers never derive
    * paths by convention — every commit records its `dataDirs`
    * explicitly — so the nonce costs nothing; losers' orphan dirs are
    * deleted on retry and are invisible to readers/vacuumable anyway.
    */
  private def commitInternal(
      root: String,
      table: String,
      mode: String,
      batchId: Option[Long],
      writeData: String => Seq[ClusterStats],
      extraDirs: Seq[String] = Nil
  ): Int = {
    require(mode == "append" || mode == "overwrite", s"unsupported mode $mode")
    val spark = SparkSession.active
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    var attempt = versions(spark, root, table).lastOption.getOrElse(0) + 1
    while (true) {
      val dataDir = s"$root/$table/data/v$attempt-$nonce"
      val clusters = writeData(dataDir)
      val p = logPath(root, table, attempt)
      val f = fs(spark, p)
      f.mkdirs(p.getParent)
      val body = commitJson(Commit(attempt, mode, extraDirs :+ dataDir, batchId, clusters))
      if (atomicClaim(f, p, body.getBytes("UTF-8"))) return attempt
      // lost the race for this version: clean our orphan data dir
      // and retry against the new tip
      f.delete(new Path(dataDir), true)
      attempt = versions(spark, root, table).lastOption.getOrElse(0) + 1
    }
    -1 // unreachable
  }

  /** Atomic exclusive create of a commit file — the claim primitive of
    * the optimistic protocol. Hadoop's LocalFileSystem
    * `create(overwrite=false)` is CHECK-THEN-ACT (exists? then create)
    * — two local writers racing the same version can BOTH win and one
    * commit silently overwrites the other (caught by the 8-writer race
    * spec). For `file:` URIs the claim is therefore a POSIX hard link:
    * the body is fully written to a private temp file first, then
    * `Files.createLink` installs it at the commit path — atomic at the
    * syscall level, fails with FileAlreadyExistsException for every
    * racer but one, and the linked content is COMPLETE the instant the
    * name appears (no partially-written commit is ever visible).
    * Non-local stores keep the FileSystem-native conditional create,
    * which IS atomic on HDFS and CAS-backed object stores — the same
    * per-store split Delta's LogStore interface documents.
    */
  private def atomicClaim(f: FileSystem, p: Path, body: Array[Byte]): Boolean =
    if (f.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      val tmp = local.resolveSibling(s".claim-${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        java.nio.file.Files.write(tmp, body)
        java.nio.file.Files.createLink(local, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      try {
        val out = f.create(p, false)
        try out.write(body)
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }

  /** Write-Audit-Publish — Iceberg's WAP governance flow, composed
    * from graft's own primitives:
    *
    *  1. WRITE the candidate batch to a staging table
    *     (`<table>__staged`) — production-format files, invisible to
    *     every reader of the main table;
    *  2. AUDIT the staged snapshot with the declarative data contract
    *     ([[graft.operators.FeatureStore.dataContract]] — all checks
    *     in ONE scan);
    *  3. PUBLISH only if every check passes: a ZERO-COPY commit on the
    *     main table referencing the staged files (shallow-clone
    *     mechanics, honoring append/overwrite and the append schema
    *     contract — no bytes move at any table size). On failure the
    *     main table is untouched and the staged snapshot stays for
    *     debugging.
    *
    * Staged-file lifetime (the [[shallowClone]] caveat, inherited by
    * construction): published main-table commits reference files that
    * live under `<table>__staged/data`, and `vacuum` only deletes
    * dirs referenced by NO commit in a table's own log — so (a) any
    * log-expiry/cleanup on the STAGING table would corrupt the main
    * table (don't vacuum staging while published versions reference
    * it), and (b) superseded staged dirs from failed audits stay on
    * disk until the staging log itself is truncated: each overwrite
    * re-stage appends a commit, it never rewrites staging history, so
    * staging vacuum alone cannot reclaim them.
    *
    * Returns (published version if the audit passed, the per-check
    * report). The only driver-side read is the #checks-row report.
    */
  def writeAuditPublish(
      df: DataFrame,
      root: String,
      table: String,
      mode: String,
      checks: Seq[graft.operators.FeatureStore.ContractCheck]
  ): (Option[Int], DataFrame) = {
    import org.apache.spark.sql.functions.{col, min, when}
    val spark = df.sparkSession
    val staging = s"${table}__staged"
    val stagedV = commit(df, root, staging, "overwrite")
    val report = graft.operators.FeatureStore
      .dataContract(read(spark, root, staging, Some(stagedV)), checks)
      .pinned()
    val allPass = report
      .agg(min(when(col("pass"), 1).otherwise(0)).as("p"))
      .collect()(0).getInt(0) == 1
    if (!allPass) (None, report)
    else {
      if (mode == "append")
        checkAppendSchema(spark, root, table, df.schema, evolveSchema = false)
      val src = snapshotCommits(spark, root, staging, Some(stagedV))
      val dirs = src.flatMap(_.dataDirs)
      val stats = src.flatMap(_.clusters)
      val v = commitInternal(
        root, table, mode, None,
        dataDir => {
          fs(spark, new Path(dataDir)).mkdirs(new Path(dataDir))
          stats
        },
        extraDirs = dirs)
      (Some(v), report)
    }
  }

  /** Zero-copy SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE`,
    * Iceberg snapshot-ref): materialize `targetTable` as one overwrite
    * commit whose data references are the SOURCE snapshot's files — no
    * bytes move, however large the table. The clone then evolves
    * independently: appends/merges/deletes on either side never touch
    * the other's log. Zone maps ride along (FileStat paths stay
    * valid), so pruned reads work on the clone immediately.
    *
    * The standard shallow-clone caveat applies: the clone borrows the
    * source's files, so `vacuum` on the SOURCE (which only consults
    * the source's own log) can strand a clone whose snapshot the
    * source has since overwritten — retain source versions as long as
    * clones of them live, exactly as Delta documents.
    */
  def shallowClone(
      spark: SparkSession,
      root: String,
      sourceTable: String,
      targetTable: String,
      versionAsOf: Option[Int] = None
  ): Int = {
    val src = snapshotCommits(spark, root, sourceTable, versionAsOf)
    val dirs = src.flatMap(_.dataDirs)
    require(dirs.nonEmpty, s"clone source $sourceTable has no committed data")
    val stats = src.flatMap(_.clusters)
    commitInternal(
      root, targetTable, "overwrite", None,
      dataDir => {
        // the version's own data dir stays empty (created so readers
        // can list it); every byte lives in the source's files
        fs(spark, new Path(dataDir)).mkdirs(new Path(dataDir))
        stats
      },
      extraDirs = dirs)
  }

  /** Register a lakehouse snapshot as a SQL-visible temp view —
    * Tables.registerPrimary for this format.
    */
  def register(
      spark: SparkSession,
      root: String,
      table: String,
      viewName: String,
      versionAsOf: Option[Int] = None
  ): DataFrame = {
    val df = read(spark, root, table, versionAsOf)
    df.createOrReplaceTempView(viewName)
    df
  }

  /** Tiny single-object JSON parse (format is self-written; no JSON lib
    * on the dependency list). Extracts version/action/dataDirs plus the
    * optional batchId and cluster zone maps.
    */
  private def parseCommit(version: Int, body: String): Commit = {
    val action = "\"action\":\"(\\w+)\"".r
      .findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalStateException(s"bad commit $version: $body"))
    val dirs = "\"dataDirs\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalStateException(s"bad commit $version: $body"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(s => s.stripPrefix("\"").stripSuffix("\""))
    val batchId = "\"batchId\":(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong)
    val clusters = "\\{\"col\":\"([^\"]+)\",\"files\":\\[([^\\]]*)\\]\\}".r
      .findAllMatchIn(body)
      .map { m =>
        val files = "\\{\"f\":\"([^\"]+)\",\"lo\":([^,]+),\"hi\":([^}]+)\\}".r
          .findAllMatchIn(m.group(2))
          .map(fm => FileStat(fm.group(1), fm.group(2).toDouble, fm.group(3).toDouble))
          .toSeq
        ClusterStats(m.group(1), files)
      }
      .toSeq
    Commit(version, action, dirs, batchId, clusters)
  }
}
