package graft.sources

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
  *   <root>/<table>/data/v<version>/part-*.parquet   (immutable files)
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

  /** One replayed commit. */
  case class Commit(version: Int, action: String, dataDirs: Seq[String])

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

  /** Replay the log up to `versionAsOf` (inclusive; latest when None)
    * and return the commits that survive: everything since the last
    * overwrite at-or-before the pin.
    */
  def snapshotCommits(
      spark: SparkSession,
      root: String,
      table: String,
      versionAsOf: Option[Int] = None
  ): Seq[Commit] = {
    val vs = versions(spark, root, table)
    val upTo = versionAsOf.fold(vs)(p => vs.filter(_ <= p))
    require(
      versionAsOf.forall(p => vs.contains(p)),
      s"version ${versionAsOf.getOrElse(-1)} of $table does not exist (have: $vs)")
    val commits = upTo.map { v =>
      val p = logPath(root, table, v)
      val in = fs(spark, p).open(p)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      parseCommit(v, body)
    }
    val lastOverwrite = commits.lastIndexWhere(_.action == "overwrite")
    if (lastOverwrite < 0) commits else commits.drop(lastOverwrite)
  }

  /** Read a snapshot as a DataFrame (latest, or pinned to a version). */
  def read(
      spark: SparkSession,
      root: String,
      table: String,
      versionAsOf: Option[Int] = None
  ): DataFrame = {
    val dirs = snapshotCommits(spark, root, table, versionAsOf).flatMap(_.dataDirs)
    require(dirs.nonEmpty, s"table $table has no committed data")
    spark.read.parquet(dirs: _*)
  }

  /** Commit `df` as the next version. `mode` is "append" or
    * "overwrite". Returns the committed version number. Data files are
    * fully written BEFORE the log entry is created, so a reader can
    * never observe a half-written snapshot, and a crashed writer leaves
    * only an unreferenced data directory (harmless garbage, vacuumable).
    */
  def commit(df: DataFrame, root: String, table: String, mode: String): Int = {
    require(mode == "append" || mode == "overwrite", s"unsupported mode $mode")
    val spark = df.sparkSession
    var attempt = versions(spark, root, table).lastOption.getOrElse(0) + 1
    while (true) {
      val dataDir = s"$root/$table/data/v$attempt"
      df.write.mode("overwrite").parquet(dataDir)
      val p = logPath(root, table, attempt)
      val f = fs(spark, p)
      f.mkdirs(p.getParent)
      val body =
        s"""{"version":$attempt,"action":"$mode","dataDirs":["$dataDir"]}"""
      try {
        // overwrite=false create is the atomic claim of this version
        val out = f.create(p, false)
        try out.write(body.getBytes("UTF-8"))
        finally out.close()
        return attempt
      } catch {
        case _: java.io.IOException =>
          // lost the race for this version: clean our orphan data dir
          // and retry against the new tip
          f.delete(new Path(dataDir), true)
          attempt = versions(spark, root, table).lastOption.getOrElse(0) + 1
      }
    }
    -1 // unreachable
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
    * on the dependency list). Extracts version/action/dataDirs.
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
    Commit(version, action, dirs)
  }
}
