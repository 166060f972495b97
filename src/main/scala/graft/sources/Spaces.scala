package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Space lifecycle — the reference's CreateSpace / FreezeSpace /
  * DeleteSpace surface (reference:
  * embeddinghub/embeddingstore/embedding_store.proto:10-12;
  * embedding_store.cc CreateSpace/Freeze keep a mutable rocksdb space
  * and flip it immutable). The Spark-native shape: a space is a
  * directory of immutable versioned parquet snapshots — `freeze`
  * appends snapshot vN+1, readers pin a version (or take the latest),
  * and nothing is ever rewritten in place. Uses the Hadoop FileSystem
  * API throughout, so the same code runs against HDFS / S3 / local.
  */
object Spaces {

  private def spaceDir(root: String, name: String) = new Path(s"$root/$name")

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionDir = "^v(\\d+)$".r

  /** Versions present in a space, ascending. Only complete snapshots
    * count: the entry must match ^v\d+$ AND contain the _SUCCESS marker
    * Spark writes on commit — a crashed/partial freeze or a stray temp
    * dir is neither listed nor allowed to poison the `.toInt` parse.
    * Single-writer assumption: freeze's list-then-write scheme is not
    * safe for concurrent freezers of the same space (standard for
    * snapshot dirs without a transactional commit protocol).
    */
  def versions(spark: SparkSession, root: String, name: String): Seq[Int] = {
    val dir = spaceDir(root, name)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .filter(_.isDirectory)
        .flatMap(st => st.getPath.getName match {
          case VersionDir(n) if f.exists(new Path(st.getPath, "_SUCCESS")) => Some(n.toInt)
          case _ => None
        })
        .sorted
  }

  /** Freeze: write an immutable snapshot of `df` as the next version of
    * the space; returns the new version number. The write is the only
    * mutation a space ever sees — existing versions are never touched,
    * which is exactly the reference's freeze-then-serve contract.
    */
  def freeze(df: DataFrame, root: String, name: String): Int = {
    val spark = df.sparkSession
    val next = versions(spark, root, name).lastOption.getOrElse(0) + 1
    df.write.mode("errorifexists").parquet(s"$root/$name/v$next")
    next
  }

  /** Load a pinned version (or the latest when `version` is None). */
  def load(
      spark: SparkSession,
      root: String,
      name: String,
      version: Option[Int] = None
  ): DataFrame = {
    val vs = versions(spark, root, name)
    require(vs.nonEmpty, s"space $name has no frozen versions")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"space $name has no version $v (have $vs)")
    spark.read.parquet(s"$root/$name/v$v")
  }

  /** Snapshot diff between two space versions: per key, whether it was
    * `added`, `removed`, `changed` (any compare column differs —
    * including exact float-array equality for vectors) or `same` —
    * the audit primitive for "what did this refresh actually do"
    * between two frozen snapshots.
    *
    * Scale: ONE full-outer shuffle join on the key; compare columns
    * travel as a struct so equality is a single comparator, no
    * per-column join conditions. Run it between consecutive versions
    * to gate a freeze (e.g. refuse to serve a snapshot that removed
    * more than x% of keys).
    */
  def diff(
      v1: DataFrame,
      v2: DataFrame,
      keyCol: String,
      compareCols: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = v1.select(col(keyCol), struct(compareCols.map(col): _*).as("va"))
    val b = v2.select(col(keyCol), struct(compareCols.map(col): _*).as("vb"))
    a.join(b, Seq(keyCol), "full_outer")
      .select(
        col(keyCol),
        when(col("va").isNull, "added")
          .when(col("vb").isNull, "removed")
          .when(col("va") === col("vb"), "same")
          .otherwise("changed").as("status"))
  }

  /** Delete the whole space (all versions). */
  def delete(spark: SparkSession, root: String, name: String): Unit = {
    val dir = spaceDir(root, name)
    val f = fs(spark, dir)
    if (f.exists(dir)) { f.delete(dir, true); () }
  }
}
