package graft

import org.apache.spark.sql.SparkSession

/** One independent lakehouse writer PROCESS for the cross-JVM commit
  * race (CrossJvmRaceSpec forks several of these against one table).
  *
  * Why a dedicated main: the 8-writer race spec exercises
  * [[graft.sources.Lakehouse]]'s optimistic-concurrency loop from eight
  * threads of ONE JVM, where JVM-level memory effects (a shared
  * FileSystem object, intra-process file-handle serialization) could in
  * principle mask a broken claim protocol. The hard-link atomic claim
  * (Lakehouse.atomicClaim) exists precisely because Hadoop's
  * LocalFileSystem `create(overwrite=false)` is check-then-act rather
  * than atomic — and the strongest form of that race is between
  * PROCESSES that share nothing but the filesystem. Each RaceWriter is
  * its own SparkSession in its own JVM; the only coordination surface
  * is the commit log directory itself.
  *
  * Args: root table writerId nAppends. Appends `nAppends` single-row
  * commits (retry-on-claim-loss is internal to Lakehouse.commit) and
  * prints `RACE_OK writer=<id> versions=v,v,...` for the spec to parse.
  */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, table, writerId, nAppends) = args.take(4)
    val spark = GraftSession.builder(Some("local[4]"), shufflePartitions = 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val id = writerId.toInt
    val versions = (1 to nAppends.toInt).map { i =>
      graft.sources.Lakehouse.commit(
        Seq((id * 1000L + i, s"w${id}_$i")).toDF("k", "v"),
        root, table, "append")
    }
    println(s"RACE_OK writer=$id versions=${versions.mkString(",")}")
    spark.stop()
  }
}
