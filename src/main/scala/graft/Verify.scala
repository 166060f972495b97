package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query names] — the filter
    // is a builder-side iteration aid; the driver always runs all.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Per-process warehouse: bucketed-table queries DROP/recreate
      // their tables, so two concurrent JVMs (e.g. Verify + the test
      // suite) sharing one dir race each other's catalogs.
      .config(
        "spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") +
          s"/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Data-dependent oracles (e.g. OPQ's learned-rotation literals)
    // derive from this run's corpus.
    SparkEntry.oracleDataDir = Some(sfDir)
    new java.io.File(outDir).mkdirs()
    // The single-file dump is driver-compare tidiness; the checker
    // globs part files, so builder-side scale-up sweeps (sf100 per-doc
    // outputs would otherwise funnel a whole scan through ONE task via
    // the narrow coalesce) can disable it.
    val coalesce1 = sys.env.getOrElse("SPARK_GRAFT_VERIFY_COALESCE", "1") == "1"
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val res = fn(spark, sfDir)
          (if (coalesce1) res.coalesce(1) else res)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
