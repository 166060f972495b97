package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain(formatted)` for named queries to files —
  * the per-query plan artifacts of an optimization round
  * (plans/r<N>/<query>_{before,after}.txt).
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <name> [<name> ...]
  *
  * Writes <outDir>/<name>_<suffix>.txt for each query. Uses the same
  * session shape as Bench (local[32], shufflePartitions=32) so the
  * captured plans match what the bench executes (Explain.scala's
  * PLANS.md audit runs at 8 cores; plan shape is identical but this
  * keeps partition counts in the text consistent with the bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: PlanDump <sfDir> <outDir> <suffix> <query> [<query>...]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
