package graft

/** Dev tool: time individual SparkEntry queries in isolation.
  *
  *   runMain graft.Profile <sfDir> <reps> <name> [<name> ...]
  *
  * Prints per-rep wall times so plan cost separates from JIT/GC noise
  * (the full Bench interleaves 79 queries in one JVM, which makes
  * per-query numbers hard to attribute).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_PROFILE_CLEARCACHE=1 reproduces Bench's cold-data reps
    // (each rep re-materializes internal persists, as Bench does).
    val clear = sys.env.get("GRAFT_PROFILE_CLEARCACHE").contains("1")
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        if (clear) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val s = times.map { case (dt, _) => f"$dt%.2f" }.mkString(" ")
      println(f"[profile] $name rows=${times.head._2} secs: $s")
    }
    spark.stop()
  }
}
