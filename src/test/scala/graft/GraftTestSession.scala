package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork=true gives the
  * whole test run a single JVM; never stopped so suites can share it).
  */
object GraftTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(cores = 4, shufflePartitions = 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val Sf0001 = "/root/testdata/sf0.001"
}
