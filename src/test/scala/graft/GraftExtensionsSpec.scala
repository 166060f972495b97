package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions resolves the native functions in SQL") {
    // The spark.sql.extensions STATIC conf is only read when the
    // SparkContext is created, and tests share one context — so drive
    // the same GraftExtensions.apply through the public withExtensions
    // builder hook (the config path differs only in loading the class
    // by name, which needs just the zero-arg constructor this class
    // has). Clear the default session first: getOrCreate would
    // otherwise return it and skip injection.
    val shared = GraftTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = s2.sql(
        """SELECT
          |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |  graft_l2sq(array(0.0D, 3.0D), array(4.0D, 3.0D)) AS d,
          |  graft_adc(array(array(1.0D, 2.0D)), array(1)) AS a,
          |  graft_simhash64(array('hello', 'world')) IS NOT NULL AS s
          |""".stripMargin).collect().head
      assert(row.getDouble(0) == 1.0)
      assert(row.getDouble(1) == 16.0)
      assert(row.getDouble(2) == 2.0)
      assert(row.getBoolean(3))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
