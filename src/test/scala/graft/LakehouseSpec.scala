package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Lakehouse

class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft_lake").toString

  test("append/overwrite commits replay to the right snapshots, with time travel") {
    val t = "t1"
    val v1 = Lakehouse.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root, t, "overwrite")
    val v2 = Lakehouse.commit(Seq((3L, "c")).toDF("k", "v"), root, t, "append")
    val v3 = Lakehouse.commit(Seq((9L, "z")).toDF("k", "v"), root, t, "overwrite")
    val v4 = Lakehouse.commit(Seq((10L, "y")).toDF("k", "v"), root, t, "append")
    assert(Seq(v1, v2, v3, v4) == Seq(1, 2, 3, 4))
    assert(Lakehouse.versions(spark, root, t) == Seq(1, 2, 3, 4))

    def keys(versionAsOf: Option[Int]): Set[Long] =
      Lakehouse.read(spark, root, t, versionAsOf).select("k").as[Long].collect().toSet

    assert(keys(Some(1)) == Set(1L, 2L))
    assert(keys(Some(2)) == Set(1L, 2L, 3L)) // append extends
    assert(keys(Some(3)) == Set(9L)) // overwrite replaces everything before it
    assert(keys(Some(4)) == Set(9L, 10L))
    assert(keys(None) == Set(9L, 10L)) // latest
    // pinned snapshots are immutable: committing more never changes v2
    Lakehouse.commit(Seq((99L, "q")).toDF("k", "v"), root, t, "append")
    assert(keys(Some(2)) == Set(1L, 2L, 3L))
  }

  test("missing version and empty table are rejected") {
    assert(intercept[IllegalArgumentException] {
      Lakehouse.read(spark, root, "t_missing")
    }.getMessage.contains("no committed data"))
    Lakehouse.commit(Seq((1L, "a")).toDF("k", "v"), root, "t2", "overwrite")
    assert(intercept[IllegalArgumentException] {
      Lakehouse.read(spark, root, "t2", Some(7))
    }.getMessage.contains("does not exist"))
  }

  test("a racing writer cannot steal a committed version (optimistic concurrency)") {
    val t = "t3"
    Lakehouse.commit(Seq((1L, "a")).toDF("k", "v"), root, t, "overwrite")
    // simulate a lost race: another writer has already committed v2
    // while we thought the tip was v1
    val stolen = new org.apache.hadoop.fs.Path(s"$root/$t/_log/v00000002.json")
    val fs = stolen.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(stolen, false)
    out.write(
      s"""{"version":2,"action":"append","dataDirs":[]}""".getBytes("UTF-8"))
    out.close()
    // our commit must NOT overwrite v2 — it lands as v3
    val v = Lakehouse.commit(Seq((5L, "e")).toDF("k", "v"), root, t, "append")
    assert(v == 3)
    assert(Lakehouse.versions(spark, root, t) == Seq(1, 2, 3))
    assert(Lakehouse.read(spark, root, t).select("k").as[Long].collect().toSet
      == Set(1L, 5L))
  }

  test("register exposes a snapshot as a SQL view") {
    val t = "t4"
    Lakehouse.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root, t, "overwrite")
    Lakehouse.register(spark, root, t, "t4_view")
    assert(spark.sql("SELECT count(*) FROM t4_view").head().getLong(0) == 2L)
  }

  test("unreferenced data dirs (crashed writer garbage) are invisible to readers") {
    val t = "t5"
    Lakehouse.commit(Seq((1L, "a")).toDF("k", "v"), root, t, "overwrite")
    // a writer that wrote data but died before its log commit
    Seq((666L, "junk")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/$t/data/v99")
    assert(Lakehouse.read(spark, root, t).select("k").as[Long].collect().toSet == Set(1L))
  }
}
