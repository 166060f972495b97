package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("count-min never underestimates and is exact without collisions") {
    val items = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("tok")
    val sketch = Sketches.cmsBuild(items, col("tok"), depth = 4, width = 1024)
    val probes = Seq("a", "b", "c", "never").toDF("item")
    val est = Sketches.cmsQuery(sketch, probes, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_count")).toMap
    // upward-only bias; with 3 items in 4x1024 cells collisions are
    // absent, so estimates are exact and the unseen probe reads 0
    assert(est("a") == 7L && est("b") == 3L && est("c") == 1L)
    assert(est("never") == 0L)
  }

  test("count-min sketches merge by cell-wise addition") {
    val a = Seq.fill(5)("x").toDF("tok")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("y")).toDF("tok")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsBuild(df, col("tok"), depth = 4, width = 256)
    val merged = cells(a).unionByName(cells(b))
      .groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getAs[Int]("row"), r.getAs[Long]("col")) -> r.getAs[Long]("cnt"))
      .toMap
    val whole = cells(a.unionByName(b))
      .collect().map(r => (r.getAs[Int]("row"), r.getAs[Long]("col")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(merged == whole)
  }

  test("bloom has zero false negatives; absent keys need all k positions set") {
    val keys = (1 to 200).map(i => s"key_$i").toDF("tok")
    val filter = Sketches.bloomBuild(keys, col("tok"), k = 4, bits = 4096)
    val probes = ((1 to 200).map(i => s"key_$i") ++ Seq("nope_1", "nope_2")).toDF("item")
    val out = Sketches.bloomProbe(filter, probes, k = 4, bits = 4096)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_set"), r.getAs[Boolean]("maybe_member"))))
      .toMap
    (1 to 200).foreach { i =>
      assert(out(s"key_$i") == ((4L, true)), s"false negative for key_$i")
    }
    // absent probes: any unset lane position falsifies membership;
    // with 200*4 of 4096 bits set, both nopes passing all 4 lanes is
    // astronomically unlikely but not impossible — require n_set < 4
    // for at least one (the deterministic hashes make this stable)
    assert(Seq("nope_1", "nope_2").exists(n => !out(n)._2))
  }
}
