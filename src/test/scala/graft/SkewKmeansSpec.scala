package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Skew}

class SkewKmeansSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join result") {
    val big = (1L to 1000L).map(i => (if (i % 10 == 0) 1L else i, i))
      .toDF("k", "payload") // key 1 is hot
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", 8, col("payload"))
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("kmeans codebook separates well-separated clusters") {
    // two tight clusters around (1,0) and (0,1); seeds 0,1 are one from each
    val pts = Seq(
      (0L, Array(1.0f, 0.05f)), (1L, Array(0.04f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.95f, 0.0f)),
      (4L, Array(0.0f, 0.9f)), (5L, Array(0.1f, 0.95f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCodebook(pts, "vec_id", "embedding", k = 2, iterations = 3)
    val assign = Similarity.nearestCentroid(pts, "vec_id", "embedding", cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("assigned")).toMap
    assert(assign(0L) == assign(2L) && assign(2L) == assign(3L))
    assert(assign(1L) == assign(4L) && assign(4L) == assign(5L))
    assert(assign(0L) != assign(1L))
  }

  test("skewProfile: hot key surfaces with exact share and skew-vs-uniform factor") {
    import org.apache.spark.sql.functions._
    // key 7 appears 6 times, keys 1..4 once each: total 10, nKeys 5
    val df = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L, 4L)).toDF("k")
    val out = graft.operators.Skew.skewProfile(df, "k", topK = 2).collect()
      .map(r => r.getAs[Long]("key") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("share_micro"), r.getAs[Long]("skew_micro"))))
    // top-1 is the hot key: share 6/10, skew 6*5/10 = 3.0x uniform
    assert(out.head == (7L -> ((6L, 600000L, 3000000L))))
    // tie between keys 1..4 broken by smaller key
    assert(out(1) == (1L -> ((1L, 100000L, 500000L))))
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true in final plan)") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // graft sessions ship with adaptive.skewJoin enabled; the default
    // 256MB skew threshold is sized for clusters, so shrink it to make
    // the runtime split observable on a test-sized shuffle.
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carries ~95% of the rows with a fat payload; the
      // rest spread across 40 cold keys
      val big = spark.range(40000).select(
        when(col("id") % 20 =!= 0, 0L).otherwise(pmod(col("id"), lit(40L)))
          .as("k"),
        concat(lit("x" * 64), col("id").cast("string")).as("payload"))
      val dim = spark.range(40).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = big.join(dim, Seq("k"))
      // drive the frame's OWN QueryExecution (count() would plan a
      // separate aggregate query and leave this one unexecuted)
      assert(joined.collect().length == 40000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"no skew split in:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
