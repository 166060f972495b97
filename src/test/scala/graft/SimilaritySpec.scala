package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private lazy val tiny = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(0.1f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("native codegen cosine == HOF cosine on real embeddings") {
    graft.plans.GraftFunctions.register(spark)
    val emb = Tables.load(spark, GraftTestSession.Sf0001, "embeddings").limit(50)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .where(col("a") < col("b")).limit(500)
    val diff = pairs
      .select(abs(
        VectorFunctions.cosine(col("va"), col("vb")) -
          VectorFunctions.cosineHof(col("va"), col("vb"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(diff == 0.0)
  }

  test("knnBruteForce finds the geometric nearest neighbor") {
    val out = Similarity
      .knnBruteForce(tiny, tiny.where(col("vec_id") === 0), "vec_id", "embedding", 1)
      .collect().head
    assert(out.getAs[Long]("neighbor_id") == 1L)
  }

  test("nearestCentroid assigns to own cluster for separated clusters") {
    val cents = Similarity.centroids(tiny, "label", "embedding")
    val out = Similarity.nearestCentroid(tiny, "vec_id", "embedding", cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("assigned")).toMap
    assert(out == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("knnIvf with all cells probed matches brute force") {
    val emb = Tables.load(spark, GraftTestSession.Sf0001, "embeddings")
    val q = emb.where(col("vec_id") < 3)
    val brute = Similarity.knnBruteForce(emb, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.knnIvf(emb, q, "vec_id", "embedding", "label", k = 3, nProbe = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("kmeans-IVF with all cells probed matches brute force") {
    val emb = Tables.load(spark, GraftTestSession.Sf0001, "embeddings")
    val q = emb.where(col("vec_id") < 3)
    val brute = Similarity.knnBruteForce(emb, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity
      .knnIvfKmeans(emb, q, "vec_id", "embedding", k = 3, nProbe = 8, nCells = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("multiGet returns exactly the requested keys") {
    val keys = Similarity.multiGet(tiny, "vec_id", Seq(1L, 3L))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(keys == Set(1L, 3L))
  }
}
