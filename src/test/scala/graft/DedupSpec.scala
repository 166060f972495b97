package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the green hill near the old stone bridge"
  private lazy val docs = Seq(
    (1L, base, "en"),
    (2L, base, "en"),                                   // exact dup of 1
    (3L, base.replace("lazy", "sleepy"), "en"),         // near-dup of 1
    (4L, "completely different words entirely unrelated content about spark engines and parquet files", "en"),
    (5L, base, "fr")                                    // same text, other block
  ).toDF("doc_id", "text", "lang")

  test("exact dedup groups identical content and keeps the smallest id") {
    val groups = Dedup.exact(docs, "doc_id", "text").collect()
    val dupGroup = groups.filter(_.getAs[Long]("n_copies") >= 2)
    assert(dupGroup.length == 1 && dupGroup.head.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH surfaces exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("identical docs have simhash hamming distance 0") {
    val out = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(out((1L, 2L)) == 0L)
  }

  test("jaccard word pairs respects blocks and computes exact values") {
    val out = Dedup.jaccardWordPairs(docs, "doc_id", "text", "lang", 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(out((1L, 2L)) == 1.0)      // identical
    assert(out.contains((1L, 3L)))    // near-dup passes 0.5
    assert(!out.keys.exists(p => p._1 == 5L || p._2 == 5L)) // fr block alone
  }

  test("connectedComponents labels every node with its component minimum") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val out = Dedup.connectedComponents(edges, nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("embedding near-dups finds only the high-cosine pair within a block") {
    val space = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.999f, 0.01f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),
      (4L, Array(1.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDups(space, "vec_id", "embedding", "label", 0.99)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
