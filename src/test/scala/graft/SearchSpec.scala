package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  // d1: "rare" twice in a short doc; d2: one hit in a long doc;
  // d3: only common terms; d4: no query terms at all.
  private lazy val corpus = Seq(
    (1L, "rare rare common"),
    (2L, "rare common common common common common common common"),
    (3L, "common common common"),
    (4L, "other words entirely")
  ).toDF("doc_id", "text")

  private lazy val q = Seq((1L, "rare"), (1L, "common")).toDF("query_id", "term")

  test("bm25 ranks repeated rare terms in short docs first; no-hit docs absent") {
    val out = Search.bm25TopK(corpus, "doc_id", "text", q, k = 10)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p(0) > p(1)), "scores strictly ordered here")
    assert(scores.forall(_ > 0.0), "ln(1+x) idf keeps scores positive")
  }

  test("bm25 score matches the closed form on a hand-checked cell") {
    // Doc 3 matches only "common" (tf=3, dl=3). N=4, sum_dl=17,
    // df(common)=3. Reproduce Search's exact expression shape.
    val n = 4.0; val sumDl = 17.0; val df = 3.0; val tf = 3.0; val dl = 3.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val norm = dl * 4L / sumDl
    val raw = idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * norm))
    val expected = BigDecimal(raw).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = Search.bm25TopK(corpus, "doc_id", "text", q, k = 10)
      .where(col("doc_id") === 3).select(col("score")).head().getDouble(0)
    assert(math.abs(got - expected.toDouble) < 1e-12)
  }

  test("bm25 rank ties break on doc_id and selfExclude drops the query doc") {
    val twins = Seq((7L, "x y"), (5L, "x y"), (9L, "x y")).toDF("doc_id", "text")
    val tq = Seq((5L, "x")).toDF("query_id", "term")
    val all = Search.bm25TopK(twins, "doc_id", "text", tq, k = 10)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(all == Seq(5L, 7L, 9L), "equal scores must order by doc_id")
    val excl = Search.bm25TopK(twins, "doc_id", "text", tq, k = 10, selfExclude = true)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(excl == Seq(7L, 9L))
  }

  test("rrfScale is the exact lcm and divides every rank denominator") {
    assert(Search.rrfScale(2, 3) == 60L) // lcm(3,4,5)
    val s = Search.rrfScale(60, 10)
    (61 to 70).foreach(d => assert(s % d == 0L, s"$s % $d"))
    assert(s < (1L << 53), "scale must stay exactly representable as a double")
  }

  test("rrfFuse: both-list docs beat single-list docs; points are exact integers") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(a, b, c = 60, maxRank = 10, k = 10)
      .orderBy(col("rank")).collect()
    val scale = Search.rrfScale(60, 10)
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rrf_score")).toMap
    assert(byDoc(10L) == scale / 61 + scale / 62)
    assert(byDoc(11L) == scale / 62)
    assert(byDoc(12L) == scale / 61)
    assert(out.head.getAs[Long]("doc_id") == 10L, "two mid ranks outrank one top rank here")
  }

  test("rrfFuseAll: three lists sum contributions; reduces to rrfFuse for two") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 2L), (1L, 12L, 1L)).toDF("query_id", "doc_id", "rank")
    val c3 = Seq((1L, 10L, 3L), (1L, 11L, 1L)).toDF("query_id", "doc_id", "rank")
    val scale = Search.rrfScale(60, 10)
    val out = Search.rrfFuseAll(Seq(a, b, c3), c = 60, maxRank = 10, k = 10)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rrf_score"))
      .toMap
    assert(out(10L) == scale / 61 + scale / 62 + scale / 63)
    assert(out(11L) == scale / 62 + scale / 61)
    assert(out(12L) == scale / 61)
    val two = Search.rrfFuse(a, b, c = 60, maxRank = 10, k = 10).collect()
    val twoAll = Search.rrfFuseAll(Seq(a, b), c = 60, maxRank = 10, k = 10).collect()
    assert(two.map(_.toString).sorted.sameElements(twoAll.map(_.toString).sorted))
  }

  test("evalRanking: exact RR, recall@k capped by truth size, zero-hit queries kept") {
    val ranked = Seq(
      // q1: relevant at ranks 2 and 5
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L), (1L, 14L, 5L),
      // q2: nothing relevant in the list
      (2L, 20L, 1L), (2L, 21L, 2L)
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 11L), (1L, 14L), (1L, 99L), (2L, 77L))
      .toDF("query_id", "doc_id")
    val out = Search.evalRanking(ranked, truth, k = 5)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_rel_at_k") == 2L)
    assert(q1.getAs[Long]("first_rel_rank") == 2L)
    assert(q1.getAs[Long]("rr_scaled") == Search.rrfScale(0, 5) / 2) // lcm(1..5)=60 -> 30
    assert(q1.getAs[Long]("n_rel_total") == 3L)
    assert(q1.getAs[Double]("recall_at_k") == 2.0 / 3.0)
    assert(q1.getAs[Double]("precision_at_k") == 2.0 / 5.0)
    val q2 = out(2L)
    assert(q2.getAs[Long]("n_rel_at_k") == 0L)
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.getAs[Long]("rr_scaled") == 0L)
    assert(q2.getAs[Double]("recall_at_k") == 0.0)
  }

  test("tfidfTopTerms surfaces distinctive terms over ubiquitous ones") {
    // "common" appears in every doc (idf = ln(1) = 0); each doc's rare
    // term must outrank it, repeated rare terms score highest.
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma")
    ).toDF("doc_id", "text")
    val out = Search.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[String]("term"), r.getAs[Double]("tfidf"))))
      .toMap
    assert(out((1L, 1L))._1 == "alpha")
    assert(math.abs(out((1L, 1L))._2 - 2.0 * math.log(3.0)) < 1e-9)
    assert(out((2L, 1L))._1 == "beta" && out((3L, 1L))._1 == "gamma")
    assert(out((1L, 2L)) == (("common", 0.0)), "idf of an everywhere-term is 0")
  }

  test("mmrRerank demotes the near-duplicate of an already-selected result") {
    // Query direction (1,0,0,0). Doc 10 and its twin 11 both align
    // with it; doc 12 is orthogonal-ish with lower relevance. Pure
    // relevance order is 10, 11, 12 — MMR must pick the diverse 12
    // before the twin 11.
    val cands = Seq(
      (1L, 10L, 1.0, Seq(1.0f, 0.0f, 0.001f, 0.0f)),
      (1L, 11L, 0.999, Seq(1.0f, 0.0f, 0.0f, 0.001f)),
      (1L, 12L, 0.4, Seq(0.1f, 1.0f, 0.0f, 0.0f))
    ).toDF("query_id", "doc_id", "rel", "vec")
    val out = Search.mmrRerank(cands, k = 3, lambda = 0.5)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(out == Seq(10L, 12L, 11L), s"got $out")
  }

  test("mmrRerank with lambda=1 reduces to pure relevance ranking") {
    val cands = Seq(
      (1L, 20L, 0.9, Seq(1.0f, 0.0f)),
      (1L, 21L, 0.8, Seq(1.0f, 0.01f)),
      (1L, 22L, 0.7, Seq(0.0f, 1.0f))
    ).toDF("query_id", "doc_id", "rel", "vec")
    val out = Search.mmrRerank(cands, k = 3, lambda = 1.0)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(out == Seq(20L, 21L, 22L))
  }

  test("rrfFuse equal scores break ties by doc_id") {
    val a = Seq((1L, 20L, 1L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 8L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(a, b, c = 60, maxRank = 10, k = 10)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(out == Seq(8L, 20L))
  }
}
