package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.{Lakehouse, Tables}

/** End-to-end composition: the operators are not just individually
  * correct — they CHAIN into the real training-data flow a corpus
  * pipeline runs (filter → dedup → chunk → clustered lakehouse write →
  * pruned read), all as one Catalyst-visible lineage per stage.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft_pipeline").toString

  test("corpus pipeline: quality gate -> exact dedup -> chunk -> lakehouse, counts conserve") {
    val docs = Tables.load(spark, GraftTestSession.Sf0001, "documents")
    val total = docs.count()
    assert(total > 0)

    // 1. quality gate: keep docs above a minimal quality score
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text")
    val kept = docs.join(
      scored.where(col("quality") > 0.3).select("doc_id"), "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. exact dedup: keep each text's canonical (min doc_id) copy
    val canon = Dedup.exact(kept, "doc_id", "text")
    val survivors = kept.join(
      canon.select(col("keep_id").as("doc_id")), "doc_id")
    val nSurvivors = survivors.count()
    assert(nSurvivors > 0 && nSurvivors <= nKept)
    // dedup keeps exactly one doc per distinct text
    assert(nSurvivors == kept.select("text").distinct().count())

    // 3. chunk into training windows (120 tokens, stride 100)
    val chunks = TextAnalysis.chunkTokens(survivors, "doc_id", "text", 120, 100)
      .withColumnRenamed("chunk", "chunk_text")
    val nChunks = chunks.count()
    assert(nChunks >= nSurvivors, "every surviving doc yields at least one chunk")

    // 4. clustered lakehouse write + zone-map pruned read-back
    Lakehouse.commitClustered(
      chunks.select(col("doc_id"), col("chunk_idx"), col("chunk_text")),
      root, "corpus", "overwrite", "doc_id", numFiles = 4)
    val table = Lakehouse.read(spark, root, "corpus")
    assert(table.count() == nChunks, "lakehouse round-trip conserves chunks")
    // a doc_id range predicate prunes files AND returns the exact subset
    val ids = survivors.select("doc_id").as[Long].collect().sorted
    val (lo, hi) = (ids.head.toDouble, ids(ids.length / 4).toDouble)
    val pruned = Lakehouse.readPruned(spark, root, "corpus", "doc_id", lo, hi)
    assert(pruned.inputFiles.length < table.inputFiles.length)
    assert(pruned.count() ==
      table.where(col("doc_id") >= lo && col("doc_id") <= hi).count())
  }

  test("pretraining pipeline: temperature mixture -> seq-pack manifest -> packs cover the stream") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, GraftTestSession.Sf0001, "documents")
    // 1. rebalance the corpus across sources (α=0.5, budget 120)
    val picked = Sampling.temperatureSample(docs, "source", "doc_id", 120L, seed = 5L)
    val nPicked = picked.count()
    assert(nPicked > 0 && nPicked <= 120)
    // small sources must be over-represented vs their raw share
    val raw = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = picked.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (minSrc, maxSrc) = (raw.minBy(_._2)._1, raw.maxBy(_._2)._1)
    if (raw(minSrc) < raw(maxSrc)) // sqrt scaling compresses the ratio
      assert(sel(minSrc).toDouble / sel(maxSrc) >=
        raw(minSrc).toDouble / raw(maxSrc))
    // 2. pack the selected docs into 512-token training sequences
    val selected = docs.join(picked.select("doc_id"), "doc_id")
    val manifest = TextAnalysis.seqPack(selected, "doc_id", "text", capacity = 512L)
      .collect()
    // the manifest is a gapless cover of the concatenated stream
    val totalTokens = manifest.map(_.getAs[Long]("n_tokens")).sum
    val byOffset = manifest.sortBy(_.getAs[Long]("stream_offset"))
    assert(byOffset.head.getAs[Long]("stream_offset") == 0L)
    byOffset.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("stream_offset") + a.getAs[Long]("n_tokens")
          == b.getAs[Long]("stream_offset"))
      case _ =>
    }
    val lastPack = byOffset.last.getAs[Long]("pack_last")
    assert(lastPack == (totalTokens - 1) / 512)
  }
}
