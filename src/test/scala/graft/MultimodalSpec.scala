package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {

  test("audioFramePlan: exact frame schedule; sub-window clips plan zero frames") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    // decoded-stats input (media_id, n_samples, duration_ms, sample_rate):
    // 800 samples -> (800-400) div 160 + 1 = 3 frames; 300 < 400 -> 0;
    // sample_rate = 0 rows (non-audio in a mixed frame) are excluded.
    val stats = Seq(
      (1L, 800L, 50L, 16000L),
      (2L, 300L, 18L, 16000L),
      (3L, 0L, 0L, 0L))
      .toDF("media_id", "n_samples", "duration_ms", "sample_rate")
    val out = graft.operators.Multimodal
      .audioFramePlan(stats, winSamples = 400, hopSamples = 160)
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("duration_ms"), r.getAs[Long]("n_frames"))))
      .toMap
    assert(out == Map(1L -> ((800L, 50L, 3L)), 2L -> ((300L, 18L, 0L))))
  }
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("binary decode plumbing is deterministic and schema-stable") {
    val docs = Seq((1L, "some payload", "en", "s", 12L), (2L, "other bytes", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val meta = Multimodal.decodeMeta(Multimodal.mediaFromDocs(docs), FakeCodec)
    val rows = meta.collect().map(m => m.media_id -> m).toMap
    assert(rows(1L).n_bytes == 12)
    assert(rows(1L).mime == "image/jpeg") // doc_id 1 % 3 == 1
    assert(rows(2L).mime == "image/webp")
    // determinism: same input -> same decoded dims + checksum
    val again = Multimodal.decodeMeta(Multimodal.mediaFromDocs(docs), FakeCodec)
      .collect().map(m => m.media_id -> m).toMap
    assert(rows(1L) == again(1L) && rows(2L) == again(2L))
    assert(rows(1L).width >= 64 && rows(1L).height >= 64)
  }

  test("FakeCodec test double: md5 slices pinned to externally computed values") {
    // Pins from an independent md5("some payload") computation: the
    // double must stay reproducible (plumbing specs rely on it).
    val d = FakeCodec.decode("some payload".getBytes("UTF-8"), "image/png")
    assert(d.checksum == 361300346020269704L)
    assert(d.width == 1008L && d.height == 381L && d.nFrames == 1L)
    val v = FakeCodec.decode("some payload".getBytes("UTF-8"), "video/mp4")
    assert(v.nFrames >= 1L && v.nFrames <= 300L)
  }

  test("MediaCodec SPI: a custom codec drops in with per-partition init/close") {
    // The stub is one implementation of the trait, not a special case:
    // a different MediaCodec flows through the same decodeMeta plumbing,
    // and its lifecycle hooks run once per partition (counted via
    // accumulators — executor threads share this JVM in local mode).
    val sc = spark.sparkContext
    val inits = sc.longAccumulator("codec_inits")
    val closes = sc.longAccumulator("codec_closes")
    val fixed = new Multimodal.MediaCodec {
      override def init(): Unit = inits.add(1)
      override def decode(bytes: Array[Byte], mime: String): Multimodal.Decoded =
        Multimodal.Decoded(bytes.length.toLong, 2L, 3L, 4L)
      override def close(): Unit = closes.add(1)
    }
    val docs = Seq((1L, "some payload", "en", "s", 12L), (2L, "other bytes", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocs(docs).repartition(2)
    val meta = Multimodal.decodeMeta(media, fixed)
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).width == 12L && meta(1L).height == 2L)
    assert(meta(2L).width == 11L && meta(2L).n_frames == 3L && meta(2L).checksum == 4L)
    assert(inits.value == 2L, s"expected one init per partition, got ${inits.value}")
    assert(closes.value == inits.value, "every init must be paired with a close")
  }

  test("mixed-modality ingest: real decode gives videos container frame counts") {
    // doc ids 0..3 cover all four modalities of MediaGen.mediaFor
    // (png, bmp, gif video, wav); frame counts come from the REAL
    // container parse (GIF: 2 + id%59 frames; images 1; audio 0).
    val docs = Seq(0L, 1L, 2L, 3L)
      .map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val meta = Multimodal.decodeMeta(graft.operators.MediaGen.mediaFor(docs))
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(0L).mime == "image/png" && meta(0L).n_frames == 1L)
    assert(meta(1L).mime == "image/bmp" && meta(1L).n_frames == 1L)
    assert(meta(2L).mime == "video/gif" && meta(2L).n_frames == 4L) // 2 + 2%59
    assert(meta(3L).mime == "audio/wav" && meta(3L).n_frames == 0L)
    // image dims come from the real header, not a formula re-derivation
    assert(meta(0L).width == 8L && meta(0L).height == 8L)
    assert(meta(1L).width == 9L && meta(1L).height == 8L)
  }

  test("frame sampling emits stride-spaced frame indices") {
    val meta = Seq(Multimodal.MediaMeta(7L, 10, "video/mp4", 100, 100, 10, 0L)).toDS()
    val frames = Multimodal.sampleFrames(meta, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSet == Set((7L, 0L), (7L, 3L), (7L, 6L), (7L, 9L)))
  }

  test("resizePlan fits into the bounding box preserving aspect ratio, no-ops small images") {
    val meta = Seq(
      Multimodal.MediaMeta(1L, 0, "image/png", 1000, 500, 1, 0L), // landscape downscale
      Multimodal.MediaMeta(2L, 0, "image/png", 300, 900, 1, 0L),  // portrait downscale
      Multimodal.MediaMeta(3L, 0, "image/png", 200, 100, 1, 0L),  // already fits
      Multimodal.MediaMeta(4L, 0, "image/png", 5000, 1, 1, 0L)    // extreme ratio floors to 1
    ).toDS()
    val out = Multimodal.resizePlan(meta, maxDim = 256)
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Boolean]("needs_resize"), r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))))
      .toMap
    assert(out(1L) == ((true, 256L, 128L)))
    assert(out(2L) == ((true, 85L, 256L)))
    assert(out(3L) == ((false, 200L, 100L)))
    assert(out(4L) == ((true, 256L, 1L)))
  }

  test("shardPack: concatenate-then-cut layout, per-source shard reset") {
    val docs = Seq(
      (1L, "a", 3000L), (2L, "a", 2000L), (3L, "a", 2000L),
      (10L, "b", 5000L), (11L, "b", 100L)
    ).toDF("doc_id", "source", "n_chars")
    val out = graft.operators.Multimodal
      .shardPack(docs, "doc_id", "source", "n_chars", shardBytes = 4096L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard_id"), r.getAs[Long]("offset_bytes"), r.getAs[Long]("n_bytes"))))
      .toMap
    assert(out(1L) == ((0L, 0L, 3000L)))    // starts shard 0
    assert(out(2L) == ((0L, 3000L, 2000L))) // straddles into shard 1, stays in 0
    assert(out(3L) == ((1L, 904L, 2000L)))  // first byte at 5000 -> shard 1
    assert(out(10L) == ((0L, 0L, 5000L)))   // source b resets
    assert(out(11L) == ((1L, 904L, 100L)))  // starts at 5000 in b's stream
  }

  test("binaryDedup: byte-identical payloads collapse to the earliest copy") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, "aaa"), (5L, "aaa"), (3L, "aaa"), // three copies, keep id 1
      (2L, "bbb"), // unique
      (4L, "AAA") // case differs: different bytes, NOT a dup of "aaa"
    ).toDF("media_id", "payload")
      .select(col("media_id"), encode(col("payload"), "UTF-8").as("content"))
    val out = Multimodal.binaryDedup(media)
      .collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 4L -> 1L))
  }

  test("clipPairCuration: per-gate verdicts; a missing embedding fails the sim gate only") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "en", 100L), // aligned pair, all gates pass
      (1L, "fr", 100L), // anti-aligned pair + wrong lang
      (2L, "en", 5000L), // caption too long
      (3L, "en", 100L)  // text vec (id 4) missing -> keep_sim = 0
    ).toDF("doc_id", "lang", "n_chars")
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)),   // cos(0,1) > 0
      (2L, Array(-1.0f, 0.0f)),                            // cos(1,2) < 0
      (3L, Array(0.0f, 1.0f))                              // cos(2,3) = 0 -> >= 0 passes
    ).toDF("vec_id", "embedding")
    val out = Multimodal
      .clipPairCuration(docs, vecs, 1L, 0.0, 10L, 1000L, Seq("en"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("keep_sim"), r.getAs[Int]("keep_len"),
          r.getAs[Int]("keep_lang"), r.getAs[Int]("keep"))))
      .toMap
    assert(out(0L) == ((1, 1, 1, 1)))
    assert(out(1L) == ((0, 1, 0, 0)))
    assert(out(2L) == ((1, 0, 1, 0)))
    assert(out(3L) == ((0, 1, 1, 0))) // missing embedding: attributable, not dropped
  }

  test("sceneCuts: real GIF decode end-to-end vs a naive recomputation; stills skipped") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import graft.operators.MediaGen
    // real pipeline: generate animated GIFs, decode frame means through
    // javax.imageio, detect cuts — plus one still image (1 frame, must
    // emit nothing)
    val docs = Seq(10L, 11L, 57L)
      .map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val stats = Multimodal.decodeStats(MediaGen.videosFor(docs))
    val still = Multimodal.decodeStats(MediaGen.imagesFor(
      Seq((3L, "img", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")))
    val out = Multimodal.sceneCuts(stats.unionByName(still), threshold = 64.0)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) ->
        r.getAs[Double]("delta"))
      .toMap
    // naive reference straight from the generator's frame-level formula
    val expected = (for {
      id <- Seq(10L, 11L, 57L)
      f <- 1 until MediaGen.videoFrames(id)
      d = (MediaGen.frameLevel(id, f) - MediaGen.frameLevel(id, f - 1)).toDouble
      if math.abs(d) >= 64.0
    } yield (id, f.toLong) -> d).toMap
    assert(expected.nonEmpty) // the fixture genuinely exercises cuts
    assert(out == expected)
    assert(!out.keySet.exists(_._1 == 3L))
  }
}
