package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) carried as
  * opaque `binary` columns + typed metadata, decoded/transformed in
  * batch per partition.
  *
  * The Spark-side plumbing — schema, partition-parallel batched
  * processing, stable output shape — is real. The codec itself is a
  * deterministic STUB (`FakeCodec`): this container has no image/audio
  * libraries, and in production the stub body is the only thing that
  * changes (swap in javacpp-ffmpeg / ImageIO / a JNI decoder). The
  * batch shape mirrors Arrow-batched UDF execution: `mapPartitions`
  * processes rows in partition-sized batches with one codec init per
  * partition, which is the JVM analog of pandas_udf/mapInPandas in the
  * reference's python runners (provider/scripts/spark/
  * offline_store_spark_runner.py uses batched pandas transforms).
  */
object Multimodal {

  /** One media row in: id + raw bytes + declared mime. */
  final case class MediaRow(media_id: Long, content: Array[Byte], mime: String)

  /** Extracted (fake-)decoded metadata out. */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      mime: String,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** Decoded media header: what any codec must extract per payload. */
  final case class Decoded(width: Long, height: Long, nFrames: Long, checksum: Long)

  /** Codec SPI — the compiler-checked decode contract. The engine's
    * plumbing (schema, partition-parallel batching in [[decodeMeta]],
    * downstream resize/frame-sample planning) is written against THIS
    * trait, so swapping the sandbox stub for a real decoder
    * (javacpp-ffmpeg, ImageIO, a JNI wrapper) is implementing three
    * methods — no engine code changes. Implementations must be
    * Serializable (the instance ships to executors) and deterministic
    * for a given (bytes, mime): task retries re-decode, and a
    * nondeterministic decode silently corrupts results under Spark's
    * recovery contract (see ChaosCheck).
    */
  trait MediaCodec extends Serializable {
    /** Once per partition before any decode — allocate native contexts
      * (decoder handles, frame buffers) here, not per row.
      */
    def init(): Unit = ()

    /** Extract the header/metadata for one payload. */
    def decode(bytes: Array[Byte], mime: String): Decoded

    /** Once per partition after the last decode — free native state. */
    def close(): Unit = ()
  }

  /** Deterministic fake codec: "decodes" dimensions from the md5 of the
    * byte content. Stands in for a real image/audio decoder;
    * deterministic AND engine-portable (md5 hex-slice arithmetic is
    * reproducible in plain SQL) so both ScalaTest specs and the external
    * DuckDB oracle can assert exact values. One MessageDigest per call —
    * in production [[MediaCodec.init]] is where a real decoder allocates
    * once per partition.
    */
  object FakeCodec extends MediaCodec {
    override def decode(bytes: Array[Byte], mime: String): Decoded = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
      val w = 64 + java.lang.Long.parseLong(hex.substring(16, 24), 16) % 1024
      val h = 64 + java.lang.Long.parseLong(hex.substring(24, 32), 16) % 1024
      val frames =
        if (mime.startsWith("video")) 1 + java.lang.Long.parseLong(hex.substring(8, 16), 16) % 300
        else 1L
      val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      Decoded(w, h, frames, checksum)
    }
  }

  /** Build a media table from the documents corpus: text bytes stand in
    * for media payloads (binary column + mime metadata).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      concat(
        lit("image/"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp")).as("mime"))

  /** Mixed-modality variant: every third doc carries a video payload, so
    * the frame-extraction path (n_frames > 1, stride sampling) is
    * exercised end-to-end.
    */
  def mediaFromDocsMixed(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, "video/mp4")
        .when(col("doc_id") % 3 === 1, "image/jpeg")
        .otherwise("image/webp").as("mime"))

  /** Exact-bytes media dedup — the honest no-codec FIRST pass of any
    * multimodal pipeline (the same crawl image appears under thousands
    * of URLs byte-identical; dedupe before ever paying a decode).
    * One digest groupBy: content md5, earliest copy kept, copy count
    * reported. Map-side combined; the binary payload never shuffles —
    * only (digest, id) pairs do.
    */
  def binaryDedup(media: DataFrame): DataFrame =
    media
      .select(md5(col("content")).as("digest"), col("media_id"))
      .groupBy(col("digest"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Partition-parallel batched decode through the [[MediaCodec]] SPI:
    * one codec init/close per partition, rows processed in a streaming
    * iterator (never materializes a partition in memory).
    */
  def decodeMeta(media: DataFrame, codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      codec.init()
      // close() is bound to task completion, not iterator exhaustion: a
      // failed task, a cancelled stage, or a downstream operator that
      // stops early (limit) never drains hasNext, and native decoder
      // state allocated in init() would leak. The completion listener
      // fires on success, failure, and cancellation alike; the `open`
      // flag keeps the eager exhaustion path (normal case) from
      // double-closing.
      val closer = new java.util.concurrent.atomic.AtomicBoolean(true)
      def closeOnce(): Unit = if (closer.getAndSet(false)) codec.close()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      new Iterator[MediaMeta] {
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h) closeOnce()
          h
        }
        def next(): MediaMeta = {
          val r = rows.next()
          val d = codec.decode(r.content, r.mime)
          MediaMeta(
            r.media_id, r.content.length.toLong, r.mime,
            d.width, d.height, d.nFrames, d.checksum)
        }
      }
    }
  }

  /** Resize planning for image payloads: compute the output dimensions
    * that fit each image into a `maxDim` bounding box preserving aspect
    * ratio (the standard vision-model preprocessing step). This is the
    * deterministic half of a resize: the pixel transform itself lives
    * in the codec (stubbed here, see [[FakeCodec]]); the plan — which
    * rows need work and their exact target shapes — is plain integer
    * arithmetic, runs at scan speed, and is what a scheduler uses to
    * skip no-op rows and size the decode batches.
    *
    * All arithmetic stays in exact-in-double range (dims are bounded),
    * so floor(w * maxDim / longest-side) is engine-portable.
    */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    meta.toDF()
      .withColumn("longest", greatest(col("width"), col("height")))
      .select(
        col("media_id"), col("mime"), col("width"), col("height"),
        (col("longest") > maxDim).as("needs_resize"),
        when(col("longest") <= maxDim, col("width"))
          .otherwise(greatest(floor(col("width") * maxDim / col("longest")), lit(1)))
          .cast("long").as("out_w"),
        when(col("longest") <= maxDim, col("height"))
          .otherwise(greatest(floor(col("height") * maxDim / col("longest")), lit(1)))
          .cast("long").as("out_h"))
  }

  /** Audio framing plan — the deterministic half of audio
    * preprocessing (the spectrogram/encoder windowing schedule): given
    * payload size as a sample count, compute clip duration and how
    * many fixed-width hop-strided analysis frames the decoder will
    * emit. Like [[resizePlan]], the sample math is exact integer
    * arithmetic at scan speed; the waveform decode itself stays behind
    * the codec boundary. Clips shorter than one window plan zero
    * frames (callers pad or drop).
    */
  def audioFramePlan(
      media: DataFrame,
      samplesPerByte: Int,
      sampleRate: Int,
      winSamples: Int,
      hopSamples: Int
  ): DataFrame = {
    require(sampleRate > 0 && winSamples > 0 && hopSamples > 0, "positive framing params")
    media
      .select(
        col("media_id"),
        (length(col("content")).cast("long") * samplesPerByte).as("n_samples"))
      .select(
        col("media_id"),
        col("n_samples"),
        expr(s"n_samples * 1000 div $sampleRate").as("duration_ms"),
        when(
          col("n_samples") >= winSamples,
          expr(s"(n_samples - $winSamples) div $hopSamples") + 1L)
          .otherwise(0L).as("n_frames"))
  }

  /** WebDataset-style shard-packing plan: assign each sample to a
    * byte-budgeted shard within its source, with its byte offset in
    * the concatenated stream — the deterministic half of packing a
    * corpus into fixed-size tar/record shards for sequential training
    * IO (the actual byte copy is the writer's job; this plan is what
    * makes it parallelizable: every worker knows exactly which rows
    * land in its shard and where). Samples are laid out in (source,
    * id) order; a sample starts in the shard where its first byte
    * falls (shards may overhang by one sample — the standard
    * concatenate-then-cut layout, never a split sample lost).
    *
    * All-integer math on one source-partitioned cumulative-sum window
    * — a single shuffle on `source`, no global ordering anywhere.
    * Returns (id, source, shard_id, offset_bytes, n_bytes).
    */
  def shardPack(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      bytesCol: String,
      shardBytes: Long
  ): DataFrame = {
    require(shardBytes > 0, "shardBytes must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col(sourceCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(idCol), col(sourceCol), col(bytesCol).cast("long").as("n_bytes"))
      .withColumn("_start", sum(col("n_bytes")).over(w) - col("n_bytes"))
      .select(
        col(idCol), col(sourceCol),
        expr(s"_start div ${shardBytes}L").as("shard_id"),
        (col("_start") % shardBytes).as("offset_bytes"),
        col("n_bytes"))
  }

  /** Frame sampling plumbing for video-like payloads: emits one row per
    * sampled frame index (every `stride`-th frame). Output is lazily
    * flat-mapped — a 100TB video corpus streams through without
    * buffering.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta
      .flatMap(m => (0L until m.n_frames by stride.toLong).map(i => (m.media_id, i)))
      .toDF("media_id", "frame_idx")
  }

  /** Scene-cut detection plan for video payloads — the shot-boundary
    * step of a video curation pipeline (split clips at cuts before
    * captioning/sampling). Per frame a scalar intensity signal stands
    * in for the decoded frame (derived deterministically from the
    * media checksum + frame index — md5 hex-slice, engine-portable
    * like the rest of [[FakeCodec]]; in production this column is the
    * per-frame luma/histogram statistic the decoder emits); a cut is
    * any frame whose |signal - lag(signal)| clears `threshold`.
    *
    * Scale shape: a PURE SCAN — no shuffle anywhere. The consecutive-
    * frame delta needs no corpus-wide lag window because a clip's
    * frames live together (here: the signal is a function of
    * (checksum, index); in production: the decoder emits a clip's
    * per-frame statistics as one array), so the delta is computed
    * inside the row's frame sequence and non-cut frames are filtered
    * BEFORE exploding. The earlier formulation exploded every frame
    * and ran lag() over a Window.partitionBy(media_id) — semantically
    * identical, but it shuffled and sorted Ω(total frames) rows
    * (250 M at 1000× sf0.1, 7.5 GB exchange), and read α = 1.15 at
    * the third decade as the sort hit its spill regime; the scan form
    * pays two short md5s per frame instead and keeps the corpus
    * dimension embarrassingly parallel at any scale.
    */
  def sceneCuts(meta: Dataset[MediaMeta], threshold: Int): DataFrame = {
    def sig(i: org.apache.spark.sql.Column) =
      conv(
        substring(
          md5(concat(col("checksum").cast("string"), lit(":"), i.cast("string"))),
          1, 2),
        16, 10).cast("int")
    // bindArray: the signals array must be a BOUND lambda value — a
    // projected column would be re-inlined by CollapseProject into
    // every element_at and the whole array would recompute per access
    // (the spanDedup lesson). One md5 per frame, not two.
    val cuts = graft.functions.TextFunctions.bindArray(
      transform(sequence(lit(0L), col("n_frames") - 1L), i => sig(i))) { sigs =>
      filter(
        transform(
          sequence(lit(1), (col("n_frames") - 1L).cast("int")),
          i => struct(
            i.cast("long").as("frame_idx"),
            (element_at(sigs, i + 1) - element_at(sigs, i)).as("delta"))),
        s => abs(s("delta")) >= threshold)
    }
    meta.toDF()
      .where(col("n_frames") > 1)
      .select(col("media_id"), explode(cuts).as("cut"))
      .select(col("media_id"), col("cut.frame_idx"), col("cut.delta"))
  }

  /** LAION-style image–text pair curation: the CLIP-similarity gate
    * plus caption-quality gates that decide which (image, caption)
    * pairs enter a multimodal training set (Schuhmann et al., LAION-400M:
    * keep pairs with CLIP cosine ≥ 0.3; plus length / language
    * filters). The image embedding lives at `docId` in the embedding
    * space and the caption embedding at `docId + textVecOffset` — the
    * two-tower layout a CLIP encoder job produces. Every doc surfaces
    * with per-gate verdicts (a dropped pair must be attributable to a
    * specific gate for curation QA); a missing embedding fails the
    * similarity gate rather than vanishing.
    *
    * Scale: two hash joins on the embedding key + one broadcast-free
    * narrow gate projection; cosine runs in the native codegen kernel
    * and is 6dp-rounded so the threshold decision is engine-exact.
    */
  def clipPairCuration(
      docs: DataFrame, // doc_id, lang, n_chars
      embeddings: DataFrame, // vec_id, embedding
      textVecOffset: Long,
      cosThreshold: Double,
      minChars: Long,
      maxChars: Long,
      langs: Seq[String]
  ): DataFrame = {
    val pairs = docs.select(
      col("doc_id").as("a"), (col("doc_id") + textVecOffset).as("b"))
    val cos = Similarity
      .pairwiseCosine(embeddings, "vec_id", "embedding", pairs)
      .select(col("a").as("doc_id"), col("cos_sim"))
    docs
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .join(cos, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("cos_sim"),
        coalesce((col("cos_sim") >= cosThreshold).cast("int"), lit(0)).as("keep_sim"),
        col("n_chars").between(minChars, maxChars).cast("int").as("keep_len"),
        col("lang").isInCollection(langs).cast("int").as("keep_lang"),
        (coalesce((col("cos_sim") >= cosThreshold).cast("int"), lit(0)) === 1 &&
          col("n_chars").between(minChars, maxChars) &&
          col("lang").isInCollection(langs)).cast("int").as("keep"))
  }
}
