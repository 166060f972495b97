package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic media payload generators — GENUINE bytes in real
  * container formats (PNG, BMP, animated GIF, RIFF/WAV PCM16), with
  * every pixel / sample value a pure integer function of (media id,
  * coordinate). That closure property is the whole design: the decode
  * side ([[Codecs.JdkCodec]]) recovers stats from the REAL bytes, while
  * the external DuckDB oracle recomputes the same stats from the id
  * formulas alone — so the correctness gate covers a true
  * encode→container→decode round trip without the oracle ever touching
  * a codec. All four formats are lossless for the values used (PNG/BMP
  * are lossless RGB; GIF's 256-entry palette holds every gray level;
  * WAV is raw PCM), so decode-vs-formula equality is exact, not
  * approximate.
  *
  * Formulas (m = id mod 256; all arithmetic exact in 64-bit):
  *  - image dims:  w = 8 + id%24, h = 8 + (id/5)%24          (8..31)
  *  - image pixel (x,y): r=(m+3x+7y)%256, g=(2m+5x+y)%256, b=(m+x*y)%256
  *  - video: 16x12 frames, n = 2 + id%59, frame f solid gray
  *    v_f = (m + 7f² + 13f) % 256 (solid per frame: the per-frame mean
  *    IS v_f exactly, and GIF LZW makes the payload tiny)
  *  - audio: 8 kHz mono PCM16, n = 400 + id%400 samples,
  *    s_i = ((m·131 + i·17) % 4001) − 2000
  *
  * Scale shape: generation runs inside the scan projection
  * (mapPartitions), embarrassingly parallel, no shuffle — on a real
  * cluster this node is replaced by reading the media binary column
  * straight off parquet, and everything downstream is identical.
  *
  * Reference anchor: the reference streams media as opaque binary
  * columns with typed metadata (streamer/iceberg_streamer.py); this
  * generator stands in for its upstream media store.
  */
object MediaGen {

  def imageWidth(id: Long): Int = (8 + (id % 24)).toInt
  def imageHeight(id: Long): Int = (8 + ((id / 5) % 24)).toInt
  def videoFrames(id: Long): Int = (2 + (id % 59)).toInt
  def audioSamples(id: Long): Int = (400 + (id % 400)).toInt

  /** Exact per-channel pixel values at (x, y) for image `id`. */
  def px(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val m = (id % 256).toInt
    ((m + 3 * x + 7 * y) % 256, (2 * m + 5 * x + y) % 256, (m + x * y) % 256)
  }

  /** Solid gray level of video frame `f` for media `id`. */
  def frameLevel(id: Long, f: Int): Int =
    (((id % 256) + 7L * f * f + 13L * f) % 256).toInt

  /** PCM16 sample `i` of clip `id`. */
  def sample(id: Long, i: Int): Int =
    ((((id % 256) * 131 + i.toLong * 17) % 4001) - 2000).toInt

  private def rgbImage(id: Long): BufferedImage = {
    val (w, h) = (imageWidth(id), imageHeight(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Textured RGB PNG (ImageIO encoder; PNG is lossless so the decode
    * recovers every pixel exactly — byte LENGTH is encoder-dependent,
    * which is why no oracle asserts on PNG n_bytes).
    */
  def pngBytes(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // never spill tiny images to temp files
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbImage(id), "png", bos)
    bos.toByteArray
  }

  /** JPEG-encoded textured RGB image — the LOSSY arm of the codec SPI,
    * driven end-to-end by the mm_jpeg_stats driver query. Encoding uses
    * an EXPLICIT compression quality (0.75) so the bytes never depend
    * on writer defaults; within a fixed JDK both encoder and decoder
    * are deterministic, which is the honest gate for a lossy codec:
    * exact pixel recovery is impossible by design, so the query gates
    * (a) header-exact dims, (b) one decoded stat tuple per payload
    * class (the payload is a pure function of id mod 3840 — the lcm of
    * the m/width/height periods 256, 24, 120), and (c) bounded
    * decoded-vs-formula channel-mass deviation. The same discipline as
    * MediaCodecSpec's checked-in golden JFIF, generalized to corpus
    * scale.
    */
  def jpegBytes(id: Long): Array[Byte] = {
    val enc = new JpegEncoder
    try enc.encode(id)
    finally enc.close()
  }

  /** Reusable JPEG encoder: ImageWriter lookup + dispose and the output
    * buffer are paid ONCE, then amortized across every image a task
    * encodes (the per-row form paid writer acquisition on each of
    * sf10's 500k documents). NOT thread-safe — create one per task
    * (mapPartitions closure), reuse within it, close at the end. The
    * bytes are identical to the one-shot path: output depends only on
    * the writer class and the explicit-quality param, both fixed.
    */
  final class JpegEncoder extends AutoCloseable {
    javax.imageio.ImageIO.setUseCache(false)
    private val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    private val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.75f)
    private val bos = new ByteArrayOutputStream()

    def encode(id: Long): Array[Byte] = {
      bos.reset()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(rgbImage(id), null, null), param)
      ios.close()
      bos.toByteArray
    }

    override def close(): Unit = writer.dispose()
  }

  /** Hand-rolled uncompressed 24bpp bottom-up BMP — byte-exact layout
    * (54-byte header + rows padded to 4B), so even the container LENGTH
    * is formula-derivable: 54 + h·((3w+3)/4·4).
    */
  def bmpBytes(id: Long): Array[Byte] = {
    val (w, h) = (imageWidth(id), imageHeight(id))
    val rowBytes = ((3 * w + 3) / 4) * 4
    val dataLen = rowBytes * h
    val buf = java.nio.ByteBuffer
      .allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataLen).putInt(0).putInt(54) // file size, reserved, pixel offset
    buf.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, bottom-up (positive h)
    buf.putShort(1).putShort(24) // planes, bpp
    buf.putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(id, x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR
        x += 1
      }
      var p = 3 * w
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Animated GIF of solid grayscale frames (ImageIO sequence writer).
    * 256-entry palette holds every gray level, so the decoded per-frame
    * intensity is exactly [[frameLevel]].
    */
  def gifBytes(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val n = videoFrames(id)
    var f = 0
    while (f < n) {
      val img = new BufferedImage(16, 12, BufferedImage.TYPE_BYTE_GRAY)
      val v = frameLevel(id, f)
      val raster = img.getRaster
      var y = 0
      while (y < 12) {
        var x = 0
        while (x < 16) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Hand-rolled RIFF/WAVE, PCM16 mono 8 kHz — byte-exact layout
    * (44-byte header + 2 bytes/sample, length 44 + 2·n).
    */
  def wavBytes(id: Long): Array[Byte] = {
    val n = audioSamples(id)
    val rate = 8000
    val buf = java.nio.ByteBuffer
      .allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1) // PCM, mono
    buf.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { buf.putShort(sample(id, i).toShort); i += 1 }
    buf.array()
  }

  /** The mixed-modality media corpus over the documents table: genuine
    * PNG / BMP / animated-GIF / WAV payloads keyed by doc_id mod 4.
    * Generation happens per partition inside the scan (no shuffle); on
    * a cluster this is where a parquet binary column is read instead.
    */
  def mediaFor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id % 4) match {
            case 0 => (id, pngBytes(id), "image/png")
            case 1 => (id, bmpBytes(id), "image/bmp")
            case 2 => (id, gifBytes(id), "video/gif")
            case _ => (id, wavBytes(id), "audio/wav")
          }
        }
      }
      .toDF("media_id", "content", "mime")
  }

  /** Image-only corpus (PNG for even ids, BMP for odd) — the input for
    * image-specific stages (resize planning, channel stats).
    */
  def imagesFor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          if (id % 2 == 0) (id, pngBytes(id), "image/png")
          else (id, bmpBytes(id), "image/bmp")
        }
      }
      .toDF("media_id", "content", "mime")
  }

  /** Audio-only corpus (every doc a WAV clip). */
  def audioFor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(ids => ids.map(id => (id, wavBytes(id), "audio/wav")))
      .toDF("media_id", "content", "mime")
  }

  /** Video-only corpus (every doc an animated GIF). */
  def videosFor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(ids => ids.map(id => (id, gifBytes(id), "video/gif")))
      .toDF("media_id", "content", "mime")
  }
}
