package graft.operators

import java.io.ByteArrayInputStream

import graft.operators.Multimodal.{Decoded, MediaCodec}

/** Real JDK-only codecs behind the [[Multimodal.MediaCodec]] SPI — no
  * external media libraries, only what Java 17 ships:
  *
  *  - images/video: `javax.imageio` (PNG, BMP, GIF — including
  *    multi-frame animated GIF, which stands in for the video decode
  *    path: genuine container parse, per-frame pixel access);
  *  - audio: `javax.sound.sampled` (RIFF/WAV PCM).
  *
  * These retire the md5 stub that previously filled this seam: decode
  * results now come from actual pixels and samples in actual container
  * bytes. JPEG is decodable (and routed below) but LOSSY, so it is
  * excluded from the generator-formula EXACT oracles; the arm is gated
  * three ways instead — MediaCodecSpec's checked-in golden JFIF decode
  * (fixed bytes decode deterministically within the pinned JDK), the
  * exhaustive per-payload-class deviation measurement in the same spec,
  * and the mm_jpeg_stats driver query, which drives a real
  * encode→container→decode round trip over the whole corpus and gates
  * header-exact dims, per-class decode determinism, and bounded
  * channel-mass deviation ([[Multimodal.jpegCorpusGate]]).
  * Formats the JDK cannot decode at all (MP4/WebM/MP3) remain behind
  * the same SPI for a JNI/ffmpeg implementation; the engine plumbing
  * is codec-agnostic either way.
  *
  * Thread/executor behavior: `ImageIO.setUseCache(false)` is set in
  * `init()` so tiny payloads never round-trip through temp files (the
  * default ImageIO stream cache is DISK — catastrophic at one file per
  * decoded row on a 32-thread executor). Reader/writer instances are
  * per-call (ImageIO plugin instances are not thread-safe; allocation
  * is trivial next to the decode itself).
  *
  * Reference anchor: the reference serves media as opaque binary
  * columns (streamer/iceberg_streamer.py); its decode stage lives in
  * client-side Python, which this SPI replaces with in-engine batch
  * decode.
  */
object Codecs {

  /** Routing codec: dispatch on declared mime to the image/audio
    * decoders below. Unknown mimes and undecodable payloads fail fast
    * with the media context (a silently-skipped decode error corrupts
    * corpus statistics downstream).
    */
  object JdkCodec extends MediaCodec {
    override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)

    override def decode(bytes: Array[Byte], mime: String): Decoded = mime match {
      case "image/png" | "image/bmp" | "image/jpeg" => decodeImage(bytes, mime)
      case "video/gif" | "image/gif"                => decodeFrames(bytes)
      case "audio/wav"                              => decodeWav(bytes)
      case other =>
        throw new IllegalArgumentException(s"no JDK decoder for mime '$other'")
    }
  }

  /** Single-frame image decode: dimensions plus exact per-channel pixel
    * sums and sums-of-squares (the normalization-constants inputs).
    * `getRGB` is layout-independent (the raster may be BGR, banded,
    * palettized — ARGB packing is the portable read).
    */
  def decodeImage(bytes: Array[Byte], mime: String): Decoded = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"ImageIO could not decode a '$mime' payload of ${bytes.length} bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](3)
    val sumSqs = new Array[Long](3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sums(0) += r; sums(1) += g; sums(2) += b
        sumSqs(0) += r.toLong * r; sumSqs(1) += g.toLong * g; sumSqs(2) += b.toLong * b
        x += 1
      }
      y += 1
    }
    Decoded(
      width = w, height = h, nFrames = 1L,
      checksum = sums(0) + sums(1) + sums(2),
      chanSums = sums, chanSumSqs = sumSqs,
      frameMeans = Array.empty,
      sampleRate = 0L, nSamples = 0L, sampleSumSq = 0L)
  }

  /** Multi-frame (animated GIF) decode: frame count from the container
    * plus the per-frame mean intensity — the shot-boundary signal a
    * video decoder emits per clip. Intensity is the blue channel of the
    * ARGB read (gray frames have r=g=b).
    */
  def decodeFrames(bytes: Array[Byte]): Decoded = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(it.hasNext, "no GIF reader installed")
    val reader = it.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, s"GIF payload of ${bytes.length} bytes decoded to zero frames")
      val means = new Array[Double](n)
      var checksum = 0L
      var w = 0
      var h = 0
      var f = 0
      while (f < n) {
        val img = reader.read(f)
        w = img.getWidth; h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        means(f) = sum.toDouble / (w.toLong * h)
        checksum += sum
        f += 1
      }
      Decoded(
        width = w, height = h, nFrames = n.toLong, checksum = checksum,
        chanSums = Array.empty, chanSumSqs = Array.empty, frameMeans = means,
        sampleRate = 0L, nSamples = 0L, sampleSumSq = 0L)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** WAV decode through `javax.sound.sampled`: format header (rate,
    * width, channels) plus the exact sum of squared PCM16 samples (the
    * RMS/loudness input). Little-endian signed 16-bit is the only PCM
    * layout the generator emits; anything else fails fast.
    */
  def decodeWav(bytes: Array[Byte]): Decoded = {
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
        s"expected mono PCM16 LE, got $fmt")
      val n = ais.getFrameLength
      val raw = ais.readAllBytes()
      var sumSq = 0L
      var i = 0
      while (i + 1 < raw.length) {
        val s = ((raw(i) & 0xff) | (raw(i + 1) << 8)).toShort.toLong
        sumSq += s * s
        i += 2
      }
      Decoded(
        width = 0L, height = 0L, nFrames = 0L, checksum = sumSq,
        chanSums = Array.empty, chanSumSqs = Array.empty, frameMeans = Array.empty,
        sampleRate = fmt.getSampleRate.toLong, nSamples = n, sampleSumSq = sumSq)
    } finally ais.close()
  }
}
