package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Codecs, MediaGen}

/** Golden decodes for the real JDK codecs: every assertion pits
  * [[Codecs.JdkCodec]]'s parse of GENUINE container bytes against an
  * independent recomputation from [[MediaGen]]'s integer formulas —
  * plus byte-layout pins for the hand-rolled containers (BMP, WAV) and
  * fail-fast checks for undecodable payloads.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def naiveImageSums(id: Long): (Array[Long], Array[Long]) = {
    val (w, h) = (MediaGen.imageWidth(id), MediaGen.imageHeight(id))
    val s = new Array[Long](3)
    val q = new Array[Long](3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = MediaGen.px(id, x, y)
      s(0) += r; s(1) += g; s(2) += b
      q(0) += r.toLong * r; q(1) += g.toLong * g; q(2) += b.toLong * b
    }
    (s, q)
  }

  test("PNG golden decode: ImageIO recovers every pixel of the textured image exactly") {
    for (id <- Seq(0L, 7L, 123L, 9999L)) {
      val d = Codecs.JdkCodec.decode(MediaGen.pngBytes(id), "image/png")
      val (s, q) = naiveImageSums(id)
      assert(d.width == MediaGen.imageWidth(id) && d.height == MediaGen.imageHeight(id))
      assert(d.nFrames == 1L)
      assert(d.chanSums.toSeq == s.toSeq, s"PNG channel sums diverged for id=$id")
      assert(d.chanSumSqs.toSeq == q.toSeq, s"PNG channel sumsqs diverged for id=$id")
      assert(d.checksum == s.sum)
    }
    // pin one externally computable constant: id=0 is an 8x8 image and
    // r(x,y) = (3x+7y)%256 never wraps (max 70), so
    // sum_r = 8·3·Σx + 8·7·Σy = 8·3·28 + 8·7·28 = 2240
    val d0 = Codecs.JdkCodec.decode(MediaGen.pngBytes(0L), "image/png")
    assert(d0.chanSums(0) == 2240L)
  }

  test("BMP: hand-rolled layout is byte-exact and decodes identically to PNG") {
    for (id <- Seq(1L, 42L, 250L)) {
      val bytes = MediaGen.bmpBytes(id)
      val (w, h) = (MediaGen.imageWidth(id), MediaGen.imageHeight(id))
      val rowBytes = ((3 * w + 3) / 4) * 4
      assert(bytes.length == 54 + h * rowBytes, "BMP container length formula")
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      val d = Codecs.JdkCodec.decode(bytes, "image/bmp")
      val viaPng = Codecs.JdkCodec.decode(MediaGen.pngBytes(id), "image/png")
      assert(d.width == viaPng.width && d.height == viaPng.height)
      assert(d.chanSums.toSeq == viaPng.chanSums.toSeq,
        s"BMP and PNG decodes of the same logical image diverged for id=$id")
    }
  }

  test("animated GIF: container frame count and exact per-frame means") {
    for (id <- Seq(2L, 6L, 58L, 1002L)) {
      val d = Codecs.JdkCodec.decode(MediaGen.gifBytes(id), "video/gif")
      val n = MediaGen.videoFrames(id)
      assert(d.nFrames == n.toLong, s"GIF frame count for id=$id")
      assert(d.width == 16L && d.height == 12L)
      val expected = (0 until n).map(f => MediaGen.frameLevel(id, f).toDouble)
      assert(d.frameMeans.toSeq == expected,
        s"decoded frame means diverged from generator levels for id=$id")
      assert(d.checksum == expected.map(v => v.toLong * 192L).sum)
    }
  }

  test("WAV: javax.sound parses the hand-rolled RIFF header and raw PCM16 exactly") {
    for (id <- Seq(3L, 403L, 777L)) {
      val bytes = MediaGen.wavBytes(id)
      val n = MediaGen.audioSamples(id)
      assert(bytes.length == 44 + 2 * n, "WAV container length formula")
      val d = Codecs.JdkCodec.decode(bytes, "audio/wav")
      assert(d.sampleRate == 8000L && d.nSamples == n.toLong)
      val ssq = (0 until n).map { i =>
        val s = MediaGen.sample(id, i).toLong; s * s
      }.sum
      assert(d.sampleSumSq == ssq, s"PCM sum-of-squares diverged for id=$id")
    }
  }

  test("undecodable payloads and unknown mimes fail fast with context") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assertThrows[IllegalArgumentException](
      Codecs.JdkCodec.decode(garbage, "image/png"))
    assertThrows[IllegalArgumentException](
      Codecs.JdkCodec.decode(garbage, "video/gif"))
    intercept[Exception](Codecs.JdkCodec.decode(garbage, "audio/wav"))
    val e = intercept[IllegalArgumentException](
      Codecs.JdkCodec.decode(garbage, "application/octet-stream"))
    assert(e.getMessage.contains("application/octet-stream"))
  }

  test("generator bytes are deterministic (task retries re-encode identically)") {
    for (id <- Seq(0L, 2L, 3L)) {
      assert(MediaGen.pngBytes(id).toSeq == MediaGen.pngBytes(id).toSeq)
      assert(MediaGen.gifBytes(id).toSeq == MediaGen.gifBytes(id).toSeq)
      assert(MediaGen.wavBytes(id).toSeq == MediaGen.wavBytes(id).toSeq)
      assert(MediaGen.bmpBytes(id).toSeq == MediaGen.bmpBytes(id).toSeq)
    }
  }
}
