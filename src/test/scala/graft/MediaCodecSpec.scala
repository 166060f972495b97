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

  test("JPEG golden decode: the routing arm decodes a checked-in JFIF byte stream exactly") {
    // The image/jpeg arm of the decode router was shipped live but
    // untested (round-8 review finding). This pins it with a tiny
    // checked-in JPEG: a 16x12 RGB gradient (r=16x, g=20y, b=9(x+y))
    // encoded ONCE by this JDK's ImageIO writer and frozen here as
    // bytes, with the decoded per-channel sums recorded at freeze
    // time. JPEG is LOSSY, so the sums differ from the pre-encode
    // formula — that is WHY no generator emits JPEG into the exact
    // oracles — but decoding a FIXED byte stream is deterministic
    // within the pinned JDK (libjpeg-derived IDCT; JDK 17 here), so
    // exact equality is the correct assertion for the golden bytes.
    // If a JDK bump ever shifts this pin, re-freeze mechanically:
    //   sbt 'testOnly graft.MediaCodecSpec -- -z regeneration' \
    //     -Dgraft.regen.jpeg=1
    // prints the fresh base64 + sums to paste over the constants below.
    val goldenB64 =
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAMABADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDgNN8MdPk/Suu03wx0/d/pXUabYW/HyV1+m6fb8fJSoV2Y5FntXQ//2Q=="
    val bytes = java.util.Base64.getDecoder.decode(goldenB64)
    assert(bytes.length == 664, "frozen artifact length")
    // JPEG SOI marker (0xFFD8) + JFIF APP0 identifier
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "SOI marker")
    assert(new String(bytes.slice(6, 10), "US-ASCII") == "JFIF", "APP0 JFIF tag")
    val d = Codecs.JdkCodec.decode(bytes, "image/jpeg")
    assert(d.width == 16 && d.height == 12 && d.nFrames == 1L)
    assert(d.chanSums.toSeq == Seq(23126L, 21026L, 22422L),
      "JPEG decoded channel sums drifted from the freeze-time pin")
    assert(d.chanSumSqs.toSeq == Seq(3781302L, 3191040L, 3126948L),
      "JPEG decoded channel sum-squares drifted from the freeze-time pin")
    assert(d.checksum == 23126L + 21026L + 22422L)
    // lossy sanity: in the same ballpark as the pre-encode formula
    // sums (within 10%), which for this gradient are ~23k/21k/21k
    val formula = {
      var s = Array(0L, 0L, 0L)
      for (y <- 0 until 12; x <- 0 until 16) {
        s(0) += (x * 16) & 0xff; s(1) += (y * 20) & 0xff; s(2) += ((x + y) * 9) & 0xff
      }
      s
    }
    (0 until 3).foreach { c =>
      assert(math.abs(d.chanSums(c) - formula(c)).toDouble / formula(c) < 0.10,
        s"channel $c decoded mass implausibly far from the source gradient")
    }
  }

  test("JPEG corpus arm: exact dims and bounded channel-mass deviation across EVERY payload class") {
    // The mm_jpeg_stats driver query encodes each doc as a real JPEG
    // and gates decode-vs-formula channel mass at relTol = 0.25. The
    // payload is a pure function of id mod 3840 (lcm of the 256/24/120
    // periods of m, width, height), so walking every class HERE is the
    // exhaustive measurement that relTol is pinned to: if an encoder
    // change pushes any class past the bound, this fails before the
    // driver gate does.
    var maxRel = 0.0
    var id = 0L
    while (id < 3840L) {
      val bytes = MediaGen.jpegBytes(id)
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, s"SOI marker for id=$id")
      val d = Codecs.JdkCodec.decode(bytes, "image/jpeg")
      assert(d.width == MediaGen.imageWidth(id) && d.height == MediaGen.imageHeight(id),
        s"JPEG header dims must be lossless for id=$id")
      val (s, _) = naiveImageSums(id)
      var c = 0
      while (c < 3) {
        maxRel = math.max(maxRel, math.abs(d.chanSums(c) - s(c)).toDouble / s(c))
        c += 1
      }
      id += 1
    }
    info(f"max per-class channel-mass relative deviation: $maxRel%.4f")
    // measured at freeze time: 0.1181 (an 8x8 class — one DCT block,
    // wrap-around ringing); the driver gate's 0.25 is ~2x that max
    assert(maxRel < 0.25,
      f"JPEG decode drifted $maxRel%.4f from the source gradient — the mm_jpeg_stats relTol no longer holds")
    // determinism: task retries re-encode identically (the per-class
    // n_stat_variants = 1 gate depends on it)
    for (i <- Seq(0L, 77L, 3839L))
      assert(MediaGen.jpegBytes(i).toSeq == MediaGen.jpegBytes(i).toSeq)
  }

  test("golden JFIF regeneration helper (run with -Dgraft.regen.jpeg=1 after a JDK bump)") {
    // Mechanical re-freeze for the pin above: re-encodes the same
    // 16x12 gradient with THIS JDK's default ImageIO JPEG writer (the
    // freeze-time setting) and prints the new base64 + decoded sums.
    // Without the property it only checks the helper still encodes.
    val img = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y,
        (((x * 16) & 0xff) << 16) | (((y * 20) & 0xff) << 8) | (((x + y) * 9) & 0xff))
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val bytes = bos.toByteArray
    assert(bytes.length > 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    if (sys.props.contains("graft.regen.jpeg")) {
      val d = Codecs.JdkCodec.decode(bytes, "image/jpeg")
      info("goldenB64 = " + java.util.Base64.getEncoder.encodeToString(bytes))
      info(s"length = ${bytes.length}")
      info(s"chanSums = ${d.chanSums.toSeq}; chanSumSqs = ${d.chanSumSqs.toSeq}")
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
