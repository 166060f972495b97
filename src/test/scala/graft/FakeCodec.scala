package graft

import graft.operators.Multimodal.{Decoded, MediaCodec}

/** Test double for the [[graft.operators.Multimodal.MediaCodec]] SPI:
  * "decodes" dimensions from the md5 of the byte content — any bytes,
  * no real container needed, reproducible by any engine with md5.
  * Production decode is [[graft.operators.Codecs.JdkCodec]] (real
  * javax.imageio / javax.sound parsing of genuine container bytes);
  * this double exists so SPI-plumbing specs can exercise decodeMeta on
  * arbitrary payloads without constructing valid media.
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
