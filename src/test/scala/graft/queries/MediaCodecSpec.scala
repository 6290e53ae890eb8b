package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Locks proving the PNG/WAV operators run REAL codecs on REAL
  * containers — not the GRFT stub format: the synthesized payloads
  * carry the genuine magic bytes, a real decoder round-trips them, and
  * the decoded raster/samples equal the closed form the oracle derives
  * (PNG and WAV/PCM are lossless).
  */
class MediaCodecSpec extends AnyFunSuite {

  test("png fixture bytes are a real PNG container and ImageIO round-trips the raster") {
    val bytes = MediaCodecQueries.pngFor(42L)
    // the 8-byte PNG signature
    assert(bytes.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 32 + (42 % 8) * 4)
    assert(img.getHeight == 24 + ((42 * 3) % 8) * 4)
    // lossless: a spot pixel equals the closed form
    val rgb = img.getRGB(5, 7)
    assert(((rgb >> 16) & 0xff) == ((42 + 5 * 3 + 7 * 5) % 256))
    assert(((rgb >> 8) & 0xff) == ((42 * 2 + 5 * 7 + 7 * 11) % 256))
    assert((rgb & 0xff) == ((42 * 3 + 5 * 13 + 7) % 256))
  }

  test("wav fixture bytes are a real RIFF/WAVE container and decode to the closed form") {
    val bytes = MediaCodecQueries.wavFor(7L)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = ais.readAllBytes()
    assert(pcm.length == 256 * 2)
    // first sample little-endian equals the closed form
    val v0 = ((pcm(0) & 0xff) | (pcm(1) << 8)).toShort.toInt
    assert(v0 == (((7L * 37) % 65536) - 32768).toInt)
  }
}
