package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/AVI codec: lossless DIB round-trip, REAL MJPG (ImageIO JPEG)
  * decode, container edges, and the fallback gates.
  */
class AviCodecSpec extends AnyFunSuite {

  private def frame(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + seed * 31) % 251).toByte)

  test("DIB-24 AVI round-trips luma byte-exactly (gray → BGR → BT.601 luma is the identity)") {
    val (w, h) = (5, 4)
    val frames = Array(frame(w * h, 0), frame(w * h, 1), frame(w * h, 2))
    val avi = AviCodec.encodeAvi(frames, w, h, fpsNum = 12)
    val clip = VideoCodec.tryDecode(avi)
    assert(clip.isEmpty, "an AVI must not parse as Y4M")
    val c = AviCodec.tryDecode(avi).get
    assert(c.width == w && c.height == h && c.fpsNum == 12 && c.fpsDen == 1)
    assert(c.frames.length == 3)
    c.frames.zip(frames).foreach { case (got, want) =>
      assert(got.toSeq == want.toSeq, "DIB decode must be byte-exact")
    }
  }

  test("odd-width DIB rows exercise the 4-byte stride padding") {
    val (w, h) = (3, 3) // stride = 12, 3 pad bytes per row
    val f = frame(w * h, 5)
    val c = AviCodec.tryDecode(AviCodec.encodeAvi(Array(f), w, h, 10)).get
    assert(c.frames.head.toSeq == f.toSeq)
  }

  test("MJPG AVI really decodes per-frame JPEG: exact geometry, bounded pixel error") {
    val (w, h) = (8, 6)
    val frames = Array(frame(w * h, 0), frame(w * h, 3))
    val avi = AviCodec.encodeAvi(frames, w, h, fpsNum = 24, fpsDen = 1, mjpeg = true)
    val c = AviCodec.tryDecode(avi).get
    assert(c.width == w && c.height == h && c.frames.length == 2)
    assert(c.frames.forall(_.length == w * h))
    // JPEG is lossy but close: decoded luma within a plausible error of
    // the source (loose bound — quality defaults vary), and the decode
    // is DETERMINISTIC (same bytes → same samples)
    c.frames.zip(frames).foreach { case (got, want) =>
      val maxErr = got.zip(want).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
      assert(maxErr <= 96, s"JPEG decode implausibly far from source: $maxErr")
    }
    val c2 = AviCodec.tryDecode(avi).get
    c.frames.zip(c2.frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("decodeMeta / sampling / fingerprint reuse the Y4M implementations on AVI clips") {
    val (w, h) = (4, 4)
    val frames = Array.tabulate(5)(i => frame(w * h, i))
    val c = AviCodec.tryDecode(AviCodec.encodeAvi(frames, w, h, 10)).get
    val m = VideoCodec.decodeMeta(c)
    assert(m.nFrames == 5 && m.nSamples == 5L * w * h)
    assert(m.sampleSum == frames.flatten.map(_ & 0xff).map(_.toLong).sum)
    assert(VideoCodec.sampleFrames(c, 2).length == 3)
    // byte-identical luma ⇒ identical fingerprint vs the Y4M container
    val y4m = VideoCodec.tryDecode(VideoCodec.encodeMonoY4m(frames, w, h, 10)).get
    assert(VideoCodec.temporalFingerprint(c) == VideoCodec.temporalFingerprint(y4m))
  }

  test("corruption and foreign payloads gate to None, never a shorter clip") {
    assert(AviCodec.tryDecode("not an avi at all".getBytes("UTF-8")).isEmpty)
    assert(AviCodec.tryDecode(Array.empty[Byte]).isEmpty)
    // a WAV is RIFF but not AVI
    val wav = AudioCodec.encodePcmWav(frame(32, 1), 8000)
    assert(AviCodec.tryDecode(wav).isEmpty)
    // truncation anywhere → None (a silently shorter clip is corruption)
    val full = AviCodec.encodeAvi(Array(frame(16, 0), frame(16, 1)), 4, 4, 10)
    assert(AviCodec.tryDecode(java.util.Arrays.copyOf(full, full.length - 5)).isEmpty)
    // a Y4M is not an AVI
    val y4m = VideoCodec.encodeMonoY4m(Array(frame(16, 0)), 4, 4, 10)
    assert(AviCodec.tryDecode(y4m).isEmpty)
  }

  test("Multimodal.decodeVideo routes both containers; stub keeps undecodable payloads total") {
    val frames = Array(frame(16, 2))
    assert(Multimodal.decodeVideo(
      VideoCodec.encodeMonoY4m(frames, 4, 4, 10)).get.frames.length == 1)
    assert(Multimodal.decodeVideo(
      AviCodec.encodeAvi(frames, 4, 4, 10)).get.frames.length == 1)
    assert(Multimodal.decodeVideo(
      AviCodec.encodeAvi(frames, 4, 4, 10, mjpeg = true)).get.frames.length == 1)
    assert(Multimodal.decodeVideo("plain text".getBytes("UTF-8")).isEmpty)
  }
}
