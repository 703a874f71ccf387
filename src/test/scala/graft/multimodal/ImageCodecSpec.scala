package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {

  private def raster(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toByte)

  test("gray PNG round-trips sample-exact (the lossless contract everything rests on)") {
    val w = 19; val h = 13
    val px = raster(w * h)
    val png = ImageCodec.encodeGrayPng(px, w, h)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val img = ImageCodec.tryDecode(png).get
    assert(img.getWidth == w && img.getHeight == h)
    assert(ImageCodec.graySamples(img).toSeq == px.toSeq)
  }

  test("tryDecode rejects non-image bytes (the fake-codec fallback gate)") {
    assert(ImageCodec.tryDecode("just some text payload".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.tryDecode(Array.empty[Byte]).isEmpty)
  }

  test("decodeMeta reports true dims and the exact sample sum") {
    val w = 16; val h = 4
    val px = raster(w * h)
    val meta = ImageCodec.decodeMeta(ImageCodec.tryDecode(
      ImageCodec.encodeGrayPng(px, w, h)).get)
    assert(meta.width == w && meta.height == h)
    assert(meta.nSamples == w.toLong * h)
    assert(meta.sampleSum == px.map(_ & 0xff).map(_.toLong).sum)
  }

  test("resizePng produces a decodable PNG of the target dims") {
    val png = ImageCodec.encodeGrayPng(raster(32 * 20), 32, 20)
    val out = ImageCodec.resizePng(png, 8, 8).get
    val img = ImageCodec.tryDecode(out).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    assert(ImageCodec.resizePng("not an image".getBytes, 8, 8).isEmpty)
  }

  test("resizePng preserves solid color and the gradient direction") {
    val solid = Array.fill[Byte](24 * 24)(200.toByte)
    val rs = ImageCodec.graySamples(ImageCodec.tryDecode(
      ImageCodec.resizePng(ImageCodec.encodeGrayPng(solid, 24, 24), 6, 6).get).get)
    assert(rs.forall(b => (b & 0xff) == 200), "bilinear resize of a solid must stay solid")
    // horizontal gradient: left half darker than right half after resize
    val grad = Array.tabulate(64 * 8) { k => (((k % 64) * 4) % 256).toByte }
    val gs = ImageCodec.graySamples(ImageCodec.tryDecode(
      ImageCodec.resizePng(ImageCodec.encodeGrayPng(grad, 64, 8), 16, 4).get).get)
    val rows = gs.grouped(16).toSeq
    rows.foreach { r =>
      assert((r(1) & 0xff) < (r(14) & 0xff), "gradient direction lost in resize")
    }
  }

  test("perceptualHash: deterministic, tolerant of tiny edits, sensitive to inversion") {
    val w = 24; val h = 24
    val px = Array.tabulate(w * h)(i => (((i / w) * 10) % 256).toByte)
    val png = ImageCodec.encodeGrayPng(px, w, h)
    val fp1 = ImageCodec.perceptualHash(ImageCodec.tryDecode(png).get)
    val fp2 = ImageCodec.perceptualHash(ImageCodec.tryDecode(png).get)
    assert(fp1 == fp2)
    // nudge one sample by one level: same fingerprint
    val near = px.clone(); near(5) = ((near(5) & 0xff) ^ 1).toByte
    val fpNear = ImageCodec.perceptualHash(
      ImageCodec.tryDecode(ImageCodec.encodeGrayPng(near, w, h)).get)
    assert(fp1 == fpNear, "one-level single-pixel edit must not move the fingerprint")
    val inv = px.map(b => (255 - (b & 0xff)).toByte)
    val fpInv = ImageCodec.perceptualHash(
      ImageCodec.tryDecode(ImageCodec.encodeGrayPng(inv, w, h)).get)
    assert(fp1 != fpInv, "inverted image must not collide")
  }

  test("perceptualHash matches the oracle's integer arithmetic on a hand-computed case") {
    // 4x2 image, grid 8: row r -> cell r*8/2 = 4r, col c -> cell c*8/4 = 2c
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val fp = ImageCodec.perceptualHash(
      ImageCodec.tryDecode(ImageCodec.encodeGrayPng(px, 4, 2)).get)
    // total = 360, n = 8; cell means vs global mean 45:
    // cells (bi=0): bits at 0*8+{0,2,4,6} values 10,20,30,40 -> all < 45
    // cells (bi=4): bits at 4*8+{0,2,4,6} values 50,60,70,80 -> all >= 45
    val expected = Seq(32, 34, 36, 38).map(1L << _).sum
    assert(fp == expected)
  }
}
