package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL image codec on the JDK's own ImageIO — no new dependency:
  * PNG/JPEG/BMP/GIF/TIFF decode and encode ship with Java 17. This is
  * the production image half of the media plane ([[Multimodal]] routes
  * `kind = "image"` rows here and falls back to [[Multimodal.FakeCodec]]
  * only when the payload doesn't decode); audio/video stay stubbed —
  * those codecs genuinely aren't in the JDK.
  *
  * Everything here is per-row pure computation made to run inside
  * `mapPartitions` on executors: `ImageIO.setUseCache(false)` keeps
  * decode in-memory (no temp-file spooling per cell), and headless
  * mode is forced so `Graphics2D` never looks for a display.
  */
object ImageCodec {

  // Executor-safe init: BufferedImage/Graphics2D work headless, but
  // only if AWT never tries to connect to a display; and ImageIO's
  // default disk-backed stream cache would write a temp file per
  // decoded row.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Decoded-image facts plus the exact-integer raster digest the
    * oracle replays: `sampleSum` is the sum of all 8-bit gray samples
    * — for an image synthesized from known bytes this proves the
    * decode round-trip sample-for-sample, not just header-for-header.
    */
  case class ImageMeta(width: Int, height: Int, nSamples: Long, sampleSum: Long)

  /** Encode an 8-bit grayscale raster (row-major samples) as PNG.
    * Gray PNG is lossless: [[decodeGray]] returns exactly `samples`.
    */
  def encodeGrayPng(samples: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(samples.length == width * height,
      s"raster length ${samples.length} != ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, samples)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** `Some(image)` iff the payload decodes with any registered ImageIO
    * reader; `None` for non-image bytes (the fake-codec fallback gate).
    */
  def tryDecode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** The image as row-major 8-bit gray samples. A raster that is
    * already `TYPE_BYTE_GRAY` reads out exactly; anything else is
    * drawn onto a gray buffer first (the standard AWT luminance
    * conversion).
    */
  def graySamples(img: BufferedImage): Array[Byte] = {
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new BufferedImage(
          img.getWidth, img.getHeight, BufferedImage.TYPE_BYTE_GRAY)
        val g2 = g.createGraphics()
        g2.drawImage(img, 0, 0, null)
        g2.dispose()
        g
      }
    val out = new Array[Byte](gray.getWidth * gray.getHeight)
    gray.getRaster.getDataElements(0, 0, gray.getWidth, gray.getHeight, out)
    out
  }

  /** Real metadata from real pixels. */
  def decodeMeta(img: BufferedImage): ImageMeta = {
    val s = graySamples(img)
    var sum = 0L
    var i = 0
    while (i < s.length) { sum += (s(i) & 0xff); i += 1 }
    ImageMeta(img.getWidth, img.getHeight, s.length.toLong, sum)
  }

  /** Real resize: `Graphics2D` bilinear scale onto a gray buffer,
    * re-encoded as PNG. Returns `None` when the payload isn't an
    * image.
    */
  def resizePng(payload: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    tryDecode(payload).map { src =>
      val dst = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val g2 = dst.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(src, 0, 0, width, height, null)
      g2.dispose()
      val raster = new Array[Byte](width * height)
      dst.getRaster.getDataElements(0, 0, width, height, raster)
      encodeGrayPng(raster, width, height)
    }

  /** Real pixel-grid perceptual hash: partition the gray raster into a
    * `grid`×`grid` cell mesh (row `r` maps to cell `r*grid/h` — the
    * assignment form both engines can replay in integer arithmetic),
    * and set bit `bi*grid+bj` iff the cell's mean sample is at or
    * above the global mean. The compare is the exact cross-product
    * `S_cell · N_total >= S_total · N_cell` — no division, no floats,
    * so the DuckDB oracle reproduces it bit-for-bit from the source
    * bytes. Cells with no pixels (image smaller than the mesh)
    * contribute 0 bits. Near-identical images move a few samples by a
    * little, almost never a cell mean across the global mean — the
    * collision property perceptual dedup wants.
    */
  def perceptualHash(img: BufferedImage, grid: Int = 8): Long = {
    require(grid >= 1 && grid * grid <= 64, s"grid^2 must fit 64 bits, got $grid")
    val w = img.getWidth
    val h = img.getHeight
    val s = graySamples(img)
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var stot = 0L
    var k = 0
    while (k < s.length) {
      val v = s(k) & 0xff
      val bi = ((k / w) * grid) / h
      val bj = ((k % w) * grid) / w
      sums(bi * grid + bj) += v
      counts(bi * grid + bj) += 1L
      stot += v
      k += 1
    }
    val ctot = s.length.toLong
    var fp = 0L
    var c = 0
    while (c < grid * grid) {
      if (counts(c) > 0L && sums(c) * ctot >= stot * counts(c))
        fp |= (1L << c)
      c += 1
    }
    fp
  }
}
