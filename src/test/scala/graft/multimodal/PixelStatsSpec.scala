package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.PixelFixtures

/** The pixel-decode kernel's ground truth, independent of the DuckDB
  * oracle: decoded stats equal the declared per-pixel formulas computed
  * directly in Scala, and the decoded dimensions cross-check against the
  * independent [[ImageHeader]] container parser on the same encoded
  * bytes. Also pins the REASON gif is excluded from the exact contract:
  * the in-JDK GIF codec measurably corrupts rows on some geometries.
  */
class PixelStatsSpec extends AnyFunSuite {

  private val cases: Seq[(Long, Long)] =
    Seq((0L, 17L), (1L, 39L), (2L, 254L), (121L, 999L), (122L, 640L),
      (123L, 80L), (9999L, 1L), (100000L, 40L))

  test("decoded stats equal the declared formulas for every PNG/BMP fixture") {
    cases.foreach { case (id, nChars) =>
      val fmt = PixelFixtures.formatOf(id)
      val blob = PixelFixtures.encode(id, nChars)
      val got = PixelFixtures.statsOf(id, fmt, blob)
      val (w, h) = PixelFixtures.dims(id, nChars)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var (mnr, mxr) = (255, 0)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = PixelFixtures.rgbAt(id, x, y)
        sr += r; sg += g; sb += b
        mnr = math.min(mnr, r); mxr = math.max(mxr, r)
      }
      assert(got.format === fmt)
      assert((got.width, got.height, got.n_px) === (w, h, w.toLong * h))
      assert((got.sum_r, got.sum_g, got.sum_b) === (sr, sg, sb), s"doc $id")
      assert((got.min_r, got.max_r) === (mnr, mxr), s"doc $id")
      assert(got.mean_r === sr.toDouble / (w.toLong * h))
    }
  }

  test("decoded dimensions cross-check against the independent header parser") {
    cases.foreach { case (id, nChars) =>
      val blob = PixelFixtures.encode(id, nChars)
      val stats = PixelFixtures.statsOf(id, PixelFixtures.formatOf(id), blob)
      val parsed = ImageHeader.parseBatch(Seq(id -> blob)).head._2
      assert(parsed.format === stats.format, s"doc $id")
      assert((parsed.width, parsed.height) === (stats.width, stats.height),
        s"doc $id")
    }
  }

  test("the JDK gif codec is NOT round-trip exact — the exclusion is evidence, not caution") {
    // grayscale 37x3 through an explicit 256-entry palette with
    // raster-direct writes: the decoded image loses row 1 entirely
    // (every index reads back 0) — the repro that keeps gif off the
    // exact pixel contract. If a future JDK fixes it, this test starts
    // failing and the contract can widen.
    val (w, h) = (37, 3)
    val cmap = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    var sumIn = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((452L * 7 + x * 31 + y * 17) % 256).toInt
      sumIn += v
      img.getRaster.setSample(x, y, 0, v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    var sumOut = 0L
    for (y <- 0 until h; x <- 0 until w)
      sumOut += (dec.getRGB(x, y) >> 16) & 0xFF
    assert(sumOut !== sumIn,
      "JDK gif codec round-trips this geometry exactly now — " +
        "re-evaluate adding gif to the pixel-stats contract")
  }
}
