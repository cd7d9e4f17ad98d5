package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.ImageHeader.ImageInfo

/** The real multimodal kernel's ground truth, from two independent
  * directions:
  *
  *  1. `javax.imageio`-WRITTEN images: the JDK's own encoders produce
  *     fully valid PNG / GIF / BMP / JPEG files for arbitrary
  *     dimensions; [[ImageHeader.parse]] must read back exactly the
  *     dimensions the library encoded. This is parity against a real
  *     codec, not against our own builders.
  *  2. Golden hand-assembled byte arrays for the layouts ImageIO cannot
  *     produce on demand: EXIF APP1 in BOTH TIFF endiannesses,
  *     progressive SOF2, a core-header (v2) BMP, a top-down (negative
  *     height) BMP, truncated headers, and non-image bytes.
  *
  * The driver-facing query (`multimodal_image_headers`) is separately
  * DuckDB-oracled end to end: its corpus derives header bytes from doc
  * metadata, so the oracle recomputes every parsed field arithmetically
  * and any misread header byte breaks the hash.
  */
class ImageHeaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def imageioBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out),
      s"no imageio writer for $fmt")
    out.toByteArray
  }

  test("parses dimensions from javax.imageio-encoded png/gif/bmp/jpeg") {
    for {
      (w, h) <- Seq((1, 1), (640, 480), (31, 1027), (4096, 7))
      fmt <- Seq("png", "gif", "bmp", "jpg")
    } {
      val info = ImageHeader.parse(imageioBytes(fmt, w, h))
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(info.format === want, s"$fmt $w x $h")
      assert(info.width === w, s"$fmt $w x $h")
      assert(info.height === h, s"$fmt $w x $h")
    }
  }

  test("query builders parse back exactly (the oracle's arithmetic)") {
    assert(ImageHeader.parse(Multimodal.BlobBuilders.png(640, 480)) ===
      ImageInfo("png", 640, 480, 4, -1))
    assert(ImageHeader.parse(Multimodal.BlobBuilders.gif(17, 800)) ===
      ImageInfo("gif", 17, 800, 3, -1))
    assert(ImageHeader.parse(Multimodal.BlobBuilders.bmp(1000, 1)) ===
      ImageInfo("bmp", 1000, 1, 3, -1))
    assert(ImageHeader.parse(
      Multimodal.BlobBuilders.jpegWithExif(321, 654, 6)) ===
      ImageInfo("jpeg", 321, 654, 3, 6))
  }

  test("EXIF orientation in big-endian (MM) TIFF streams") {
    // hand-assembled: SOI, APP1 with an MM-endian IFD0 carrying
    // Orientation=8, SOF0 5x7, EOI
    def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val tiff = "MM".getBytes("US-ASCII") ++ be16(42) ++ be32(8) ++
      be16(1) ++ be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(8) ++ be16(0) ++
      be32(0)
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val app1 = Array(0xFF, 0xE1).map(_.toByte) ++
      be16(payload.length + 2) ++ payload
    val sof = Array(0xFF, 0xC0).map(_.toByte) ++ be16(11) ++
      (Array[Byte](8) ++ be16(7) ++ be16(5) ++ Array[Byte](1, 0x11, 0))
    val jpeg = Array(0xFF, 0xD8).map(_.toByte) ++ app1 ++ sof ++
      Array(0xFF, 0xD9).map(_.toByte)
    assert(ImageHeader.parse(jpeg) === ImageInfo("jpeg", 5, 7, 1, 8))
  }

  test("progressive SOF2 and SOF after a COM segment") {
    def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val com = Array(0xFF, 0xFE).map(_.toByte) ++ be16(5) ++
      "abc".getBytes("US-ASCII")
    val sof2 = Array(0xFF, 0xC2).map(_.toByte) ++ be16(11) ++
      (Array[Byte](8) ++ be16(1080) ++ be16(1920) ++ Array[Byte](1, 0x11, 0))
    val jpeg = Array(0xFF, 0xD8).map(_.toByte) ++ com ++ sof2 ++
      Array(0xFF, 0xD9).map(_.toByte)
    assert(ImageHeader.parse(jpeg) === ImageInfo("jpeg", 1920, 1080, 1, -1))
  }

  test("BMP variants: core header and top-down negative height") {
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, (v >>> 24).toByte)
    val core = "BM".getBytes("US-ASCII") ++ le32(26) ++ le32(0) ++ le32(26) ++
      le32(12) ++ le16(320) ++ le16(200) ++ le16(1) ++ le16(24)
    assert(ImageHeader.parse(core) === ImageInfo("bmp", 320, 200, 3, -1))
    val topDown = "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(640) ++ le32(-480) ++ le16(1) ++ le16(24) ++
      Array.fill[Byte](24)(0)
    assert(ImageHeader.parse(topDown) === ImageInfo("bmp", 640, 480, 3, -1))
  }

  test("0xFF fill bytes before markers are skipped (B.1.1.2 padding)") {
    def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    // SOI, two fill bytes, COM, three fill bytes, SOF0 5x7, EOI
    val com = Array(0xFF, 0xFE).map(_.toByte) ++ be16(4) ++
      "hi".getBytes("US-ASCII")
    val sof = Array(0xFF, 0xC0).map(_.toByte) ++ be16(11) ++
      (Array[Byte](8) ++ be16(7) ++ be16(5) ++ Array[Byte](1, 0x11, 0))
    val jpeg = Array(0xFF, 0xD8).map(_.toByte) ++
      Array(0xFF.toByte, 0xFF.toByte) ++ com ++
      Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++ sof ++
      Array(0xFF, 0xD9).map(_.toByte)
    assert(ImageHeader.parse(jpeg) === ImageInfo("jpeg", 5, 7, 1, -1))
  }

  test("adversarial EXIF IFD offsets never throw: negative wrap and out-of-range") {
    def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Long) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def jpegWithIfdOff(off: Long): Array[Byte] = {
      val tiff = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(off) ++
        Array.fill[Byte](8)(0)
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      Array(0xFF, 0xD8).map(_.toByte) ++
        Array(0xFF, 0xE1).map(_.toByte) ++ be16(payload.length + 2) ++ payload ++
        Array(0xFF, 0xD9).map(_.toByte)
    }
    // 0x80000080 wraps negative through .toInt; 0xFFFFFFFF is the all-ones
    // extreme; a large positive in-u32 offset lands far past the buffer
    for (off <- Seq(0x80000080L, 0xFFFFFFFFL, 1000000L)) {
      val info = ImageHeader.parse(jpegWithIfdOff(off))
      assert(info.format === "jpeg" && info.orientation === -1,
        s"ifd offset $off must classify, not throw")
    }
  }

  test("truncated, non-image, and null inputs never throw") {
    val png = Multimodal.BlobBuilders.png(640, 480)
    for (cut <- 0 to png.length)
      ImageHeader.parse(png.take(cut)) // total: must not throw
    assert(ImageHeader.parse(png.take(12)) === ImageHeader.Unknown)
    val jpeg = Multimodal.BlobBuilders.jpegWithExif(10, 10, 3)
    for (cut <- 0 to jpeg.length) ImageHeader.parse(jpeg.take(cut))
    assert(ImageHeader.parse("plain text".getBytes("UTF-8")) ===
      ImageHeader.Unknown)
    assert(ImageHeader.parse(Array.empty[Byte]) === ImageHeader.Unknown)
    assert(ImageHeader.parse(null) === ImageHeader.Unknown)
    // a desynced jpeg (garbage after SOI) keeps what it has, no throw
    ImageHeader.parse(Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00).map(_.toByte))
  }

  test("end-to-end query agrees with a driver-side reparse") {
    val rows = Multimodal.multimodalImageHeaders(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(rows.length === docs)
    val byClass = rows.groupBy(_.getLong(0) % 5)
    assert(byClass(0L).forall(_.getString(1) == "png"))
    assert(byClass(3L).forall(r =>
      r.getString(1) == "jpeg" &&
        r.getInt(5) == 1 + (r.getLong(0) % 8).toInt))
    assert(byClass(4L).forall(r =>
      r.getString(1) == "unknown" && r.getInt(2) == -1))
  }
}
