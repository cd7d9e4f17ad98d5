package graft.multimodal

/** REAL pure-JVM image-header parsing — the one multimodal kernel whose
  * compute is not simulated. Header/metadata extraction needs no codec
  * library: container formats put dimensions in fixed-layout byte fields
  * (PNG IHDR, GIF logical screen descriptor, BMP DIB header) or in a
  * walkable segment stream (JPEG SOFn; EXIF orientation inside the APP1
  * TIFF IFD). This is exactly the "parse the header, skip the payload"
  * pass a 100 TB media-curation pipeline runs first — dimensions,
  * format, and orientation gate filtering/resizing decisions without
  * decoding a single pixel, so the scan stays byte-bounded by header
  * size, not media size.
  *
  * Unlike [[Multimodal.FakeDecoder]] (which stands in for a pixel
  * decoder this container cannot ship), every branch here is real and
  * golden-byte tested (`ImageHeaderSpec`): hand-assembled PNG / GIF /
  * BMP / JPEG (baseline + progressive + EXIF APP1, both TIFF
  * endiannesses) byte arrays in, exact dimensions out; truncated and
  * non-image bytes classify as `unknown` rather than throwing — a
  * corrupt blob must never kill a 10^9-row scan.
  */
object ImageHeader {

  /** Parsed header facts. `format` is `png|jpeg|gif|bmp|unknown`;
    * dimensions are -1 when not determinable (unknown format or
    * truncated header); `orientation` is the EXIF tag 0x0112 value
    * (1-8) when present, else -1.
    */
  final case class ImageInfo(format: String, width: Int, height: Int,
                             components: Int, orientation: Int)

  val Unknown: ImageInfo = ImageInfo("unknown", -1, -1, -1, -1)

  // bounds-checked reads, BOTH ends (truncation ⇒ None, never a throw;
  // the lower bound matters because offsets read FROM the file — the
  // EXIF IFD0 offset — can be adversarially huge and wrap negative
  // through .toInt)
  private def u8(b: Array[Byte], i: Int): Option[Int] =
    if (i >= 0 && i < b.length) Some(b(i) & 0xFF) else None
  private def u16be(b: Array[Byte], i: Int): Option[Int] =
    if (i >= 0 && i + 1 < b.length)
      Some(((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF))
    else None
  private def u16le(b: Array[Byte], i: Int): Option[Int] =
    if (i >= 0 && i + 1 < b.length)
      Some(((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF))
    else None
  private def u32be(b: Array[Byte], i: Int): Option[Long] =
    if (i >= 0 && i + 3 < b.length)
      Some(((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL))
    else None
  private def u32le(b: Array[Byte], i: Int): Option[Long] =
    if (i >= 0 && i + 3 < b.length)
      Some(((b(i + 3) & 0xFFL) << 24) | ((b(i + 2) & 0xFFL) << 16) |
        ((b(i + 1) & 0xFFL) << 8) | (b(i) & 0xFFL))
    else None
  private def s32le(b: Array[Byte], i: Int): Option[Int] =
    u32le(b, i).map(_.toInt)

  private def startsWith(b: Array[Byte], magic: Int*): Boolean =
    magic.length <= b.length &&
      magic.zipWithIndex.forall { case (m, i) => (b(i) & 0xFF) == m }

  /** PNG: 8-byte signature, then the IHDR chunk (length+type+payload);
    * width/height are the first two big-endian u32 of the payload,
    * colour type at payload+9 maps to a component count.
    */
  private def parsePng(b: Array[Byte]): ImageInfo = {
    // signature 89 50 4E 47 0D 0A 1A 0A; IHDR must be the first chunk
    val p = 8 + 8 // skip signature + IHDR length/type
    (for {
      w <- u32be(b, p)
      h <- u32be(b, p + 4)
      colorType <- u8(b, p + 9)
    } yield {
      val comps = colorType match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolour
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolour + alpha
        case _ => -1
      }
      ImageInfo("png", w.toInt, h.toInt, comps, -1)
    }).getOrElse(Unknown)
  }

  /** GIF87a/89a: dimensions are the little-endian u16 pair right after
    * the 6-byte version signature (logical screen descriptor).
    */
  private def parseGif(b: Array[Byte]): ImageInfo =
    (for {
      w <- u16le(b, 6)
      h <- u16le(b, 8)
    } yield ImageInfo("gif", w, h, 3, -1)).getOrElse(Unknown)

  /** BMP: "BM", file header (14 bytes), then a DIB header whose first
    * u32 is its own size. BITMAPINFOHEADER (≥40) carries s32 width and
    * s32 height (negative height = top-down rows — report magnitude);
    * the ancient BITMAPCOREHEADER (12) carries u16 pairs.
    */
  private def parseBmp(b: Array[Byte]): ImageInfo =
    u32le(b, 14) match {
      case Some(12) =>
        (for { w <- u16le(b, 18); h <- u16le(b, 20) }
          yield ImageInfo("bmp", w, h, 3, -1)).getOrElse(Unknown)
      case Some(sz) if sz >= 40 =>
        (for { w <- s32le(b, 18); h <- s32le(b, 22) }
          yield ImageInfo("bmp", w, math.abs(h), 3, -1)).getOrElse(Unknown)
      case _ => Unknown
    }

  /** EXIF orientation out of a JPEG APP1 payload: "Exif\0\0", then a
    * self-contained TIFF stream (own endianness marker "II"/"MM", IFD0
    * offset, then IFD0's 12-byte tag entries — tag 0x0112, SHORT, value
    * inline in the offset field's first two bytes).
    */
  private def exifOrientation(b: Array[Byte], app1Start: Int, app1Len: Int): Int = {
    val tiff = app1Start + 6 // past "Exif\0\0"
    // every IFD read is clamped to the APP1 SEGMENT, not the whole file:
    // an offset pointing past the payload (but inside the buffer) must
    // not walk other segments' or entropy bytes as IFD entries
    val segEnd = math.min(b.length.toLong, app1Start.toLong + app1Len)
    if (app1Len < 14 || tiff + 8 > segEnd) return -1
    val little = (b(tiff) & 0xFF) == 0x49 && (b(tiff + 1) & 0xFF) == 0x49
    val big = (b(tiff) & 0xFF) == 0x4D && (b(tiff + 1) & 0xFF) == 0x4D
    if (!little && !big) return -1
    def rd16(i: Int): Option[Int] =
      if (i.toLong + 2 > segEnd) None
      else if (little) u16le(b, i) else u16be(b, i)
    def rd32(i: Int): Option[Long] =
      if (i.toLong + 4 > segEnd) None
      else if (little) u32le(b, i) else u32be(b, i)
    (for {
      ifdOff <- rd32(tiff + 4)
      // a crafted u32 offset ≥ 2^31 would wrap negative through .toInt;
      // reject anything that cannot point inside the segment
      if ifdOff >= 0 && tiff.toLong + ifdOff <= segEnd
      ifd = tiff + ifdOff.toInt
      nEntries <- rd16(ifd)
    } yield {
      var e = 0
      var out = -1
      while (e < nEntries && out < 0) {
        val entry = ifd + 2 + e * 12
        (rd16(entry), rd16(entry + 2)) match {
          case (Some(0x0112), Some(3)) => // tag=Orientation, type=SHORT
            // the documented contract is 1-8; anything else (corrupt
            // value, or stray bytes matching the tag pattern) is "absent"
            out = rd16(entry + 8).filter(v => v >= 1 && v <= 8).getOrElse(-1)
          case _ => ()
        }
        e += 1
      }
      out
    }).getOrElse(-1)
  }

  /** JPEG: walk the marker-segment stream from SOI. Each segment is
    * FF <marker> <u16 length incl. itself>; dimensions live in the
    * first SOFn frame header (baseline 0xC0, extended 0xC1, progressive
    * 0xC2, lossless 0xC3, differential C5-C7, arithmetic C9-CB/CD-CF —
    * everything in C0-CF except DHT C4, JPG C8, and DAC CC); EXIF
    * orientation lives in an APP1 segment that may
    * precede or follow other APPn/COM segments.
    */
  private def parseJpeg(b: Array[Byte]): ImageInfo = {
    var i = 2 // past SOI
    var w = -1; var h = -1; var comps = -1; var orient = -1
    var done = false
    while (!done && i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) { done = true } // desynced: stop, keep what we have
      else {
        // B.1.1.2: any number of 0xFF fill bytes may pad before a marker
        var m = i + 1
        while (m < b.length && (b(m) & 0xFF) == 0xFF) m += 1
        if (m >= b.length) { done = true }
        else {
          val marker = b(m) & 0xFF
          val seg = m + 1 // u16 length position for length-carrying segments
          if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
            i = m + 1 // standalone markers carry no length
          } else if (marker == 0xD9 || marker == 0xDA || marker == 0x00) {
            done = true // EOI / start-of-scan / stuffed byte: headers over
          } else {
            val len = u16be(b, seg).getOrElse(-1)
            if (len < 2) { done = true }
            else {
              val isSof = marker >= 0xC0 && marker <= 0xCF &&
                marker != 0xC4 && marker != 0xC8 && marker != 0xCC
              if (isSof && w < 0) {
                // SOF payload: u8 precision, u16 height, u16 width, u8 ncomps
                h = u16be(b, seg + 3).getOrElse(-1)
                w = u16be(b, seg + 5).getOrElse(-1)
                comps = u8(b, seg + 7).getOrElse(-1)
              } else if (marker == 0xE1 && seg + 8 < b.length &&
                b(seg + 2) == 'E' && b(seg + 3) == 'x' && b(seg + 4) == 'i' &&
                b(seg + 5) == 'f' && b(seg + 6) == 0 && orient < 0) {
                orient = exifOrientation(b, seg + 2, len - 2)
              }
              i = seg + len
            }
          }
        }
      }
    }
    if (w < 0) Unknown.copy(format = "jpeg", orientation = orient)
    else ImageInfo("jpeg", w, h, comps, orient)
  }

  /** Classify by magic bytes and parse the matching header. Total:
    * any input (including truncated headers and arbitrary text bytes)
    * yields a row, never a throw.
    */
  def parse(b: Array[Byte]): ImageInfo =
    if (b == null) Unknown
    else if (startsWith(b, 0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
      parsePng(b)
    else if (startsWith(b, 0x47, 0x49, 0x46, 0x38) && b.length > 5 &&
      ((b(4) == '7' || b(4) == '9') && b(5) == 'a'))
      parseGif(b)
    else if (startsWith(b, 0x42, 0x4D)) parseBmp(b)
    else if (startsWith(b, 0xFF, 0xD8, 0xFF)) parseJpeg(b)
    else Unknown

  /** Batched entry point, mirroring [[Multimodal.FakeDecoder.decodeBatch]]'s
    * contract (real header parsers amortize nothing, but the engine-side
    * execution shape — batched mapPartitions — stays identical to the
    * decode kernels that do).
    */
  def parseBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, ImageInfo, Int)] =
    batch.map { case (id, bytes) =>
      (id, parse(bytes), if (bytes == null) 0 else bytes.length)
    }
}
