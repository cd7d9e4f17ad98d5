package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition decode.
  *
  * The DRIVER-FACING decode surface is the real kernel: [[ImageHeader]]
  * parses genuine PNG/GIF/BMP/JPEG+EXIF container bytes with a full
  * DuckDB oracle (`multimodal_image_headers`). The container has no
  * PIXEL codecs, so full-raster decode remains the documented codec
  * boundary — the same boundary class as the Kafka broker for the
  * stream source — carried by [[FakeDecoder]], a clearly-marked
  * deterministic stand-in that exists to pin everything Spark-side: the
  * binary column representation, the batched `mapPartitions` execution
  * shape (decode libraries amortize per-batch setup — same contract as
  * an Arrow-batched pandas UDF), the typed output schema, and
  * partition-parallelism. Swapping [[FakeDecoder]] for a JNI/codec call
  * changes no plan shape. The former `multimodal_decode_stub` driver
  * query was RETIRED once the real header kernel landed (it was the
  * inventory's last simulated-compute entry); the stub shape stays
  * spec-pinned (`MultimodalSpec`), not driver-published.
  *
  * At 100 TB: media blobs dominate row size, so the pipeline projects
  * (id, blob) only — column pruning keeps metadata-only queries off the
  * heavy bytes — and decode parallelism is governed purely by input
  * partitioning (`spark.sql.files.maxPartitionBytes`), no shuffle.
  */
object Multimodal {

  /** Decoded media features (one per blob). */
  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      checksum: Long)

  /** STUB decode kernel — stands in for an image/audio decoder, which this
    * environment does not ship. Deterministic pure function of the bytes
    * (no I/O, no randomness) so tests and the driver's rows-only check are
    * stable. A real deployment replaces `decode` with the codec call; the
    * batch contract (`decodeBatch`) is what the engine depends on.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Long) = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xFF); i += 1 }
      val w = 64 + (math.abs(sum % 193)).toInt
      val h = 64 + (math.abs((sum / 193) % 157)).toInt
      (w, h, 3, sum)
    }

    /** Batched entry point — real decoders amortize context setup per batch. */
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeature] =
      batch.map { case (id, bytes) =>
        val (w, h, c, sum) = decode(bytes)
        MediaFeature(id, bytes.length, w, h, c, sum)
      }
  }

  /** Documents' text reinterpreted as an opaque media blob column — the
    * representative (id, binary, metadata) multimodal table shape.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"),
        col("source"), col("n_chars"))

  /** Batched per-partition decode: binary in, typed features out. Batch
    * size 64 mirrors an Arrow batch; the iterator never materializes the
    * whole partition.
    */
  def decodeFeatures(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows =>
        rows.grouped(64).flatMap(batch => FakeDecoder.decodeBatch(batch)))
  }

  /** Resized-image features (STUB kernel: a real implementation calls the
    * codec's scaler; dimensions derive deterministically from the decode
    * stub so the pipeline shape — decode → resize → features — is real).
    */
  final case class ResizedFeature(
      doc_id: Long, width: Int, height: Int, scale_w: Int, scale_h: Int)

  /** Frame-sample features for "video" blobs (STUB: frames are fixed-size
    * byte windows; a real implementation seeks keyframes). One row per
    * sampled frame — the explode-shaped output a frame pipeline needs.
    */
  final case class FrameFeature(
      doc_id: Long, frame_idx: Int, offset: Int, frame_checksum: Long)

  /** Decode → resize to a bounding box, preserving the batched
    * mapPartitions shape.
    */
  def resizeFeatures(s: SparkSession, dir: String,
                     maxW: Int = 224, maxH: Int = 224): Dataset[ResizedFeature] = {
    import s.implicits._
    decodeFeatures(s, dir).mapPartitions(_.map { f =>
      // STUB scaler arithmetic (fit-within, integer): real impl calls the lib
      val sw = math.min(maxW, f.width)
      val sh = math.min(maxH, f.height)
      ResizedFeature(f.doc_id, f.width, f.height, sw, sh)
    })
  }

  /** Sample every `stride`-th fixed-size frame window from each blob. */
  def frameSample(s: SparkSession, dir: String,
                  frameBytes: Int = 32, stride: Int = 4): Dataset[FrameFeature] = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).map { i =>
          val off = i * frameBytes
          var sum = 0L
          var j = off
          while (j < off + frameBytes) { sum = sum * 31 + (bytes(j) & 0xFF); j += 1 }
          FrameFeature(id, i, off, sum)
        }
      })
  }

  // ---- real-kernel path: image container headers --------------------

  /** Minimal REAL format-conformant header bytes, built per row to give
    * [[ImageHeader]] a mixed-format corpus. These are genuine container
    * layouts (the spec cross-validates the parser against images written
    * by `javax.imageio` itself); payload/CRC bytes are zeroed where the
    * format tolerates it because header extraction never reads them.
    */
  private[multimodal] object BlobBuilders {
    private def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def be32(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, (v >>> 24).toByte)

    /** PNG signature + IHDR (colour type 6 = RGBA ⇒ 4 components). */
    def png(w: Int, h: Int): Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bit depth, colour, ..., CRC

    /** GIF89a logical screen descriptor. */
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0, 0, 0)

    /** BMP file header + BITMAPINFOHEADER. */
    def bmp(w: Int, h: Int): Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        Array.fill[Byte](24)(0)

    /** JPEG: SOI, APP1 carrying a little-endian EXIF orientation IFD,
      * then a baseline SOF0 (3 components) and EOI.
      */
    def jpegWithExif(w: Int, h: Int, orientation: Int): Array[Byte] = {
      val tiff =
        "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++ // header, IFD0 @8
          le16(1) ++ // one entry
          le16(0x0112) ++ le16(3) ++ le32(1) ++ le16(orientation) ++ le16(0) ++
          le32(0) // next-IFD terminator
      val exifPayload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val app1 = Array(0xFF, 0xE1).map(_.toByte) ++
        be16(exifPayload.length + 2) ++ exifPayload
      val sofPayload = Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3) ++
        Array[Byte](1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
      val sof0 = Array(0xFF, 0xC0).map(_.toByte) ++
        be16(sofPayload.length + 2) ++ sofPayload
      Array(0xFF, 0xD8).map(_.toByte) ++ app1 ++ sof0 ++
        Array(0xFF, 0xD9).map(_.toByte)
    }
  }

  /** One row of parsed header facts per blob. */
  final case class HeaderRow(doc_id: Long, format: String, width: Int,
                             height: Int, components: Int, orientation: Int,
                             n_bytes: Int)

  /** Header extraction over a mixed-format blob corpus — the REAL kernel
    * (magic-byte classification + container-header field reads +
    * EXIF-orientation walk, [[ImageHeader]]), in the same batched
    * `mapPartitions` shape as the decode stub. The corpus derives
    * deterministic real header bytes from each doc's metadata (4 image
    * formats + raw text bytes as the non-image class), so the query is
    * FULLY oracled: DuckDB recomputes the expected fields arithmetically
    * and a hash mismatch convicts any misread header byte — a
    * round-trip gate on the parser, with `ImageHeaderSpec` supplying the
    * independent ground truth (javax.imageio-written images + golden
    * EXIF arrays).
    */
  def multimodalImageHeaders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.grouped(64).flatMap { batch =>
        val blobs = batch.map { case (id, text, nChars) =>
          val w = 1 + (nChars % 1000).toInt
          val h = 1 + (id % 800).toInt
          val bytes = (id % 5) match {
            case 0 => BlobBuilders.png(w, h)
            case 1 => BlobBuilders.gif(w, h)
            case 2 => BlobBuilders.bmp(w, h)
            case 3 => BlobBuilders.jpegWithExif(w, h, 1 + (id % 8).toInt)
            case _ =>
              // 0x00 sentinel: no container magic starts with a NUL, so
              // the non-image class can never collide with one (raw text
              // CAN legitimately start with "BM" or "GIF8" — that's a
              // true-positive for the classifier, but this query's
              // oracle needs the class to be deterministic by doc_id)
              (0: Byte) +: text.getBytes("UTF-8")
          }
          id -> bytes
        }
        ImageHeader.parseBatch(blobs).map { case (id, info, nBytes) =>
          HeaderRow(id, info.format, info.width, info.height,
            info.components, info.orientation, nBytes)
        }
      })
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** The oracle recomputes every parsed field arithmetically from the
    * same (doc_id, n_chars) the builders used — plus the byte count each
    * builder emits: png 33, gif 13, bmp 54 header bytes, jpeg 59
    * (2 SOI + 36 APP1 + 19 SOF0 + 2 EOI).
    */
  private val multimodalImageHeadersSql =
    """SELECT doc_id,
      |  CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |    WHEN 2 THEN 'bmp' WHEN 3 THEN 'jpeg' ELSE 'unknown' END AS format,
      |  CASE WHEN doc_id % 5 <= 3 THEN CAST(1 + n_chars % 1000 AS INT)
      |    ELSE -1 END AS width,
      |  CASE WHEN doc_id % 5 <= 3 THEN CAST(1 + doc_id % 800 AS INT)
      |    ELSE -1 END AS height,
      |  CASE doc_id % 5 WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 3
      |    WHEN 3 THEN 3 ELSE -1 END AS components,
      |  CASE WHEN doc_id % 5 = 3 THEN CAST(1 + doc_id % 8 AS INT)
      |    ELSE -1 END AS orientation,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 33 WHEN 1 THEN 13 WHEN 2 THEN 54
      |    WHEN 3 THEN 59 ELSE octet_length(CAST(text AS BLOB)) + 1 END AS INT)
      |    AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- real-kernel path: full-raster pixel decode --------------------

  /** Per-image pixel statistics (exact integer sums + one closing
    * division — the `embedding_centroids` discipline).
    */
  final case class PixelStats(
      doc_id: Long, format: String, width: Int, height: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      min_r: Int, max_r: Int, min_g: Int, max_g: Int, min_b: Int, max_b: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic DECODABLE image fixtures + the in-JDK decode kernel.
    * Pixel channels are pure integer functions of (doc_id, x, y); the
    * fixtures are encoded through `javax.imageio`'s REAL writers and the
    * stats are computed from `ImageIO.read`-DECODED rasters only — so the
    * query round-trips genuine PNG/BMP/GIF codec paths and the DuckDB
    * oracle can still recompute every field arithmetically. Formats are
    * restricted to the classes whose JDK round trip is MEASURED exact:
    * PNG and BMP (full 24-bit RGB). GIF was tried (grayscale formula +
    * explicit 256-entry palette, raster-direct writes) and EXCLUDED on
    * evidence: the in-JDK GIF codec loses whole rows on some geometries
    * (e.g. 37×3 — row 1 decodes as all index 0; 17 of 166 fixture
    * shapes mismatched), so its pixels are not contract-grade. JPEG
    * pixels are codec-defined (IDCT rounding varies by decoder). Both
    * stay on the header kernel ([[multimodalImageHeaders]]) — the
    * boundary is now honest AND minimal: pixel content enters the
    * engine through every codec whose round trip is exact.
    */
  private[multimodal] object PixelFixtures {
    def dims(id: Long, nChars: Long): (Int, Int) =
      (1 + (nChars % 40).toInt, 1 + (id % 30).toInt)

    def formatOf(id: Long): String = if (id % 2 == 0) "png" else "bmp"

    /** The declared pixel formulas — what both the builder and the
      * DuckDB oracle compute.
      */
    def rgbAt(id: Long, x: Int, y: Int): (Int, Int, Int) =
      (((id * 7 + x * 31 + y * 17) % 256).toInt,
        ((id * 11 + x * 13 + y * 29) % 256).toInt,
        ((id * 3 + x * 23 + y * 19) % 256).toInt)

    /** Real encoded bytes via the JDK writer for `formatOf(id)`. */
    def encode(id: Long, nChars: Long): Array[Byte] = {
      val (w, h) = dims(id, nChars)
      val fmt = formatOf(id)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = rgbAt(id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, out),
        s"no in-JDK writer for $fmt")
      out.toByteArray
    }

    /** Decode + aggregate: every stat comes from the DECODED raster. */
    def statsOf(id: Long, fmt: String, blob: Array[Byte]): PixelStats = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      require(img != null, s"undecodable $fmt blob for doc $id")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var (mnr, mxr, mng, mxg, mnb, mxb) = (255, 0, 255, 0, 255, 0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
          sr += r; sg += g; sb += b
          if (r < mnr) mnr = r; if (r > mxr) mxr = r
          if (g < mng) mng = g; if (g > mxg) mxg = g
          if (b < mnb) mnb = b; if (b > mxb) mxb = b
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      PixelStats(id, fmt, w, h, n, sr, sg, sb, mnr, mxr, mng, mxg, mnb, mxb,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  /** Full-raster pixel statistics over real codec round trips — the
    * operator that retires the "no pixel decode in-sandbox" boundary:
    * deterministic fixtures are ENCODED through `javax.imageio`'s PNG/
    * BMP/GIF writers and every emitted stat is aggregated from the
    * `ImageIO.read`-DECODED raster, batched `mapPartitions` like every
    * media kernel here (per-batch codec reuse, no shuffle, parallelism =
    * input partitioning). Fully oracled: the DuckDB side regenerates the
    * declared per-pixel formulas and aggregates them — any codec-path
    * bias, channel swap, row-order bug, or palette drift hash-mismatches.
    * `PixelStatsSpec` additionally cross-checks the decoded dimensions
    * against the independent [[ImageHeader]] parser on the same blobs.
    */
  def multimodalPixelStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, nChars) =>
        PixelFixtures.statsOf(id, PixelFixtures.formatOf(id),
          PixelFixtures.encode(id, nChars))
      }))
      .toDF()
      .orderBy(col("doc_id"))
  }

  private val multimodalPixelStatsSql =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + n_chars % 40 AS INT) AS w,
      |         CAST(1 + doc_id % 30 AS INT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS p FROM d),
      |ch AS (
      |  SELECT doc_id, w, h,
      |    (doc_id*7 + (p % w)*31 + (p // w)*17) % 256 AS r,
      |    (doc_id*11 + (p % w)*13 + (p // w)*29) % 256 AS g,
      |    (doc_id*3 + (p % w)*23 + (p // w)*19) % 256 AS b
      |  FROM px),
      |a AS (
      |  SELECT doc_id, w, h, CAST(COUNT(*) AS BIGINT) AS n_px,
      |    CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g,
      |    CAST(SUM(b) AS BIGINT) AS sum_b,
      |    CAST(MIN(r) AS INT) AS min_r, CAST(MAX(r) AS INT) AS max_r,
      |    CAST(MIN(g) AS INT) AS min_g, CAST(MAX(g) AS INT) AS max_g,
      |    CAST(MIN(b) AS INT) AS min_b, CAST(MAX(b) AS INT) AS max_b
      |  FROM ch GROUP BY 1, 2, 3)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
      |  w AS width, h AS height, n_px, sum_r, sum_g, sum_b,
      |  min_r, max_r, min_g, max_g, min_b, max_b,
      |  CAST(sum_r AS DOUBLE) / n_px AS mean_r,
      |  CAST(sum_g AS DOUBLE) / n_px AS mean_g,
      |  CAST(sum_b AS DOUBLE) / n_px AS mean_b
      |FROM a ORDER BY doc_id""".stripMargin

  private type Q = (SparkSession, String) => DataFrame

  /** Blob-level stats computed without decoding — the metadata-only path
    * that must never touch a decoder (oracle-checked).
    */
  def multimodalBlobStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        // slice CHARACTERS then encode, matching the oracle — a byte slice
        // could split a multibyte codepoint and diverge on non-ASCII text
        lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("header"),
        col("source"))
      .orderBy(col("doc_id"))

  private val multimodalBlobStatsSql =
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  lower(hex(CAST(substring(text, 1, 8) AS BLOB))) AS header,
      |  source
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Byte budget per packed media shard (the tar/webdataset granularity). */
  val shardBudgetBytes = 16384L

  /** Shard assignment for media blobs: pack each source's blobs into
    * fixed-byte-budget shards from a running byte total — the step that
    * turns a blob table into webdataset-style training shards. Same
    * deterministic prefix-sum pattern as the text packer: per-source
    * windows run in parallel, shards never span sources, and sizes come
    * from the METADATA column (`n_chars` — `length(blob)` would force
    * reading every blob), so the assignment pass never moves a byte of
    * media; column pruning keeps the blob out of the scan entirely.
    */
  def multimodalPackShards(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    mediaTable(s, dir)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_bytes"))
      .withColumn("cum_bytes", sum(col("n_bytes")).over(w))
      .withColumn("shard", expr(s"(cum_bytes - n_bytes) div $shardBudgetBytes"))
      .orderBy(col("source"), col("doc_id"))
  }

  private val multimodalPackShardsSql =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(n_chars AS BIGINT) AS n_bytes,
       |    CAST(SUM(n_chars) OVER (
       |      PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
       |  FROM documents)
       |SELECT doc_id, source, n_bytes, cum_bytes,
       |       (cum_bytes - n_bytes) // $shardBudgetBytes AS shard
       |FROM t ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "multimodal_blob_stats" -> (multimodalBlobStats _),
    "multimodal_image_headers" -> (multimodalImageHeaders _),
    "multimodal_pixel_stats" -> (multimodalPixelStats _),
    "multimodal_pack_shards" -> (multimodalPackShards _))

  val oracles: Map[String, String] = Map(
    "multimodal_blob_stats" -> multimodalBlobStatsSql,
    "multimodal_image_headers" -> multimodalImageHeadersSql,
    "multimodal_pixel_stats" -> multimodalPixelStatsSql,
    "multimodal_pack_shards" -> multimodalPackShardsSql)
}
