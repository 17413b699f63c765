package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside — the layout a 100 TB multimodal corpus uses
  * (parquet binary + stats, partition-prunable metadata). Image decode
  * is REAL (JDK `javax.imageio`, header-only, per-partition reader
  * reuse); only non-image codecs (audio/video, which the JDK does not
  * ship) remain a clearly-marked deterministic stub.
  */
object Multimodal {

  /** Typed media record: `content` is the raw payload; metadata travels
    * in plain columns so filters prune without touching bytes. */
  final case class MediaRecord(media_id: Long, media_type: String, source: String, content: Array[Byte])

  /** `decoded` is true only when a real codec parsed the payload; stubbed
    * or failed decodes carry it false so downstream filters can separate
    * measured dimensions from placeholders. */
  final case class MediaFeatures(media_id: Long, media_type: String, byte_len: Long,
                                 checksum: Long, width: Int, height: Int, decoded: Boolean)

  /** Attach binary payload + metadata columns to a DataFrame with a
    * string column (stand-in for real media bytes in the test corpus). */
  def asMedia(df: DataFrame, id: String, payload: String, mediaType: String, source: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(source).as("source"),
      encode(col(payload), "UTF-8").as("content"))

  /** Cheap, fully-native binary metrics (no decode): byte length, CRC32
    * checksum, SHA-256 digest (hex — engine-portable, so external
    * verifiers can re-derive it), hex prefix. These run codegen'd at
    * scan speed and are the first-pass filter before any expensive
    * decode. */
  def withBinaryMetrics(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", length(col("content")).cast("long"))
      .withColumn("checksum", crc32(col("content")))
      .withColumn("sha256", sha2(col("content"), 256))
      .withColumn("head_hex", hex(substring(col("content"), 1, 4)))

  /** Container format sniffed from magic bytes — trusted over the claimed
    * `media_type` (a corpus's declared MIME types are routinely wrong;
    * the bytes are not). Formats are the four the JDK decodes natively. */
  def sniffImageFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    // "BM" alone is 2 bytes — 1/65536 of arbitrary payloads match it, so
    // also require a known DIB header size at offset 14 before routing
    // bytes into the BMP parser (which may not throw on garbage)
    else if (b.length >= 18 && b(0) == 'B' && b(1) == 'M' &&
        Set(12, 40, 52, 56, 64, 108, 124).contains(
          (b(14) & 0xFF) | ((b(15) & 0xFF) << 8) | ((b(16) & 0xFF) << 16) | ((b(17) & 0xFF) << 24)))
      Some("bmp")
    else None

  /** Header-only image dimensions via a REUSED per-partition
    * `ImageReader`: `getWidth(0)`/`getHeight(0)` parse the container
    * header without decoding pixel data, so cost is O(header bytes) per
    * record regardless of image size — the metadata-extraction fast path
    * a 100 TB image corpus needs. Corrupt/truncated payloads return
    * None rather than failing the task. */
  private def headerDims(
      readers: scala.collection.mutable.Map[String, javax.imageio.ImageReader],
      fmt: String,
      bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      val reader = readers.getOrElseUpdate(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        require(it.hasNext, s"no JDK ImageReader for $fmt")
        it.next()
      })
      // memory-cached stream (no executor-disk temp files)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        Some((reader.getWidth(0), reader.getHeight(0)))
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  // ======================================================================
  // STUB: non-image decode. The JDK ships no audio/video codecs, so
  // dimensions for non-image media derive DETERMINISTICALLY from the
  // payload bytes (decoded=false marks them as placeholders). A
  // production build swaps this one function for an ffmpeg binding held
  // per-partition exactly like the image readers above.
  // ======================================================================
  private def stubDecode(content: Array[Byte]): (Int, Int) = {
    val n = content.length
    (64 + n % 64, 64 + (n / 64) % 64) // fake width/height — deterministic
  }

  /** Partition-parallel feature extraction over media records.
    * `mapPartitions` so codec state initializes ONCE per partition: one
    * reusable CRC32 and one `ImageReader` per image format, never
    * per-row. Records stream through in batches so a batched codec API
    * amortizes per-call overhead. Decode routing: payloads whose magic
    * bytes identify a JDK-decodable image get REAL header dimensions;
    * undecodable payloads claiming an image MIME type get (-1, -1);
    * everything
    * else (audio/video) gets the labeled stub. Output is a typed Dataset
    * with a stable schema for downstream SQL. */
  /** A generated thumbnail: re-encoded PNG bytes + final dimensions.
    * `ok = false` (empty bytes, -1×-1) marks undecodable payloads. */
  final case class Thumbnail(media_id: Long, width: Int, height: Int,
                             thumb_png: Array[Byte], ok: Boolean)

  /** REAL image resize: full pixel decode (`ImageIO.read`), aspect-
    * preserving bilinear scale to fit `maxDim` (never upscales), PNG
    * re-encode — the thumbnail/normalize step of a multimodal training
    * pipeline, all JDK (headless `Graphics2D`), no native deps.
    *
    * Unlike [[extractFeatures]]'s header-only fast path this touches
    * every pixel, so it belongs AFTER metadata filters have pruned the
    * corpus (decode cost is O(pixels); run it on the survivors, not the
    * 100 TB raw table). `mapPartitions` keeps the per-task codec
    * footprint allocated once; undecodable payloads yield `ok = false`
    * rather than failing the task. */
  def thumbnails(spark: SparkSession, media: DataFrame, maxDim: Int = 256): Dataset[Thumbnail] = {
    import spark.implicits._
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) Thumbnail(id, -1, -1, Array.empty, ok = false)
            else {
              val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
              val (tw, th) = (math.max(1, math.round(img.getWidth * scale).toInt),
                math.max(1, math.round(img.getHeight * scale).toInt))
              val out = new java.awt.image.BufferedImage(tw, th,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, tw, th, null)
              } finally g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              Thumbnail(id, tw, th, baos.toByteArray, ok = true)
            }
          } catch {
            case scala.util.control.NonFatal(_) => Thumbnail(id, -1, -1, Array.empty, ok = false)
          }
        }
      }
  }

  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media_type", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val crc = new java.util.zip.CRC32() // per-partition codec state
        val readers = scala.collection.mutable.Map[String, javax.imageio.ImageReader]()
        // release reader resources at task completion — the reliable hook
        // even when the consumer stops early (e.g. a LIMIT drains only
        // part of the partition and an end-of-iterator cleanup never runs)
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          readers.valuesIterator.foreach(_.dispose())
        })
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary: a batched codec would decode `batch` in one call
          batch.map { case (id, mt, bytes) =>
            crc.reset()
            crc.update(bytes)
            val (w, h, decoded) = sniffImageFormat(bytes).flatMap(headerDims(readers, _, bytes)) match {
              case Some((rw, rh)) => (rw, rh, true)
              case None if mt.startsWith("image/") => (-1, -1, false)
              case None => val (sw, sh) = stubDecode(bytes); (sw, sh, false)
            }
            MediaFeatures(id, mt, bytes.length.toLong, crc.getValue, w, h, decoded)
          }
        }
      }
  }
}
