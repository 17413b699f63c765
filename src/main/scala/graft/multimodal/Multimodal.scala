package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside — the layout a 100 TB multimodal corpus uses
  * (parquet binary + stats, partition-prunable metadata). All decode is
  * REAL and pure-JDK: images via `javax.imageio` (header-only,
  * per-partition reader reuse), WAV/AIFF/AU via
  * `javax.sound.sampled`'s header parser, MP4/MOV via a defensive
  * ISO-BMFF box walk. Payloads matching no parseable container are
  * flagged `decoded = false` with sentinel fields — never fabricated
  * values, never a task failure.
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
  // Audio/video metadata — pure JDK, no native codecs: WAV (and AIFF/AU)
  // through javax.sound.sampled's header parser, MP4/MOV through a
  // defensive ISO-BMFF box walk (mvhd for timescale/duration, tkhd for
  // the video track's 16.16 fixed-point dimensions). Header-only, like
  // the image fast path: cost is O(header bytes) per record.
  // ======================================================================

  /** Audio/video container sniffed from magic bytes: RIFF/WAVE, ISO
    * base-media ftyp (mp4/mov/m4a), AIFF `FORM`, AU `.snd`. */
  def sniffAvFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Some("wav")
    else if (b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') Some("mp4")
    else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F') Some("aiff")
    else if (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') Some("au")
    else None

  /** Parsed audio stream properties (header-only; no sample decode). */
  final case class AudioMeta(durationMs: Long, sampleRate: Int, channels: Int, bitsPerSample: Int)

  /** WAV/AIFF/AU metadata via `javax.sound.sampled` — the JDK's own
    * header parser, so malformed payloads are ITS problem to reject
    * (wrapped to None, never a task failure). */
  def audioMetadata(bytes: Array[Byte]): Option[AudioMeta] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength
      val durMs =
        if (frames >= 0 && fmt.getFrameRate > 0)
          math.round(frames * 1000.0 / fmt.getFrameRate)
        else -1L
      Some(AudioMeta(durMs, math.round(fmt.getSampleRate),
        fmt.getChannels, fmt.getSampleSizeInBits))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parsed MP4 movie-header properties: presentation duration plus the
    * first video track's pixel dimensions (0×0 when no track carries
    * spatial extent, e.g. audio-only m4a). */
  final case class Mp4Meta(durationMs: Long, width: Int, height: Int)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** Children of ISO-BMFF range [start, end): (boxType, contentStart,
    * contentEnd) triples. Every offset is bounds-checked and sizes are
    * validated to strictly advance, so truncated or adversarial payloads
    * yield an empty walk instead of looping or throwing. */
  private def boxes(bytes: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    var sane = true
    while (sane && o + 8 <= end) {
      val size32 = be32(bytes, o)
      val tpe = new String(bytes, o + 4, 4, "ISO-8859-1")
      val (contentStart, boxEnd) =
        if (size32 == 1L && o + 16 <= end) (o + 16, o + be64(bytes, o + 8))
        else if (size32 == 0L) (o + 8, end.toLong) // box runs to end
        else (o + 8, o + size32)
      if (boxEnd > end || boxEnd <= o || contentStart > boxEnd) sane = false
      else {
        out += ((tpe, contentStart, boxEnd.toInt))
        o = boxEnd.toInt
      }
    }
    if (sane) out.result() else Seq.empty
  }

  private def findBox(bytes: Array[Byte], start: Int, end: Int, tpe: String): Option[(Int, Int)] =
    boxes(bytes, start, end).collectFirst { case (`tpe`, s, e) => (s, e) }

  /** ISO-BMFF box walk to the movie header + video-track dimensions. */
  def mp4Metadata(bytes: Array[Byte]): Option[Mp4Meta] = {
    def find(start: Int, end: Int, tpe: String): Option[(Int, Int)] = findBox(bytes, start, end, tpe)
    try {
      for {
        _ <- sniffAvFormat(bytes).filter(_ == "mp4")
        (moovS, moovE) <- find(0, bytes.length, "moov")
        (mvhdS, mvhdE) <- find(moovS, moovE, "mvhd")
        meta <- {
          val v = bytes(mvhdS) & 0xFF
          // v0: ver/flags 4, creation 4, modification 4, timescale 4, duration 4
          // v1: ver/flags 4, creation 8, modification 8, timescale 4, duration 8
          val (tsOff, durOff, dur64) = if (v == 1) (20, 24, true) else (12, 16, false)
          if (mvhdS + durOff + (if (dur64) 8 else 4) > mvhdE) None
          else {
            val timescale = be32(bytes, mvhdS + tsOff)
            val duration = if (dur64) be64(bytes, mvhdS + durOff) else be32(bytes, mvhdS + durOff)
            val durMs = if (timescale > 0) duration * 1000L / timescale else -1L
            // first trak whose tkhd carries nonzero 16.16 dimensions
            val dims = boxes(bytes, moovS, moovE).collect { case ("trak", s, e) => (s, e) }
              .flatMap { case (s, e) => find(s, e, "tkhd") }
              .flatMap { case (ts, te) =>
                val tv = bytes(ts) & 0xFF
                // width/height are the last 8 bytes of the fixed-size
                // body: ver/flags 4 + times/id/duration (20 v0, 32 v1)
                // + reserved 8 + layer/group/volume/reserved 8 +
                // matrix 36 → width at 76 (v0) / 88 (v1)
                val wOff = ts + (if (tv == 1) 88 else 76)
                if (wOff + 8 > te) None
                else Some(((be32(bytes, wOff) >> 16).toInt, (be32(bytes, wOff + 4) >> 16).toInt))
              }
              .find { case (w, h) => w > 0 && h > 0 }
            val (w, h) = dims.getOrElse((0, 0))
            Some(Mp4Meta(durMs, w, h))
          }
        }
      } yield meta
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One MP4 media sample: 1-based index, decode timestamp (media-
    * timescale → ms; DTS, not composition time — `ctts` b-frame offsets
    * are ignored, fine for every-Nth sampling), absolute file byte
    * offset, and byte length. */
  final case class Mp4Sample(idx: Int, dtsMs: Long, offset: Long, size: Long)

  /** Full per-sample table of the first VIDEO track (hdlr = `vide`;
    * falls back to the first track carrying a sample table): walks
    * `stts` (time-to-sample), `stsz` (sizes), `stsc` (sample-to-chunk)
    * and `stco`/`co64` (chunk offsets) — the four mandatory stbl boxes —
    * and lays samples out within their chunks exactly as a demuxer
    * would. Header-only: `mdat` payload bytes are never touched.
    *
    * This is what makes frame sampling cheap at corpus scale: the
    * expensive part (WHERE each frame lives) is answered from a few KB
    * of moov headers, and the reader then fetches exactly the chosen
    * (offset, size) ranges — object-store range GETs, not whole-file
    * decode. Malformed/truncated tables, inconsistent counts, or tables
    * above `maxSamples` (bounds the per-row memory a hostile payload
    * can demand) return None, never a task failure. */
  def mp4SampleTable(bytes: Array[Byte], maxSamples: Int = 1 << 20): Option[Vector[Mp4Sample]] =
    try {
      for {
        _ <- sniffAvFormat(bytes).filter(_ == "mp4")
        (moovS, moovE) <- findBox(bytes, 0, bytes.length, "moov")
        traks = boxes(bytes, moovS, moovE).collect { case ("trak", s, e) => (s, e) }
        mdias = traks.flatMap { case (s, e) => findBox(bytes, s, e, "mdia") }
        mdia <- mdias.find { case (s, e) =>
          // hdlr: ver/flags 4, pre_defined 4, handler_type 4
          findBox(bytes, s, e, "hdlr").exists { case (hs, he) =>
            hs + 12 <= he && new String(bytes, hs + 8, 4, "ISO-8859-1") == "vide" }
        }.orElse(mdias.find { case (s, e) =>
          findBox(bytes, s, e, "minf").exists { case (ms, me) =>
            findBox(bytes, ms, me, "stbl").isDefined } })
        (mdhdS, mdhdE) <- findBox(bytes, mdia._1, mdia._2, "mdhd")
        timescale <- {
          val v = bytes(mdhdS) & 0xFF
          val tsOff = if (v == 1) 20 else 12
          if (mdhdS + tsOff + 4 > mdhdE) None
          else Some(be32(bytes, mdhdS + tsOff)).filter(_ > 0)
        }
        (minfS, minfE) <- findBox(bytes, mdia._1, mdia._2, "minf")
        (stblS, stblE) <- findBox(bytes, minfS, minfE, "stbl")
        (sttsS, sttsE) <- findBox(bytes, stblS, stblE, "stts")
        (stszS, stszE) <- findBox(bytes, stblS, stblE, "stsz")
        (stscS, stscE) <- findBox(bytes, stblS, stblE, "stsc")
        chunkOffsets <- findBox(bytes, stblS, stblE, "stco")
          .flatMap { case (s, e) =>
            val n = be32(bytes, s + 4).toInt
            if (n < 0 || s + 8 + 4L * n > e) None
            else Some(Vector.tabulate(n)(i => be32(bytes, s + 8 + 4 * i)))
          }
          .orElse(findBox(bytes, stblS, stblE, "co64").flatMap { case (s, e) =>
            val n = be32(bytes, s + 4).toInt
            if (n < 0 || s + 8 + 8L * n > e) None
            else Some(Vector.tabulate(n)(i => be64(bytes, s + 8 + 8 * i)))
          })
        sizes <- {
          val fixed = be32(bytes, stszS + 4) // nonzero ⇒ every sample this size
          val n = be32(bytes, stszS + 8).toInt
          if (n < 0 || n > maxSamples) None
          else if (fixed != 0L) Some(Vector.fill(n)(fixed))
          else if (stszS + 12 + 4L * n > stszE) None
          else Some(Vector.tabulate(n)(i => be32(bytes, stszS + 12 + 4 * i)))
        }
        deltas <- {
          val n = be32(bytes, sttsS + 4).toInt
          if (n < 0 || sttsS + 8 + 8L * n > sttsE) None
          else Some(Vector.tabulate(n)(i =>
            (be32(bytes, sttsS + 8 + 8 * i), be32(bytes, sttsS + 8 + 8 * i + 4))))
        }
        stsc <- {
          val n = be32(bytes, stscS + 4).toInt
          if (n < 0 || stscS + 8 + 12L * n > stscE) None
          else Some(Vector.tabulate(n)(i =>
            (be32(bytes, stscS + 8 + 12 * i).toInt, // first_chunk, 1-based
              be32(bytes, stscS + 8 + 12 * i + 4).toInt))) // samples_per_chunk
        }
        table <- {
          val nSamples = sizes.length
          // per-sample DTS from the (count, delta) run-length pairs
          val dts = new Array[Long](nSamples)
          var si = 0
          var t = 0L
          deltas.foreach { case (cnt, delta) =>
            var c = 0L
            while (c < cnt && si < nSamples) { dts(si) = t; t += delta; si += 1; c += 1 }
          }
          // expand sample-to-chunk: entry applies from first_chunk until
          // the next entry's first_chunk
          val out = Vector.newBuilder[Mp4Sample]
          var sample = 0
          var chunk = 0
          var ok = stsc.nonEmpty && si == nSamples
          while (ok && chunk < chunkOffsets.length && sample < nSamples) {
            val spc = stsc.takeWhile(_._1 <= chunk + 1).lastOption.map(_._2).getOrElse(0)
            if (spc <= 0) ok = false
            else {
              var within = 0
              var off = chunkOffsets(chunk)
              while (within < spc && sample < nSamples) {
                out += Mp4Sample(sample + 1, dts(sample) * 1000L / timescale, off, sizes(sample))
                off += sizes(sample)
                sample += 1
                within += 1
              }
              chunk += 1
            }
          }
          if (ok && sample == nSamples) Some(out.result()) else None
        }
      } yield table
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One planned frame fetch. `n_samples` is the track's total so
    * downstream can reason about coverage; `decoded = false` rows are
    * payloads with no parseable video sample table (all numerics -1). */
  final case class FrameSampleRef(media_id: Long, sample_idx: Int, pts_ms: Long,
                                  byte_offset: Long, byte_len: Long, n_samples: Int,
                                  decoded: Boolean)

  /** Frame-sample PLANNING over a video corpus: every `everyNth` sample
    * of each payload's video track (sample 1, 1+N, 1+2N, …), capped at
    * `maxFrames` per video, as (offset, length) fetch instructions.
    * This is the scale-correct decomposition of "sample K frames per
    * video at 100 TB": a header-only `mapPartitions` pass plans the
    * byte ranges (this operator), and the pixel-decode stage then reads
    * ONLY those ranges — `Σ sampled frame bytes`, not `Σ video bytes`,
    * typically a 100–1000× I/O cut. Same partition discipline as
    * [[extractFeatures]]; malformed payloads flag, never fail. */
  def planFrameSamples(spark: SparkSession, media: DataFrame,
                       everyNth: Int, maxFrames: Int = Int.MaxValue): Dataset[FrameSampleRef] = {
    import spark.implicits._
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          mp4SampleTable(bytes) match {
            case Some(samples) =>
              samples.iterator.zipWithIndex
                .collect { case (s, i) if i % everyNth == 0 => s }
                .take(maxFrames)
                .map(s => FrameSampleRef(id, s.idx, s.dtsMs, s.offset, s.size,
                  samples.length, decoded = true))
            case None =>
              Iterator.single(FrameSampleRef(id, -1, -1L, -1L, -1L, -1, decoded = false))
          }
        }
      }
  }

  /** One media row's audio/video metadata: container from magic bytes,
    * duration always, stream properties where the container carries
    * them (audio: rate/channels/bits; video: width/height). `decoded`
    * false ⇒ the payload matched no parseable container and every
    * numeric field is -1. */
  final case class AvMetadata(media_id: Long, container: String, duration_ms: Long,
                              sample_rate: Int, channels: Int, bits_per_sample: Int,
                              width: Int, height: Int, decoded: Boolean)

  /** Partition-parallel audio/video metadata extraction — the A/V
    * sibling of [[extractFeatures]], same shape: `mapPartitions`,
    * header-only parsing, malformed payloads flagged instead of failing
    * the task. Fields that do not apply to a container are 0 (parsed,
    * dimensionless), -1 only when nothing parsed. */
  def extractAvMetadata(spark: SparkSession, media: DataFrame): Dataset[AvMetadata] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          sniffAvFormat(bytes) match {
            case Some("mp4") =>
              mp4Metadata(bytes) match {
                case Some(m) => AvMetadata(id, "mp4", m.durationMs, 0, 0, 0, m.width, m.height, decoded = true)
                case None => AvMetadata(id, "mp4", -1, -1, -1, -1, -1, -1, decoded = false)
              }
            case Some(container) => // wav/aiff/au → the JDK audio parser
              audioMetadata(bytes) match {
                case Some(a) =>
                  AvMetadata(id, container, a.durationMs, a.sampleRate, a.channels,
                    a.bitsPerSample, 0, 0, decoded = true)
                case None => AvMetadata(id, container, -1, -1, -1, -1, -1, -1, decoded = false)
              }
            case None => AvMetadata(id, "unknown", -1, -1, -1, -1, -1, -1, decoded = false)
          }
        }
      }
  }

  /** Partition-parallel feature extraction over media records.
    * `mapPartitions` so codec state initializes ONCE per partition: one
    * reusable CRC32 and one `ImageReader` per image format, never
    * per-row. Records stream through in batches so a batched codec API
    * amortizes per-call overhead. Decode routing by magic bytes (never
    * the claimed MIME type): JDK-decodable images get REAL header
    * dimensions; MP4 video gets its tkhd dimensions; parseable audio
    * gets (0, 0) decoded=true (real parse, dimensionless container —
    * stream properties live in [[extractAvMetadata]]); anything else is
    * (-1, -1) decoded=false. Output is a typed Dataset with a stable
    * schema for downstream SQL. */
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

  /** Pixel-level image features: per-channel means in [0,1] and an
    * `histBins`-bucket luminance histogram (counts sum to the pixel
    * count). `ok = false` ⇒ undecodable payload, empty histogram, -1
    * means. */
  final case class PixelStats(media_id: Long, width: Int, height: Int,
                              mean_r: Double, mean_g: Double, mean_b: Double,
                              luma_hist: Array[Long], ok: Boolean)

  /** REAL pixel feature extraction — the feature step of a multimodal
    * training pipeline between metadata filtering and model input: full
    * `ImageIO` decode, one pass over the pixels accumulating RGB sums
    * and a Rec.601 luminance histogram. Deterministic (integer RGB from
    * the decoded raster; no resampling), so specs assert exact values
    * on synthetic payloads. Like [[thumbnails]] this touches every
    * pixel — run it on the metadata-pruned survivors, never the raw
    * corpus; `mapPartitions` keeps codec state per-task, undecodable
    * payloads flag rather than fail. */
  def pixelStats(spark: SparkSession, media: DataFrame, histBins: Int = 8): Dataset[PixelStats] = {
    import spark.implicits._
    require(histBins >= 1, s"histBins must be >= 1, got $histBins")
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) PixelStats(id, -1, -1, -1, -1, -1, Array.empty, ok = false)
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              val hist = new Array[Long](histBins)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
                  sr += r; sg += g; sb += b
                  // Rec.601 integer luma in [0, 255]; bin index scaled to histBins
                  val luma = (299 * r + 587 * g + 114 * b) / 1000
                  hist(math.min(histBins - 1, luma * histBins / 256)) += 1
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h * 255
              PixelStats(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
                hist, ok = true)
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              PixelStats(id, -1, -1, -1, -1, -1, Array.empty, ok = false)
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
              case None => sniffAvFormat(bytes) match {
                case Some("mp4") => mp4Metadata(bytes) match {
                  case Some(m) => (m.width, m.height, true)
                  case None => (-1, -1, false)
                }
                case Some(_) =>
                  if (audioMetadata(bytes).isDefined) (0, 0, true) else (-1, -1, false)
                case None => (-1, -1, false)
              }
            }
            MediaFeatures(id, mt, bytes.length.toLong, crc.getValue, w, h, decoded)
          }
        }
      }
  }
}
