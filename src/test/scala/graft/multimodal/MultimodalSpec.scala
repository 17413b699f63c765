package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello", "s1"), (2L, "wörld", "s2"))
    .toDF("doc_id", "text", "source")

  /** Real encoded image bytes of exact (w, h), via the JDK encoder. */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF8040) // non-trivial pixel so encoders emit data
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
    bos.toByteArray
  }

  test("asMedia produces binary content + metadata columns") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "text/plain", "source")
    assert(m.columns.toSeq == Seq("media_id", "media_type", "source", "content"))
    assert(m.schema("content").dataType.typeName == "binary")
  }

  test("withBinaryMetrics: byte_len is UTF-8 length, checksum deterministic") {
    val m = Multimodal.withBinaryMetrics(
      Multimodal.asMedia(docs, "doc_id", "text", "text/plain", "source"))
    val rows = m.orderBy("media_id").select("byte_len", "checksum").collect()
    assert(rows(0).getLong(0) == 5L)
    assert(rows(1).getLong(0) == 6L) // ö is 2 bytes in UTF-8
    val crc = new java.util.zip.CRC32(); crc.update("hello".getBytes("UTF-8"))
    assert(rows(0).getLong(1) == crc.getValue)
  }

  test("extractFeatures decodes real PNG/JPEG/GIF/BMP dimensions from the header") {
    val media = Seq(
      (1L, "image/png", "s", imageBytes("png", 17, 9)),
      (2L, "image/jpeg", "s", imageBytes("jpeg", 33, 21)),
      (3L, "image/gif", "s", imageBytes("gif", 5, 7)),
      (4L, "image/bmp", "s", imageBytes("bmp", 12, 4)),
      // declared PNG but the MIME type lies: bytes are a JPEG — the
      // sniffer must trust the bytes
      (5L, "image/png", "s", imageBytes("jpeg", 8, 8))
    ).toDF("media_id", "media_type", "source", "content").repartition(2)
    val f = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f.map(r => (r.width, r.height)).toSeq ==
      Seq((17, 9), (33, 21), (5, 7), (12, 4), (8, 8)))
    assert(f.forall(_.decoded))
  }

  test("extractFeatures: corrupt image payload yields (-1,-1) undecoded, not a task failure") {
    val media = Seq(
      (1L, "image/png", "s", "not an image at all".getBytes("UTF-8")),
      // valid magic, truncated body
      (2L, "image/png", "s", imageBytes("png", 10, 10).take(12))
    ).toDF("media_id", "media_type", "source", "content")
    val f = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f.map(r => (r.width, r.height, r.decoded)).toSeq ==
      Seq((-1, -1, false), (-1, -1, false)))
  }

  test("extractFeatures: unparseable non-image media is flagged, never fabricated") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "audio/wav", "source").repartition(2)
    val f = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(f.length == 2)
    assert(f(0).byte_len == 5L)
    assert(f.forall(r => !r.decoded && r.width == -1 && r.height == -1))
  }

  /** A REAL in-memory WAV payload via the JDK encoder: 16-bit PCM,
    * `seconds` of frames at `sampleRate`. */
  private def wavBytes(sampleRate: Float, channels: Int, seconds: Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val nFrames = math.round(sampleRate * seconds).toInt
    val data = new Array[Byte](nFrames * fmt.getFrameSize)
    data.indices.foreach(i => data(i) = (i % 251).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---- minimal REAL ISO-BMFF (MP4) payload, built box by box ----
  private def be32(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def box(tpe: String, content: Array[Byte]*): Array[Byte] = {
    val body = content.flatten.toArray
    be32(8L + body.length) ++ tpe.getBytes("ISO-8859-1") ++ body
  }
  private def mp4Bytes(timescale: Long, duration: Long, w: Int, h: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(512), "isomiso2".getBytes)
    // mvhd v0 up through duration (the parsed prefix), zero-padded tail
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(timescale), be32(duration),
      new Array[Byte](80))
    // audio-only track first (0×0) to prove the video-track scan skips it
    def tkhd(tw: Int, th: Int) = box("tkhd",
      new Array[Byte](24 + 16 + 36), // ver/flags..duration + reserveds + matrix
      be32(tw.toLong << 16), be32(th.toLong << 16))
    val moov = box("moov", mvhd, box("trak", tkhd(0, 0)), box("trak", tkhd(w, h)))
    ftyp ++ moov
  }

  test("audioMetadata parses a real WAV header: rate, channels, bits, duration") {
    val b = wavBytes(8000f, 2, 0.5)
    assert(Multimodal.sniffAvFormat(b).contains("wav"))
    val m = Multimodal.audioMetadata(b).get
    assert(m.sampleRate == 8000 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.durationMs == 500L)
  }

  test("mp4Metadata walks boxes to mvhd duration + video-track dimensions") {
    val b = mp4Bytes(timescale = 600, duration = 3000, w = 640, h = 360)
    assert(Multimodal.sniffAvFormat(b).contains("mp4"))
    val m = Multimodal.mp4Metadata(b).get
    assert(m.durationMs == 5000L && m.width == 640 && m.height == 360)
    // truncated/garbage payloads parse to None, never throw
    assert(Multimodal.mp4Metadata(b.take(40)).isEmpty)
    assert(Multimodal.mp4Metadata("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("extractAvMetadata routes wav/mp4/unknown per partition") {
    val media = Seq(
      (1L, wavBytes(16000f, 1, 0.25)),
      (2L, mp4Bytes(1000, 2500, 320, 240)),
      (3L, "definitely not media".getBytes("UTF-8")))
      .toDF("media_id", "content").repartition(2)
    val f = Multimodal.extractAvMetadata(spark, media).collect().sortBy(_.media_id)
    assert(f(0).container == "wav" && f(0).decoded &&
      f(0).sample_rate == 16000 && f(0).channels == 1 && f(0).duration_ms == 250L &&
      f(0).width == 0 && f(0).height == 0)
    assert(f(1).container == "mp4" && f(1).decoded &&
      f(1).duration_ms == 2500L && f(1).width == 320 && f(1).height == 240)
    assert(f(2).container == "unknown" && !f(2).decoded && f(2).duration_ms == -1L)
  }

  test("extractFeatures gives mp4 video its real dimensions and audio (0,0) decoded") {
    val media = Seq(
      (1L, "video/mp4", "s", mp4Bytes(600, 600, 128, 96)),
      (2L, "audio/wav", "s", wavBytes(8000f, 1, 0.1)))
      .toDF("media_id", "media_type", "source", "content")
    val f = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f(0).decoded && f(0).width == 128 && f(0).height == 96)
    assert(f(1).decoded && f(1).width == 0 && f(1).height == 0)
  }

  // MP4 with a REAL sample table: 5 samples of sizes 10..50, chunked
  // (1,2)+(3,4,5), chunk offsets 1000/2000, stts runs (2×100)+(3×200)
  // at timescale 1000 — a layout a demuxer would actually produce.
  private def mp4WithSamples(handler: String = "vide"): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(512), "isomiso2".getBytes)
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(600), new Array[Byte](80))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(600), be32(0))
    val hdlr = box("hdlr", be32(0), be32(0), handler.getBytes("ISO-8859-1"), new Array[Byte](12))
    val stts = box("stts", be32(0), be32(2), be32(2), be32(100), be32(3), be32(200))
    val stsz = box("stsz", be32(0), be32(0), be32(5),
      be32(10), be32(20), be32(30), be32(40), be32(50))
    val stsc = box("stsc", be32(0), be32(2),
      be32(1), be32(2), be32(1), be32(2), be32(3), be32(1))
    val stco = box("stco", be32(0), be32(2), be32(1000), be32(2000))
    val stbl = box("stbl", stts, stsz, stsc, stco)
    val trak = box("trak", box("mdia", mdhd, hdlr, box("minf", stbl)))
    // an audio trak with no stbl first, to prove track selection skips it
    val audioTrak = box("trak", box("mdia",
      box("mdhd", be32(0), be32(0), be32(0), be32(8000), be32(100), be32(0)),
      box("hdlr", be32(0), be32(0), "soun".getBytes("ISO-8859-1"), new Array[Byte](12))))
    ftyp ++ box("moov", mvhd, audioTrak, trak)
  }

  test("mp4SampleTable lays samples out exactly as the stbl describes") {
    val t = Multimodal.mp4SampleTable(mp4WithSamples()).get
    assert(t.map(s => (s.idx, s.dtsMs, s.offset, s.size)) == Vector(
      (1, 0L, 1000L, 10L),    // chunk 1 start
      (2, 100L, 1010L, 20L),  // packed after sample 1
      (3, 200L, 2000L, 30L),  // chunk 2 start
      (4, 400L, 2030L, 40L),
      (5, 600L, 2070L, 50L)))
    // truncated payloads and non-video-only files parse to None, never throw
    assert(Multimodal.mp4SampleTable(mp4WithSamples().take(60)).isEmpty)
    assert(Multimodal.mp4SampleTable("junk that is not iso-bmff".getBytes).isEmpty)
  }

  test("mp4SampleTable falls back to the only stbl track when hdlr is not vide") {
    // handler says 'soun' but it is the only track with a sample table
    assert(Multimodal.mp4SampleTable(mp4WithSamples(handler = "soun")).get.length == 5)
  }

  test("planFrameSamples emits every-Nth fetch ranges, capped, flagging failures") {
    val media = Seq(
      (1L, mp4WithSamples()),
      (2L, "not a video".getBytes("UTF-8")))
      .toDF("media_id", "content").repartition(2)
    val plan = Multimodal.planFrameSamples(spark, media, everyNth = 2, maxFrames = 2)
      .collect().sortBy(r => (r.media_id, r.sample_idx))
    val v = plan.filter(_.media_id == 1L)
    // samples 1 and 3 (every 2nd, capped at 2 of the 3 eligible)
    assert(v.map(r => (r.sample_idx, r.pts_ms, r.byte_offset, r.byte_len)).toSeq ==
      Seq((1, 0L, 1000L, 10L), (3, 200L, 2000L, 30L)))
    assert(v.forall(r => r.decoded && r.n_samples == 5))
    val bad = plan.filter(_.media_id == 2L)
    assert(bad.length == 1 && !bad.head.decoded && bad.head.sample_idx == -1)
  }

  test("pixelStats: exact channel means + luminance histogram from a real decode") {
    // 4×2 solid red (255,0,0): mean_r = 1, mean_g = mean_b = 0;
    // luma = 299·255/1000 = 76 → bin 76·8/256 = 2 holds all 8 pixels
    def solid(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, solid(0xFF0000, 4, 2)),
      (2L, solid(0xFFFFFF, 3, 3)),   // white: all means 1, luma 255 → last bin
      (3L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "content").repartition(2)
    val s = Multimodal.pixelStats(spark, media, histBins = 8).collect().sortBy(_.media_id)
    assert(s(0).ok && s(0).width == 4 && s(0).height == 2)
    assert(s(0).mean_r == 1.0 && s(0).mean_g == 0.0 && s(0).mean_b == 0.0)
    assert(s(0).luma_hist.toSeq == Seq(0L, 0L, 8L, 0L, 0L, 0L, 0L, 0L))
    assert(s(1).ok && s(1).mean_r == 1.0 && s(1).mean_g == 1.0 && s(1).mean_b == 1.0)
    assert(s(1).luma_hist.last == 9L && s(1).luma_hist.sum == 9L)
    assert(!s(2).ok && s(2).luma_hist.isEmpty)
  }

  test("thumbnails: real pixel decode + aspect-preserving resize + PNG re-encode") {
    val media = Seq(
      (1L, imageBytes("png", 100, 40)),   // landscape → 50×20 at maxDim 50
      (2L, imageBytes("jpg", 30, 10)),    // already small → untouched dims
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val t = Multimodal.thumbnails(spark, media, maxDim = 50).collect().sortBy(_.media_id)
    assert(t(0).ok && t(0).width == 50 && t(0).height == 20)
    assert(t(1).ok && t(1).width == 30 && t(1).height == 10) // never upscales
    assert(!t(2).ok && t(2).thumb_png.isEmpty)
    // the emitted bytes are a REAL decodable PNG of the stated size
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(t(0).thumb_png))
    assert(back.getWidth == 50 && back.getHeight == 20)
  }
}
