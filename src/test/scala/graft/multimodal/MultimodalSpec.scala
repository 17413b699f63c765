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

  test("extractFeatures stubs non-image media deterministically") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "audio/wav", "source").repartition(2)
    val f = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(f.length == 2)
    assert(f(0).byte_len == 5L && f(0).width == 64 + 5 % 64)
    assert(f.forall(!_.decoded))
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(f.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
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
