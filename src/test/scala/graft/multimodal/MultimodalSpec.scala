package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello", "s1"), (2L, "wörld", "s2"))
    .toDF("doc_id", "text", "source")

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

  test("extractFeatures runs partition-parallel with stable fake dims") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "image/png", "source").repartition(2)
    val f = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(f.length == 2)
    assert(f(0).byte_len == 5L && f(0).width == 64 + 5 % 64)
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(f.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
  }
}
