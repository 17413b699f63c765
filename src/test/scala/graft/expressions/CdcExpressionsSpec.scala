package graft.expressions

import graft.SparkSpec
import graft.dedup.Cdc
import org.apache.spark.sql.functions._

class CdcExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference chunker — a fresh loop over the published
    * Gear table, NOT a call into the expression's own sweep. */
  private def refChunks(bytes: Array[Byte], minLen: Int, avgBits: Int,
      maxLen: Int): List[(Int, Int, String)] = {
    val mask = (1L << avgBits) - 1
    val md = java.security.MessageDigest.getInstance("MD5")
    var out = List.empty[(Int, Int, String)]
    var start = 0
    var h = 0L
    for (i <- bytes.indices) {
      h = (h << 1) + Gear.Table(bytes(i) & 0xFF)
      val clen = i - start + 1
      if ((clen >= minLen && (h & mask) == 0L) || clen == maxLen || i == bytes.length - 1) {
        md.reset(); md.update(bytes, start, clen)
        out :+= ((start, clen, md.digest().map("%02x".format(_)).mkString))
        start = i + 1; h = 0L
      }
    }
    out
  }

  private def synth(seed: Int, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var x = seed.toLong
    for (i <- 0 until n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      b(i) = (x >>> 33).toByte
    }
    b
  }

  test("gearChunks equals an independent reference loop, tiles, honors guards") {
    val data = synth(1, 20000)
    val got = Seq(Tuple1(data)).toDF("b")
      .select(explode(CdcExpressions.gearChunks(col("b"), 64, 8, 1024)).as("c"))
      .select("c.offset", "c.len", "c.hash")
      .as[(Int, Int, String)].collect().toList
    assert(got == refChunks(data, 64, 8, 1024))
    // tiling: offsets cover [0, n) exactly
    var pos = 0
    got.foreach { case (off, len, h) =>
      assert(off == pos); pos += len
      assert(h == java.security.MessageDigest.getInstance("MD5")
        .digest(data.slice(off, off + len)).map("%02x".format(_)).mkString)
    }
    assert(pos == data.length)
    // guards: every chunk within [minLen, maxLen] except possibly the tail
    got.init.foreach { case (_, len, _) => assert(len >= 64 && len <= 1024) }
    assert(got.last._2 <= 1024)
    assert(got.size > 20, s"expected ~78 chunks at avg 2^8, got ${got.size}")
  }

  test("gearChunks: string input chunks its UTF-8 bytes; edits re-align") {
    val s = new String(synth(2, 8000).map(b => ('a' + (b & 15)).toChar))
    val rows = Seq((1L, s), (2L, "XYZ" + s)).toDF("id", "t")
    val chunks = Cdc.cdcChunksRolling(rows, col("id"), col("t"),
      minLen = 32, avgBits = 6, maxLen = 512)
    val h1 = chunks.filter(col("id") === 1).select("chunk_hash").as[String].collect().toSet
    val h2 = chunks.filter(col("id") === 2).select("chunk_hash").as[String].collect().toSet
    val shared = h1.intersect(h2).size
    assert(shared >= (h1.size * 3) / 4,
      s"rolling CDC must re-align after a prefix edit: shared $shared of ${h1.size}")
    // string and its UTF-8 bytes chunk identically
    val viaBytes = Seq(Tuple1(s.getBytes("UTF-8"))).toDF("b")
      .select(explode(CdcExpressions.gearChunks(col("b"), 32, 6, 512)).as("c"))
      .select("c.hash").as[String].collect().toSet
    assert(viaBytes == h1)
  }

  test("gearChunks: null, empty, and degenerate guards") {
    val df = Seq((1L, Some("abc")), (2L, None), (3L, Some(""))).toDF("id", "t")
    val out = Cdc.cdcChunksRolling(df, col("id"), col("t"), minLen = 1,
      avgBits = 4, maxLen = 2)
    // null dropped, empty → no chunks, maxLen=2 forces 2-byte tiling
    val got = out.as[(Long, Long, Long, String)].collect().toList.sortBy(r => (r._1, r._2))
    assert(got.map(_._1).distinct == List(1L))
    assert(got.map(r => (r._2, r._3)) == List((0L, 2L), (2L, 1L)))
    intercept[IllegalArgumentException] {
      Cdc.cdcChunksRolling(df, col("id"), col("t"), minLen = 10, avgBits = 8, maxLen = 5)
    }
  }
}
