package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic gradient raster: luma varies smoothly with x, so
    * dHash bits are predictable and small edits flip few bits. */
  private def gradient(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "content")

  test("lumaGrid: exact area averages on a hand-computed 4x2 raster") {
    // gray values: row0 = 10,20,30,40; row1 = 50,60,70,80 (gray pixels
    // have integer luma equal to the channel value under Rec.601/1000)
    val img = gradient(4, 2, (x, y) => 10 + 10 * (y * 4 + x))
    val g = ImageHash.lumaGrid(img, 2, 1)
    // cells: mean(10,20,50,60)=35, mean(30,40,70,80)=55
    assert(g.toSeq == Seq(35, 55))
  }

  test("dHash of a strict left-to-right gradient is all zeros; reversed is all ones") {
    val inc = gradient(64, 64, (x, _) => x * 4) // brighter to the RIGHT
    val dec = gradient(64, 64, (x, _) => 255 - x * 4)
    val (_, dInc) = ImageHash.hashesOf(inc)
    val (_, dDec) = ImageHash.hashesOf(dec)
    assert(dInc == 0L) // cell never brighter than right neighbor
    assert(dDec == -1L) // all 64 bits set
  }

  test("hashes survive re-encoding (png vs bmp of the same raster)") {
    val img = gradient(40, 30, (x, y) => (x * 7 + y * 3) % 256)
    val df = mediaOf(1L -> encode(img, "png"), 2L -> encode(img, "bmp"))
    val h = ImageHash.imageHashes(spark, df).collect().map(r => r.media_id -> ((r.ahash, r.dhash))).toMap
    assert(h(1L) == h(2L))
  }

  test("near-identical images land within small Hamming; inverted image is far") {
    val base = gradient(64, 64, (x, y) => (x * 3 + y) % 256)
    val tweaked = gradient(64, 64, (x, y) => ((x * 3 + y) % 256 + (if (x == 0 && y == 0) 40 else 0)) & 0xFF)
    val inverted = gradient(64, 64, (x, y) => 255 - (x * 3 + y) % 256)
    val Seq(hb, ht, hi) = Seq(base, tweaked, inverted).map(ImageHash.hashesOf)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hb._2, ht._2) <= 4)
    assert(ham(hb._2, hi._2) >= 32)
  }

  test("undecodable payload flags ok=false instead of failing") {
    val h = ImageHash.imageHashes(spark, mediaOf(9L -> Array[Byte](1, 2, 3)))
      .collect().head
    assert(!h.ok && h.media_id == 9L)
  }

  test("nearDupPairs: pigeonhole banding finds all pairs <= maxHamming, none above") {
    // ids with known hashes: craft longs directly (hash source agnostic)
    val rows = Seq(
      (1L, 0x0000000000000000L),
      (2L, 0x0000000000000007L), // ham 3 from id 1
      (3L, 0x00000000000000FFL), // ham 8 from id 1, ham 5 from id 2
      (4L, 0xFFFFFFFFFFFFFFFFL) // far from all
    ).toDF("media_id", "h")
    val pairs = ImageHash.nearDupPairs(rows, "h", maxHamming = 5)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 3), (2L, 3L, 5)))
  }

  test("nearDupPairs end-to-end on real images: re-encode collapses, inverse separates") {
    val base = gradient(48, 48, (x, y) => (x * 5 + y * 2) % 256)
    val inverted = gradient(48, 48, (x, y) => 255 - (x * 5 + y * 2) % 256)
    val media = mediaOf(
      1L -> encode(base, "png"), 2L -> encode(base, "bmp"), 3L -> encode(inverted, "png"))
    val hashes = ImageHash.imageHashes(spark, media).filter(_.ok).toDF()
    val pairs = ImageHash.nearDupPairs(hashes, "dhash", maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
