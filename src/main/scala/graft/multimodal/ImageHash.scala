package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + Hamming near-dup pairing — D3's SimHash
  * discipline applied to the image modality: a 64-bit fingerprint per
  * image that survives re-encoding, resizing, and mild edits, then a
  * pigeonhole band join so candidate generation is an equi-join (never
  * all-pairs) and the exact Hamming check runs only on band-collided
  * candidates.
  *
  * Hashes (both computed in ONE decode pass):
  *   - aHash: 8×8 area-averaged integer luma grid, bit set iff cell >
  *     grid mean — robust to re-encode/rescale, weak on brightness
  *     shifts;
  *   - dHash: 9×8 grid, bit set iff cell brighter than its right
  *     neighbor — gradient-based, immune to global brightness shifts.
  * Downsampling is EXACT integer area averaging over the decoded
  * raster cell [⌊w·i/W⌋, ⌊w·(i+1)/W⌋) × [⌊h·j/H⌋, ⌊h·(j+1)/H⌋) with
  * Rec.601 integer luma ([[Multimodal.pixelStats]]'s convention), not
  * a Graphics2D filter — bit-deterministic across JVMs, so specs
  * assert exact hash values and cross-codec stability (PNG vs BMP of
  * the same raster hash identically).
  *
  * Scale shape: hashing is a `mapPartitions` narrow map (decode cost,
  * like [[Multimodal.thumbnails]] — run it once and persist next to
  * the media manifest). Pairing splits the 64-bit hash into
  * `maxHamming+1` bands: two hashes within Hamming `maxHamming` agree
  * on ≥1 whole band (pigeonhole), so the self-join is keyed on
  * (band index, band value) and `bit_count(xor)` verifies exactly —
  * the d3 plan shape, shuffles bounded by band selectivity, AQE
  * skew-split on hot buckets (e.g. the all-black-thumbnail band).
  */
object ImageHash {

  final case class Hashes(media_id: Long, ahash: Long, dhash: Long, ok: Boolean)

  /** Exact area-averaged integer luma grid (`gw`×`gh`) of a decoded
    * image; row-major. Public for spec-level hand verification. */
  def lumaGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = h.toLong * gy / gh; val y1 = math.max(y0 + 1, h.toLong * (gy + 1) / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = w.toLong * gx / gw; val x1 = math.max(x0 + 1, w.toLong * (gx + 1) / gw)
        var sum = 0L
        var y = y0.toInt
        while (y < y1) {
          var x = x0.toInt
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = (sum / ((y1 - y0) * (x1 - x0))).toInt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** aHash+dHash of one decoded image. Public for spec use. */
  def hashesOf(img: java.awt.image.BufferedImage): (Long, Long) = {
    val g8 = lumaGrid(img, 8, 8)
    val mean = g8.map(_.toLong).sum / 64
    var a = 0L
    var i = 0
    while (i < 64) { if (g8(i) > mean) a |= 1L << i; i += 1 }
    val g9 = lumaGrid(img, 9, 8)
    var d = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g9(r * 9 + c) > g9(r * 9 + c + 1)) d |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    (a, d)
  }

  /** Per-image hashes over a [[Multimodal.asMedia]] frame (media_id,
    * content). Undecodable payloads flag `ok = false` rather than
    * fail the task. */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[Hashes] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) Hashes(id, 0L, 0L, ok = false)
            else {
              val (a, d) = hashesOf(img)
              Hashes(id, a, d, ok = true)
            }
          } catch {
            case scala.util.control.NonFatal(_) => Hashes(id, 0L, 0L, ok = false)
          }
        }
      }
  }

  /** Near-dup pairs (id_a < id_b, hamming ≤ maxHamming) on `hashCol`
    * via pigeonhole banding: `maxHamming+1` bands of ⌈64/b⌉ bits — a
    * qualifying pair agrees exactly on at least one band, so
    * candidates come from an equi-join on (band index, band bits) and
    * `bit_count` settles them. Input: (media_id, <hashCol>). */
  def nearDupPairs(hashes: DataFrame, hashCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming in [0,64), got $maxHamming")
    val nBands = maxHamming + 1
    // bands must PARTITION the 64 bits exactly or the pigeonhole
    // guarantee breaks: band b covers [⌊64b/n⌋, ⌊64(b+1)/n⌋) — widths
    // differ by ≤1, every shift < 64 (Java shifts wrap at 64)
    val bandCols = (0 until nBands).map { bidx =>
      val start = 64 * bidx / nBands
      val w = 64 * (bidx + 1) / nBands - start
      val bits = if (w == 64) col("__h")
        else shiftrightunsigned(col("__h"), start).bitwiseAND(lit((1L << w) - 1))
      struct(lit(bidx).as("b"), bits.as("bits"))
    }
    val bands = graft.operators.Lineage.truncate(
      hashes.select(col("media_id"), col(hashCol).as("__h"))
        .select(col("media_id"), col("__h"),
          explode(array(bandCols: _*)).as("__s"))
        .select(col("media_id"), col("__h"),
          col("__s.b").as("__b"), col("__s.bits").as("__bits")))
    val a = bands.select(col("__b"), col("__bits"),
      col("media_id").as("id_a"), col("__h").as("__ha"))
    val b = bands.select(col("__b"), col("__bits"),
      col("media_id").as("id_b"), col("__h").as("__hb"))
    a.join(b, Seq("__b", "__bits")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
