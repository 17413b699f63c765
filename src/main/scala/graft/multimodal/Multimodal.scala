package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside — the layout a 100 TB multimodal corpus uses
  * (parquet binary + stats, partition-prunable metadata). The Spark-side
  * plumbing — schema, batch iteration, partition-parallel feature
  * extraction — is real; only the codec itself is stubbed (this
  * container has no image/audio libraries), clearly marked below.
  */
object Multimodal {

  /** Typed media record: `content` is the raw payload; metadata travels
    * in plain columns so filters prune without touching bytes. */
  final case class MediaRecord(media_id: Long, media_type: String, source: String, content: Array[Byte])

  final case class MediaFeatures(media_id: Long, media_type: String, byte_len: Long,
                                 checksum: Long, width: Int, height: Int)

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

  // ======================================================================
  // STUB: media decode. A production build decodes with a per-partition
  // codec (javax.imageio / ffmpeg bindings) inside mapPartitions — one
  // codec instance per partition, batch-amortized, never per-row init.
  // The container ships no media libraries, so decode derives
  // DETERMINISTIC fake dimensions from the payload bytes. The plumbing
  // (typed Dataset, partition iteration, schema) is the real pattern.
  // ======================================================================
  private def stubDecode(content: Array[Byte]): (Int, Int) = {
    val n = content.length
    (64 + n % 64, 64 + (n / 64) % 64) // fake width/height — deterministic
  }

  /** Partition-parallel feature extraction over media records.
    * `mapPartitions` so the codec initializes ONCE per partition (here:
    * one reusable CRC32 instance, reset per record — a real decoder
    * would hold its native context the same way), and records stream
    * through in batches so a batched codec API amortizes per-call
    * overhead. Output is a typed Dataset with a stable schema for
    * downstream SQL. */
  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media_type", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val c = new java.util.zip.CRC32() // per-partition codec state
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary: a real codec would decode `batch` in one call
          batch.map { case (id, mt, bytes) =>
            c.reset()
            c.update(bytes)
            val (w, h) = stubDecode(bytes)
            MediaFeatures(id, mt, bytes.length.toLong, c.getValue, w, h)
          }
        }
      }
  }
}
