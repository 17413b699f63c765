package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style replica reconciliation: decide whether two copies of a
  * keyed table agree — and repair-list exactly where they don't —
  * moving CHECKSUMS instead of rows. A23's [[SnapshotDiff]] answers
  * "what changed" by a full-outer join over per-row digests (48 B/row
  * — already metadata-scale); this goes one level further for the
  * replica-audit case where the expected answer is "almost nothing":
  * each side reduces to `buckets` (count, checksum) rows, disagreement
  * localizes to dirty buckets, and only rows of dirty buckets ever
  * reach a join. For a 100 TB replica pair with a handful of
  * divergent rows, the comparison ships kilobytes of checksums plus
  * the divergent buckets — the anti-entropy pattern (Dynamo/Cassandra
  * Merkle trees), flattened to one level because Spark scans are
  * bucket-prunable anyway.
  *
  * Checksum = Σ over rows of a 60-bit integer image of the per-row
  * digest (key INCLUDED in the digest — a content swap between two
  * keys must dirty the bucket; an order-free SUM is what makes the
  * aggregate partial/mergeable, and a decimal(38) carrier makes it
  * overflow-proof under ANSI). Equal (count, checksum) proves equality
  * up to a ~2^-60-per-bucket digest-sum collision — the standard
  * anti-entropy trade, documented; byte-certain audits run
  * [[SnapshotDiff.diff]] afterwards on what this pass localized.
  */
object Reconcile {

  /** Deterministic bucket of a key (md5-derived, engine-mirrorable). */
  def bucketOf(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  private def digestLong(keyCol: String, contentCols: Seq[String])(df: DataFrame): Column =
    conv(substring(
      SnapshotDiff.digestOf((keyCol +: contentCols).map(df(_))), 1, 15), 16, 10)
      .cast("long")

  /** (bucket, n_rows, checksum) — one partial-aggregating shuffle whose
    * output is `buckets` rows. */
  def bucketChecksums(
      df: DataFrame, keyCol: String, contentCols: Seq[String], buckets: Int): DataFrame = {
    require(buckets >= 1)
    df.select(bucketOf(col(keyCol), buckets).as("bucket"),
        digestLong(keyCol, contentCols)(df).cast("decimal(38,0)").as("__d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum(col("__d")).as("checksum"))
  }

  /** Buckets where the two replicas disagree (count or checksum, or a
    * bucket entirely missing on one side). */
  def dirtyBuckets(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("n_rows").as("__na"), col("checksum").as("__ca"))
      .join(b.select(col("bucket"), col("n_rows").as("__nb"), col("checksum").as("__cb")),
        Seq("bucket"), "full_outer")
      .filter(!(col("__na") <=> col("__nb")) || !(col("__ca") <=> col("__cb")))
      .select(col("bucket"))

  /** Row-level diff of the two replicas, restricted to dirty buckets:
    * checksum pass localizes, [[SnapshotDiff.diff]] classifies. Clean
    * buckets never reach the join (their rows are filtered at the scan
    * — with a bucket-partitioned layout that is partition pruning).
    * Returns (key, change, prev_digest, cur_digest) with `change` ∈
    * added/removed/changed, plus the localization stats as constant
    * columns (n_dirty_buckets, n_buckets). */
  def reconcile(
      a: DataFrame, b: DataFrame,
      keyCol: String, contentCols: Seq[String], buckets: Int = 4096): DataFrame = {
    val dirty = dirtyBuckets(
      bucketChecksums(a, keyCol, contentCols, buckets),
      bucketChecksums(b, keyCol, contentCols, buckets))
    val stats = dirty.agg(count(lit(1)).as("n_dirty_buckets"))
      .withColumn("n_buckets", lit(buckets.toLong))
    def restrict(df: DataFrame): DataFrame =
      df.join(broadcast(dirty),
        bucketOf(df(keyCol), buckets) === dirty("bucket"), "left_semi")
    SnapshotDiff.diff(restrict(a), restrict(b), keyCol, contentCols)
      .filter(col("change") =!= "unchanged")
      .crossJoin(broadcast(stats))
  }
}
