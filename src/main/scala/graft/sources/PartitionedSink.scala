package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet output with partition-scoped
  * idempotent re-runs — the write side of the medallion layout the
  * reference appends into Hive-partitioned directories
  * (reference: transform/clean_transform.py's partitioned Silver
  * writes). Plain `mode("overwrite")` nukes the WHOLE root (a re-run of
  * one day deletes every other day); `mode("append")` double-writes on
  * retry. Dynamic partition overwrite replaces exactly the partitions
  * present in the batch and leaves the rest untouched — a day-scoped
  * pipeline re-run becomes idempotent.
  */
object PartitionedSink {

  /** Overwrite ONLY the partitions present in `df` under `path`,
    * `partitionBy(partCols)`.
    *
    * `nShards` bounds the files per partition: rows are exchanged on
    * (partition cols, shard) so each task owns whole output files and
    * every partition lands in AT MOST `nShards` files (two shards of
    * one partition hashing into the same task coalesce) — without the
    * repartition, every upstream task appends a sliver file to every
    * partition it happens to hold (tasks × partitions small files, the
    * pathology [[Compaction]] exists to undo; writing compact in the
    * first place is cheaper than compacting after). Size `nShards` ≈
    * partition bytes / target file size; 1 is right up to a few hundred
    * MB per partition.
    *
    * The overwrite mode rides on the WRITER (`option("partitionOverwriteMode",
    * "dynamic")`), not on session config — a shared-session global flips
    * semantics for every concurrent writer (the nanosAsLong lesson). */
  def overwritePartitions(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      nShards: Int = 1): Unit = {
    require(partCols.nonEmpty, "need at least one partition column")
    require(nShards >= 1, "nShards must be >= 1")
    val dataCols = df.columns.filterNot(partCols.contains)
    require(dataCols.nonEmpty, "df must carry at least one non-partition column")
    val exchanged =
      if (nShards == 1) df.repartition(partCols.map(col): _*)
      else df.repartition(partCols.map(col) :+
        pmod(xxhash64(struct(dataCols.map(col): _*)), lit(nShards)): _*)
    exchanged.write
      .partitionBy(partCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)
  }
}
