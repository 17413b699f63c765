package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the storage-side half of shuffle discipline.
  *
  * A join between two tables bucketed (and sorted) on the join key by
  * the same bucket count needs NO shuffle and no sort at read time:
  * each task sort-merges bucket i of both sides. At 100 TB this turns
  * the nightly fact⋈fact join from the dominant shuffle into a local
  * merge — the write pays the partitioning cost once, every downstream
  * join reuses it.
  *
  * Rules enforced by this layout (violations silently re-shuffle):
  * matching bucket COUNT on both sides, join keys = bucket keys, and
  * `spark.sql.sources.bucketing.enabled` (default true). Buckets are
  * files per bucket id, so choose bucket counts that keep file sizes in
  * the hundreds-of-MB range at the target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. `saveAsTable` is
    * required — bucket metadata lives in the catalog, plain
    * `.parquet(path)` cannot record it. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(nBuckets, bucketCol)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }
}
