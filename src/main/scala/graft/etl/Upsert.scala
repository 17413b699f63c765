package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE / SCD type-1): apply a batch of updates to a
  * snapshot keeping the LATEST version per key — the table-maintenance
  * primitive behind "MERGE INTO" for engines managing plain parquet
  * (where [[Scd]] keeps every version with validity intervals, this
  * keeps only the current row). Optional tombstone column handles
  * deletes in the same pass.
  */
object Upsert {

  /** Latest row per key across `current ∪ updates`, ordered by
    * `version` (desc) with update rows winning version ties (the batch
    * is newer information than the snapshot). Rows whose winning
    * version carries `tombstone = true` are dropped (deletes). Both
    * inputs must share the schema (plus the optional tombstone column,
    * which is dropped from the output).
    *
    * Scale: ONE shuffle on the key; the per-key `row_number` is a
    * WindowGroupLimit at the physical level (rank-pushdown filters
    * below the sort), so per-key work is O(versions), memory O(1).
    * Null keys group together in the window — a null-keyed snapshot
    * row is updatable like any other.
    */
  def upsert(
      current: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      version: String,
      tombstone: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    Seq("__src", "__rn").foreach(c => require(!current.columns.contains(c),
      s"upsert reserves column $c; rename the input column"))
    tombstone.foreach(t => require(updates.columns.contains(t),
      s"tombstone column $t missing from updates"))
    val cur = tombstone.filterNot(current.columns.contains)
      .foldLeft(current)((d, t) => d.withColumn(t, lit(false)))
    val all = cur.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(version).desc, col("__src").desc)
    val latest = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
    tombstone.fold(latest)(t => latest.filter(!coalesce(col(t), lit(false))).drop(t))
  }

  /** Incremental variant for big snapshots and small batches: only keys
    * PRESENT in the batch go through the window; every other snapshot
    * row passes through without shuffling (the [[Scd.applyUpdates]]
    * semi/anti pattern, null-safe on keys). A daily batch touching
    * 0.1% of keys re-sorts 0.1% of the table. */
  def upsertIncremental(
      current: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      version: String,
      tombstone: Option[String] = None): DataFrame = {
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val cond = keyCols.map(k => current(k) <=> keys(k)).reduce(_ && _)
    val affected = current.join(keys, cond, "left_semi")
    // upsert's output never carries the tombstone column; a snapshot
    // that (unusually) still has one must shed it from the untouched
    // branch too — keeping its schema would fail the union, and keeping
    // tombstoned rows would contradict upsert's delete contract
    val untouched0 = current.join(keys, cond, "left_anti")
    val untouched = tombstone.filter(current.columns.contains)
      .foldLeft(untouched0)((d, t) => d.filter(!coalesce(col(t), lit(false))).drop(t))
    untouched.unionByName(upsert(affected, updates, keyCols, version, tombstone))
  }
}
