package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout — multi-dimensional locality for file
  * pruning, next to [[Bucketing]]'s single-key join locality.
  *
  * Sorting 100 TB by one column makes that column's min/max file stats
  * selective and every other column's useless: a query filtering on a
  * SECOND dimension scans everything. Interleaving the bits of several
  * dimensions into one sort key gives every participating dimension
  * partial locality — each file covers a small hyper-rectangle, so
  * min/max stats prune files for ANY conjunction of the z-ordered
  * dimensions (the layout trick behind Delta/Iceberg Z-ordering,
  * re-expressed as plain Spark expressions).
  *
  * Everything here is built from built-in bitwise/arithmetic functions
  * (`shiftright`/`&`/`*` — codegen'd, constant-folded loop over bit
  * positions): no UDF, no custom expression needed.
  */
object Zorder {

  /** Scale a numeric column to an integer in [0, 2^bits): rank-free
    * min/max normalization. `min`/`max` come from the caller (table
    * stats / metastore) — a hidden stats scan would double-read the
    * corpus; out-of-range values clamp to the edges, so stale stats
    * degrade locality, never correctness. */
  def normalize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(max > min, s"need max > min, got [$min, $max]")
    val top = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(min)) / lit(max - min) * lit(top.toDouble)
    least(lit(top), greatest(lit(0L), round(scaled).cast("long")))
  }

  /** Interleave the low `bits` of each column (already non-negative
    * ints < 2^bits, e.g. [[normalize]] output) into one z-value:
    * column j's bit i lands at position i*n+j. Total bits ≤ 62 so the
    * value stays a positive long. Null inputs z-order as 0 (files
    * gather nulls at the curve origin rather than failing the write). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "z-ordering needs at least 2 columns")
    require(bits * cols.size <= 62, s"${cols.size} cols × $bits bits exceeds a positive long")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield (shiftright(coalesce(c.cast("long"), lit(0L)), i) % 2) * lit(1L << (i * n + j))
    terms.reduce(_ + _)
  }

  /** Write `df` z-ordered: range-partition by the z-value into
    * `nFiles` files and sort within each, so every file covers a
    * compact z-range (⇒ a small hyper-rectangle per dimension) and
    * parquet min/max stats prune multi-dimensional filters. The
    * z-value is layout-only — it is not written. */
  def writeZOrdered(df: DataFrame, path: String, z: Column, nFiles: Int): Unit = {
    require(!df.columns.contains("__z"), "input already has reserved column __z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
