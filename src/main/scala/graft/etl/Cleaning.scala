package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-layer cleaning operators.
  *
  * Re-expresses the reference's Bronze→Silver cleaning pass
  * (reference: transform/clean_transform.py:70-175) as composable
  * `DataFrame => DataFrame` functions. Every operator here is a narrow
  * map — zero shuffles, fully codegen'd, filter/column pruning pushes
  * through to the scan — so the whole cleaning pipeline costs one pass
  * over the data at any scale.
  */
object Cleaning {

  /** Cast a map of columns to target types
    * (reference: clean_transform.py:116-127 `numeric_cols` cast map). */
  def castColumns(df: DataFrame, casts: Map[String, String]): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }

  /** Null out non-positive values — the reference nulls `budget/revenue/
    * runtime <= 0` (clean_transform.py:128-130). */
  def nullifyNonPositive(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, when(col(c) <= 0, lit(null)).otherwise(col(c))))

  /** Null out values failing an arbitrary validity predicate. */
  def nullifyWhere(df: DataFrame, colName: String, invalid: Column): DataFrame =
    df.withColumn(colName, when(invalid, lit(null)).otherwise(col(colName)))

  /** Conditionally null one column based on another — the reference nulls
    * `vote_average` when `vote_count == 0` (clean_transform.py:131-136). */
  def conditionalNull(df: DataFrame, target: String, cond: Column): DataFrame =
    df.withColumn(target, when(cond, lit(null)).otherwise(col(target)))

  /** Placeholder text → null ("No Data", "N/A", …)
    * (reference: clean_transform.py:146-150). */
  def placeholderToNull(df: DataFrame, colName: String, placeholders: Seq[String]): DataFrame =
    df.withColumn(colName,
      when(col(colName).isin(placeholders: _*), lit(null)).otherwise(col(colName)))

  /** Unit scaling, e.g. USD → millions USD (clean_transform.py:131-134). */
  def scaleColumn(df: DataFrame, colName: String, divisor: Double, as: String): DataFrame =
    df.withColumn(as, col(colName) / lit(divisor))

  /** Deterministic keep-first dedup by key: unlike `dropDuplicates`
    * (which keeps an arbitrary row per key), rows are ranked by `order`
    * inside each key and only rank 1 survives
    * (reference: clean_transform.py:153 `dropDuplicates(["id"])`).
    *
    * Scale: one shuffle on `keys`; rank + filter are within-partition.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // collision-proof internal rank column (never leaks into the output)
    val rn = Iterator.from(0).map(i => s"__rn$i").find(!df.columns.contains(_)).get
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** Drop rows with nulls in required columns
    * (reference: clean_transform.py:154 `dropna(subset=...)`). */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** Keep rows with at least `k` non-null values among `cols`
    * (reference: clean_transform.py:155-158 `thresh=10` row filter). */
  def minNonNull(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    val nonNullCount = cols.map(c => when(col(c).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    df.filter(nonNullCount >= k)
  }

  /** Project + reorder + cast to a target column list
    * (reference: clean_transform.py:161-172 final column selection). */
  def project(df: DataFrame, targets: Seq[(String, Column)]): DataFrame =
    df.select(targets.map { case (name, c) => c.as(name) }: _*)

  /** Per-group winsorization: clip `value` into its group's
    * [lo, hi] percentile interval — the outlier treatment that keeps
    * rows (a raw-range filter like [[nullifyNonPositive]] drops or
    * nulls them) so downstream means/regressions aren't dominated by a
    * fat tail. Adds `<value>_w`.
    *
    * `exact = true` (default) computes exact linear-interpolation
    * percentiles — oracle-checkable, one sort-based aggregate per
    * group. At corpus scale prefer `exact = false`:
    * `percentile_approx`'s mergeable sketch keeps the aggregate
    * single-pass with map-side partials (the B4b trade-off). The tiny
    * per-group bounds table broadcasts back; the clip itself is a
    * narrow map. */
  def winsorizeByGroup(
      df: DataFrame, group: Column, value: String,
      lo: Double = 0.05, hi: Double = 0.95,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val out = value + "_w"
    require(!df.columns.contains(out) && !df.columns.contains("__grp"),
      s"winsorizeByGroup reserves columns $out and __grp; rename the input column")
    def pct(p: Double) =
      if (exact) percentile(col(value), lit(p))
      else percentile_approx(col(value), lit(p), lit(accuracy))
    val bounds = df.groupBy(group.as("__grp"))
      .agg(pct(lo).as("__qlo"), pct(hi).as("__qhi"))
    df.join(broadcast(bounds), group <=> col("__grp"))
      .withColumn(out, least(greatest(col(value), col("__qlo")), col("__qhi")))
      .drop("__grp", "__qlo", "__qhi")
  }
}
