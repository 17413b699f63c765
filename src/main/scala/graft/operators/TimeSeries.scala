package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: make an irregular per-key daily
  * series dense (one row per key per day between that key's first and
  * last observation) and forward-fill observation columns across the
  * introduced gaps (LOCF — last observation carried forward).
  *
  * The reference's KPI tables implicitly assume dense periods (a missing
  * month simply vanishes from a pandas groupby — reference:
  * analytics/kpis.py per-period tables); this operator makes the
  * missing periods explicit, which is what trend/rolling consumers
  * (C14 moving aggregate, C32 anomaly baselines) need to not silently
  * skip over holes.
  */
object TimeSeries {

  /** Gap-fill `df` (at most ONE row per (`keys`, `dateCol`) — pre-agg
    * first) to a dense daily spine per key, appending `filled_<c>`
    * (LOCF) for each value column and an `is_gap` flag for spine-added
    * rows. Observed values ride through unchanged (nulls on gap rows);
    * an observed-but-null value still carries the prior observation
    * (is_gap ≠ is_null — presence is what suppresses the carry, not
    * value nullness). Leading gaps cannot occur: each key's spine
    * starts at its own first observed day.
    *
    * Plan — deliberately join-free: each observed row GENERATES the gap
    * days up to its successor (`lead` + `sequence`+`explode` to
    * `lead(day) - 1`), so the spine inherits its source row and LOCF
    * needs no spine⋈observations equi-join. ONE scan, ONE key shuffle
    * shared by both windows (lead, then the fill — all fill columns
    * attach in a single select; per-withColumn attachment re-derives
    * the sort each time, the C32 lesson), ONE generate whose
    * amplification is bounded by calendar span, not data volume. The
    * first cut of this operator built the spine from a per-key
    * min/max aggregate and joined back: 2 scans + 3 shuffles — the
    * multi-parent re-execution trap; this form is 1 scan + 1 shuffle.
    */
  def gapFillLocf(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty, "gapFillLocf needs keys and valueCols")
    require(valueCols.forall(df.columns.contains), "valueCols must exist in df")
    (Seq("is_gap", "__next", "__day") ++ valueCols.map("filled_" + _)).foreach(c =>
      require(!df.columns.contains(c),
        s"gapFillLocf reserves output column '$c'; rename the input column"))
    val k = keys.map(col)
    val others = df.columns.filterNot(c => keys.contains(c) || c == dateCol).toSeq
    val w = Window.partitionBy(k: _*).orderBy(col(dateCol))
    // greatest(...) clamps a contract-violating duplicate (key, date) to
    // a single-day sequence instead of a DESCENDING one (garbage stays
    // bounded; it does not explode)
    val expanded = df
      .withColumn("__next", lead(col(dateCol), 1).over(w))
      .withColumn("__day", explode(sequence(col(dateCol),
        greatest(coalesce(date_sub(col("__next"), 1), col(dateCol)), col(dateCol)))))
    val isGap = col("__day") =!= col(dateCol)
    val gapNulled = others.map(c => when(isGap, lit(null)).otherwise(col(c)).as(c))
    val base = expanded.select(
      (k :+ col("__day").as(dateCol)) ++ gapNulled :+ isGap.as("__gap"): _*)
    val w2 = Window.partitionBy(k: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fills = valueCols.map(c => last(col(c), ignoreNulls = true).over(w2).as(s"filled_$c"))
    base.select((k :+ col(dateCol)) ++ others.map(col) ++ fills
      :+ col("__gap").as("is_gap"): _*)
  }

  /** OHLC (candlestick) downsampling: per (`keys`, time bucket) emit
    * open / high / low / close / volume / vwap over `value` — the
    * canonical irregular-series → regular-bars reduction (market data,
    * sensor rollups, metric pre-aggregation for dashboards).
    *
    * ONE partial-aggregating shuffle: open and close are
    * `min_by`/`max_by` over the (ts, tieBreak...) struct — order
    * resolves inside the aggregate with map-side combine, NO window and
    * NO per-bucket sort, so a hot bucket costs a combiner, not a
    * straggler task. Ties at identical timestamps break by `tieBreak`
    * (supply a unique id for determinism — the C10 discipline).
    * `bucket` is any Spark interval string (`"1 day"`, `"15 minutes"`).
    * `vwap` weights by `weight` (trade size; `lit(1.0)` → plain mean);
    * zero-total-weight buckets yield null vwap, not a division error. */
  def ohlcBars(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      value: Column,
      bucket: String,
      tieBreak: Seq[Column] = Nil,
      weight: Column = lit(1.0)): DataFrame = {
    val orderKey = struct((Relational.epochMicros(ts) +: tieBreak): _*)
    df.groupBy(keys :+ window(ts, bucket).as("__win"): _*)
      .agg(
        min_by(value, orderKey).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, orderKey).as("close"),
        count(lit(1)).as("volume"),
        (sum(value * weight) / when(sum(weight) =!= 0, sum(weight))).as("vwap"))
      .withColumn("bucket_start", col("__win.start"))
      .drop("__win")
  }

  /** Sample autocorrelation function per series: for each key and each
    * lag l in 1..maxLag, the standard biased estimator
    * ρ̂(l) = Σ_{t>l} (x_t − x̄)(x_{t−l} − x̄) / (n·σ̂²_pop) — the
    * seasonality/persistence fingerprint of a metric series (ρ̂ at the
    * period spikes for seasonal series; slow decay flags trends).
    *
    * Entirely WINDOW-FREE, unlike the textbook lag()-based version: a
    * global-order window is a single unsplittable partition per key.
    * Here per-key mean/variance ride one aggregate, the lag axis is an
    * `explode(sequence(1..maxLag))` (bounded literal), and lagged pairs
    * come from a (key, idx−l) EQUI-join of the series against itself —
    * every shuffle key-hashed, every aggregate partial. Keys here are
    * series identities and `idx` an integer time index (days, buckets);
    * the input is the already-downsampled series table (calendar-
    * bounded, the b14/b11 benign class — ohlcBars/tumbling buckets
    * produce it from the raw corpus).
    *
    * Gaps in `idx` simply contribute no pair at the lags they break
    * (the aligned-pairs treatment); a zero-variance or too-short series
    * yields null ρ̂, never a division error. */
  def acf(series: DataFrame, key: Column, idx: Column, value: Column,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = series
      .select(key.as("__g"), idx.cast("long").as("__i"),
        value.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__i").isNotNull && col("__x").isNotNull)
    val st = s.groupBy("__g").agg(avg(col("__x")).as("__mu"),
      count(lit(1)).as("n"), var_pop(col("__x")).as("__vp"))
    val a = s.join(st, "__g")
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
    val b = s.select(col("__g"), col("__i").as("__bi"), col("__x").as("__bx"))
    a.join(b, a("__g") === b("__g") && col("__bi") === col("__i") - col("lag"))
      .groupBy(a("__g").as("key"), col("lag"))
      .agg(
        max(col("n")).as("n"),
        (sum((col("__x") - col("__mu")) * (col("__bx") - col("__mu"))) /
          when(max(col("n") * col("__vp")) =!= 0, max(col("n") * col("__vp")))
        ).as("acf"))
  }
}
