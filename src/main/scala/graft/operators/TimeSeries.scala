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

  /** Holt double (level + trend) exponential smoothing per series, with
    * an h-step-ahead linear forecast — the forward-looking complement
    * of [[acf]]'s persistence fingerprint and [[graft.analytics.Anomaly.cusum]]'s
    * changepoint alarm: capacity planning and drift-aware budget
    * forecasts over the same downsampled per-key series tables.
    *
    *   l₁ = x₁, b₁ = x₂ − x₁ (the standard first-difference init);
    *   lₜ = α·xₜ + (1−α)(lₜ₋₁ + bₜ₋₁)
    *   bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁
    *   forecast(h) = lₙ + h·bₙ
    *
    * The recurrence couples level and trend — a non-linear scan no
    * window aggregate expresses — so each series folds SEQUENTIALLY
    * exactly like CUSUM: per-key `sort_array(collect_list)` + one
    * `aggregate` HOF pass. Correct at scale for the same reason: the
    * contract input is the ALREADY-DOWNSAMPLED series table (daily /
    * bucket aggregates, the calendar-bounded b14/b24/b26 class), never
    * the raw corpus — the corpus-scale reduction is the one shuffle
    * upstream. One-step-ahead SSE rides the same fold (the model-fit
    * diagnostic: compare against a naive-last-value SSE to decide the
    * trend term earns its keep). Gaps in `idx` are treated as
    * consecutive observations (index order, not calendar distance —
    * gap-fill with [[gapFillLocf]] first when that matters). Series
    * with < 2 points have no trend to initialize and emit nothing.
    *
    * Output: one row per key — n, level, trend, forecast, sse. */
  def holtSmooth(series: DataFrame, key: Column, idx: Column, value: Column,
                 alpha: Double, beta: Double, horizon: Int = 1): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val s = series
      .select(key.as("__g"), idx.cast("long").as("__i"),
        value.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__i").isNotNull && col("__x").isNotNull)
    s.groupBy("__g")
      .agg(sort_array(collect_list(struct(col("__i"), col("__x")))).as("__s"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .withColumn("__f", aggregate(
        // fold from t=3: under the first-difference init the t=2 step
        // collapses algebraically — l₂ = αx₂ + (1−α)(x₁+(x₂−x₁)) = x₂,
        // b₂ = β(x₂−x₁) + (1−β)(x₂−x₁) = x₂−x₁, one-step error 0 — so
        // the seed IS the post-t=2 state, independent of α/β
        slice(col("__s"), lit(3), greatest(size(col("__s")) - 2, lit(0))),
        struct(
          element_at(col("__s"), 2).getField("__x").as("l"),
          (element_at(col("__s"), 2).getField("__x") -
            element_at(col("__s"), 1).getField("__x")).as("b"),
          lit(0.0).as("sse")),
        (acc, e) => {
          val prev = acc.getField("l") + acc.getField("b")
          val l = e.getField("__x") * lit(alpha) + prev * lit(1 - alpha)
          val b = (l - acc.getField("l")) * lit(beta) +
            acc.getField("b") * lit(1 - beta)
          struct(l.as("l"), b.as("b"),
            (acc.getField("sse") + pow(e.getField("__x") - prev, 2)).as("sse"))
        }))
      .select(col("__g").as("key"), col("n"),
        col("__f.l").as("level"), col("__f.b").as("trend"),
        (col("__f.l") + col("__f.b") * lit(horizon.toDouble)).as("forecast"),
        col("__f.sse").as("sse"))
  }

  /** Classical additive seasonal decomposition x = trend + seasonal +
    * residual per key (the moving-average method behind "deseasonalize
    * before you compare weeks"): trend = centered moving average over
    * one `period` (even periods use the standard 2×MA — the mean of the
    * two half-offset period averages), seasonal = the per-season-index
    * mean of the detrended series re-centered to sum to zero, residual
    * = what neither explains. The calendar-structure complement of
    * B24's ACF (ACF detects the period; this removes it) and the
    * pre-pass that makes B26's changepoint alarms ignore weekends.
    *
    * CONTRACT: a REGULAR series — `idx` consecutive integers per key
    * (densify with [[gapFillLocf]] or index by `row_number` first);
    * the rows-frame moving average equals the time-range average only
    * then, and season = idx mod period only aligns then. Edge rows
    * without a full window have null trend/residual (never a
    * shortened-window estimate — those leak level shifts into the
    * seasonal profile). All windows are per-key over the downsampled
    * series (the b14/b24 benign class, ONE WindowExec — every frame
    * shares the (key, idx) spec); the seasonal profile is a
    * (key × period)-bounded aggregate joined back key-hashed.
    *
    * Output: (key, idx, x, season, trend, seasonal, resid). */
  def seasonalDecompose(series: DataFrame, key: Column, idx: Column,
                        value: Column, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val s = series
      .select(key.as("__g"), idx.cast("long").as("__i"),
        value.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__i").isNotNull && col("__x").isNotNull)
    val w = Window.partitionBy("__g").orderBy("__i")
    val h = period / 2
    val trend =
      if (period % 2 == 1) {
        val f = w.rowsBetween(-h, h)
        when(count(col("__x")).over(f) === period, avg(col("__x")).over(f))
      } else {
        val f1 = w.rowsBetween(-h, h - 1)
        val f2 = w.rowsBetween(-h + 1, h)
        when(count(col("__x")).over(f1) === period &&
            count(col("__x")).over(f2) === period,
          (avg(col("__x")).over(f1) + avg(col("__x")).over(f2)) / 2.0)
      }
    // the detrended table feeds the profile aggregate AND the final
    // join (and the profile itself has two consumers) — without
    // truncation the scan + windows re-execute once per consumer
    // (measured: windows=6 for a 2-window plan); truncated once, the
    // corpus-side work runs exactly once
    val det = graft.operators.Lineage.truncate(
      s.withColumn("__season", pmod(col("__i"), lit(period.toLong)))
        .withColumn("__trend", trend))
    val prof = det.filter(col("__trend").isNotNull)
      .groupBy("__g", "__season")
      .agg(avg(col("__x") - col("__trend")).as("__sraw"))
    // re-center so the seasonal profile sums to zero per key — level
    // belongs to the trend, not the season (profile table is
    // (key × period)-bounded; the second aggregate + join are both
    // profile-scale)
    val centered = prof.join(
        prof.groupBy("__g").agg(avg(col("__sraw")).as("__smean")), "__g")
      .select(col("__g"), col("__season"),
        (col("__sraw") - col("__smean")).as("seasonal"))
    det.join(centered, Seq("__g", "__season"), "left")
      .select(col("__g").as("key"), col("__i").as("idx"), col("__x").as("x"),
        col("__season").as("season"), col("__trend").as("trend"),
        col("seasonal"),
        (col("__x") - col("__trend") - col("seasonal")).as("resid"))
  }

  /** Mann-Kendall trend test per series: S = Σ_{i<j} sign(x_j − x_i)
    * with the tie-corrected normal approximation — IS there a monotone
    * trend, where [[theilSen]] says how steep (run them together: MK's
    * p decides, Theil-Sen's slope quantifies; both are rank-class
    * robust where OLS t-tests break on spikes). Same distributed shape
    * as theilSen — the strict (i<j) key-hashed self-equi-join over the
    * ALREADY-DOWNSAMPLED series, pair terms partial-aggregate map-side;
    * tie counts for the variance come from a per-(key, value) aggregate,
    * never a window. Var(S) = (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18 and
    * z applies the ±1 continuity correction (z = (S∓1)/σ, 0 at S=0);
    * the two-sided `p_approx` shares [[graft.analytics.Stats]]'
    * Abramowitz-Stegun Φ polynomial (identical closed form in the
    * oracle). Series with < 2 points or zero variance emit null z/p. */
  def mannKendall(series: DataFrame, key: Column, idx: Column,
                  value: Column): DataFrame = {
    val s = series
      .select(key.as("__g"), idx.cast("long").as("__i"),
        value.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__i").isNotNull && col("__x").isNotNull)
    val b = s.select(col("__g").as("__bg"), col("__i").as("__bi"),
      col("__x").as("__bx"))
    val pairs = s.join(b, col("__g") === col("__bg") && col("__i") < col("__bi"))
      .groupBy(col("__g"))
      .agg(sum(signum(col("__bx") - col("__x"))).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val ties = s.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__dv"), sum(col("__t")).as("n"),
        sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5)).cast("double")
          .as("__tsum"))
    val n = col("n").cast("double")
    val varS = (n * (n - 1) * (n * 2 + 5) - col("__tsum")) / 18.0
    val sd = sqrt(varS)
    val z = when(col("s_stat") > 0, (col("s_stat") - 1) / nullif(sd, lit(0.0)))
      .when(col("s_stat") < 0, (col("s_stat") + 1) / nullif(sd, lit(0.0)))
      .otherwise(when(sd > 0, lit(0.0)))
    pairs.join(ties, "__g")
      .select(col("__g").as("key"), col("n"), col("n_pairs"),
        col("s_stat").cast("long").as("s_stat"), z.as("z"))
      .withColumn("p_approx",
        when(col("z").isNotNull,
          lit(2.0) * (lit(1.0) - graft.analytics.Stats.phi(abs(col("z"))))))
  }

  /** Exact interpolated median of a sorted array: the mean of the two
    * middle elements when even-length (n=1 → the element itself) —
    * matches SQL `median`/`quantile_cont(0.5)` semantics exactly. */
  private def sortedMedian(arr: Column): Column = {
    val n = size(arr)
    (element_at(arr, floor((n + 1) / lit(2.0)).cast("int")) +
      element_at(arr, (floor(n / lit(2.0)) + 1).cast("int"))) / 2.0
  }

  /** Theil-Sen robust trend estimate per series: slope = median of all
    * C(n,2) pairwise slopes (x_k−x_j)/(i_k−i_j), intercept = median of
    * the per-point residuals x_t − slope·i_t — the 29%-breakdown-point
    * replacement for least squares when a spiky series (outage days,
    * bot bursts) would drag an OLS line; pairs [[holtSmooth]] (which
    * chases recent level) with a robust LONG-RUN direction.
    *
    * Pairs come from a key-hashed self-equi-join with the strict
    * `i_j < i_k` predicate — the join key is the series key, so skew is
    * bounded by series LENGTH not corpus size; like every operator in
    * this family the contract input is the ALREADY-DOWNSAMPLED series
    * table (calendar-bounded b14/b24/b26 class — a 3-year daily series
    * is ~600k pairs per key, one combiner's work; downsample first,
    * never feed the raw corpus). Medians are the exact interpolated
    * order statistic over the per-key sorted slope/residual arrays
    * (even count → mean of the middles, matching SQL `median`), so the
    * whole estimate is engine-mirrorable. Vertical pairs cannot occur
    * (equal idx collapses to one strict-inequality side); series with
    * < 2 points have no pair and emit nothing.
    *
    * Output: one row per key — n, n_pairs, slope, intercept. */
  def theilSen(series: DataFrame, key: Column, idx: Column,
               value: Column): DataFrame = {
    val s = series
      .select(key.as("__g"), idx.cast("long").as("__i"),
        value.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__i").isNotNull && col("__x").isNotNull)
    val b = s.select(col("__g").as("__bg"), col("__i").as("__bi"),
      col("__x").as("__bx"))
    val slopes = s.join(b, col("__g") === col("__bg") && col("__i") < col("__bi"))
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(
          (col("__bx") - col("__x")) / (col("__bi") - col("__i")))).as("__sl"),
        count(lit(1)).as("n_pairs"))
      .select(col("__g"), col("n_pairs"), sortedMedian(col("__sl")).as("slope"))
    s.join(slopes, "__g")
      .groupBy(col("__g"), col("n_pairs"), col("slope"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("__x") - col("slope") * col("__i"))).as("__r"))
      .select(col("__g").as("key"), col("n"), col("n_pairs"),
        col("slope"), sortedMedian(col("__r")).as("intercept"))
  }
}
