package graft.analytics

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over an event stream — the ops
  * health check next to [[Kpis]]'s aggregates: flag observations that
  * sit far outside their OWN entity's recent history (a user suddenly
  * emitting 100× their usual value; a sensor jumping scales), without
  * any global model or a second pass.
  */
object Anomaly {

  /** Per-entity trailing-window z-score: each observation is scored
    * against the mean/stddev of the `lookback` observations STRICTLY
    * BEFORE it (the observation never polutes its own baseline — a
    * level shift is flagged on arrival, not averaged in). Only rows with
    * a FULL lookback window are evaluated (`evaluated = false` during an
    * entity's warm-up; partial baselines produce noisy scores), and a
    * zero-variance baseline evaluates to z = null (no scale to deviate
    * from).
    *
    * Output: input columns + `z` (null when unevaluable) + `evaluated` +
    * `is_anomaly` (|z| > zThreshold, never null: false when
    * unevaluated). Columns `z`/`evaluated`/`is_anomaly` are RESERVED.
    *
    * Scale: ONE shuffle on the entity; both window aggregates (count for
    * the warm-up gate rides free on avg/stddev's frame) share the same
    * (entity, time) sort — the sessionize/movingAgg plan discipline. The
    * frame is ROWS-based (last `lookback` observations, however spaced);
    * for a wall-clock baseline use [[Relational.movingAgg]]'s RANGE
    * formulation instead. `tieBreak` must make per-entity ordering total
    * for determinism. */
  def rollingZScore(
      df: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      lookback: Int,
      zThreshold: Double,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(lookback >= 2, "lookback must be >= 2 (stddev_samp needs 2 observations)")
    Seq("z", "evaluated", "is_anomaly", "__us", "__n", "__mu", "__sd").foreach(c =>
      require(!df.columns.contains(c),
        s"rollingZScore reserves output column '$c'; rename the input column"))
    // The order key is STAGED once and the three aggregates attach in
    // one select over it: per-withColumn window expressions each
    // re-derive the computed order key under fresh exprIds, so Catalyst
    // sees three distinct window specs and plans three WindowExec +
    // sorts (measured); this shape plans ONE.
    val w = Window.partitionBy(entity)
      .orderBy(col("__us").asc +: tieBreak.map(_.asc): _*)
      .rowsBetween(-lookback, -1)
    df.withColumn("__us", Relational.epochMicros(ts))
      .select(col("*"),
        count(value).over(w).as("__n"),
        avg(value).over(w).as("__mu"),
        stddev_samp(value).over(w).as("__sd"))
      .withColumn("evaluated", col("__n") === lookback)
      .withColumn("z",
        when(col("__n") === lookback && col("__sd") > 0, (value - col("__mu")) / col("__sd")))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > zThreshold, lit(false)))
      .drop("__us", "__n", "__mu", "__sd")
  }

  /** CUSUM changepoint detection per series (Page 1954, the tabular
    * two-sided form): standardize each point against the series' own
    * moments, then run the recurrences S⁺ₜ = max(0, S⁺ₜ₋₁ + zₜ − k),
    * S⁻ₜ = max(0, S⁻ₜ₋₁ − zₜ − k) and raise an alarm where either
    * exceeds `threshold` h, RESETTING that side to 0 after its alarm so
    * multiple level shifts in one series each fire once. `slack` k
    * absorbs drift ≤ k·σ; h ≈ 4-5 gives the classic ARL trade-off.
    *
    * The recurrence is a non-linear scan — inexpressible as a window
    * aggregate — so each series folds SEQUENTIALLY: per-key
    * `sort_array(collect_list)` then one `aggregate` HOF pass. That is
    * exactly the right scale shape for the intended input: the
    * ALREADY-DOWNSAMPLED series table (daily/bucket aggregates, the
    * calendar-bounded b14/b24 class), where a series is tens-to-
    * thousands of points — never the raw corpus (downsample first, as
    * `b26_cusum` does; the corpus-scale reduction is the one shuffle).
    * Moments ride the same grouped pass; a zero-variance series has no
    * scale to standardize against and emits nothing.
    *
    * Output: one row per alarm (key, idx, direction) — `direction`
    * "up"/"down", `idx` the series index where the statistic crossed. */
  def cusum(series: DataFrame, key: Column, idx: Column, value: Column,
            slack: Double = 0.5, threshold: Double = 4.0): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val s = series
      .select(key.as("__g"), idx.cast("long").as("__i"),
        value.cast("double").as("__x"))
      .filter(col("__g").isNotNull && col("__i").isNotNull && col("__x").isNotNull)
    val folded = s.groupBy("__g")
      .agg(sort_array(collect_list(struct(col("__i"), col("__x")))).as("__s"),
        avg(col("__x")).as("__mu"), stddev_pop(col("__x")).as("__sd"))
      .filter(col("__sd") > 0)
      .withColumn("__alarms", aggregate(
        col("__s"),
        struct(lit(0.0).as("sp"), lit(0.0).as("sn"),
          array().cast("array<struct<idx:bigint,direction:string>>").as("al")),
        (acc, e) => {
          // null divisor (not 0) when sd=0: the optimizer may evaluate
          // this fold before the sd>0 filter lands, and ANSI mode turns
          // /0 into an error while /null is null (greatest() then skips
          // it, so the dropped row folds to no alarms); for surviving
          // rows the division is bit-identical to a plain /sd
          val z = (e.getField("__x") - col("__mu")) /
            when(col("__sd") =!= 0, col("__sd"))
          val spRaw = greatest(lit(0.0), acc.getField("sp") + z - lit(slack))
          val snRaw = greatest(lit(0.0), acc.getField("sn") - z - lit(slack))
          val up = spRaw > threshold
          val down = snRaw > threshold
          val hits = concat(
            when(up, array(struct(e.getField("__i").as("idx"),
              lit("up").as("direction")))).otherwise(array().cast(
              "array<struct<idx:bigint,direction:string>>")),
            when(down, array(struct(e.getField("__i").as("idx"),
              lit("down").as("direction")))).otherwise(array().cast(
              "array<struct<idx:bigint,direction:string>>")))
          struct(
            when(up, lit(0.0)).otherwise(spRaw).as("sp"),
            when(down, lit(0.0)).otherwise(snRaw).as("sn"),
            concat(acc.getField("al"), hits).as("al"))
        }))
    folded
      .select(col("__g").as("key"), explode(col("__alarms.al")).as("__a"))
      .select(col("key"), col("__a.idx").as("idx"),
        col("__a.direction").as("direction"))
  }
}
