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
}
