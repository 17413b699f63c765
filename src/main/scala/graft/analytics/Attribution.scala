package graft.analytics

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch revenue attribution — which upstream touch channels get
  * credit for a conversion's value. [[graft.operators.Relational.asOfJoin]]
  * is single-touch (last-touch = the as-of match); this is the
  * position-based (U-shaped) generalization marketers actually use:
  * first touch 40%, last touch 40%, middle touches split the remaining
  * 20% evenly (one touch takes 100%, two split 50/50).
  */
object Attribution {

  /** Position-based attribution of each conversion's `value` across the
    * entity's touch events inside `(conv_ts - lookbackSeconds, conv_ts)`.
    * Conversions with NO in-window touch attribute to the `"direct"`
    * channel in full. Emits one row per (conversion, credited touch):
    * (conv id column, channel, weight, attributed); same-timestamp
    * touches order by channel name, so the first/last election is
    * deterministic up to identical (ts, channel) rows — which carry
    * interchangeable credit anyway.
    *
    * Touches at exactly `conv_ts` are EXCLUDED (simultaneous events
    * cannot cause each other); touches at exactly `conv_ts - lookback`
    * are included.
    *
    * Scale: the expansion is an equi-join on the entity — per-key work
    * is (touches × conversions) WITHIN one entity's lookback window,
    * bounded by per-user activity, never corpus-wide; AQE splits any
    * residual hot user. The position election is one window over the
    * pair table keyed by conversion — same shuffle, no second pass over
    * the corpus. A cross-entity hot key (bot user) is the [[graft
    * .operators.Relational.saltedJoin]] case.
    */
  def positionBased(
      events: DataFrame,
      entity: Column,
      ts: Column,
      eventType: Column,
      convId: Column,
      value: Column,
      touchTypes: Seq[String],
      convType: String,
      lookbackSeconds: Long): DataFrame = {
    val touches = events.filter(eventType.isin(touchTypes: _*))
      .select(entity.as("__te"), Relational.epochMicros(ts).as("__tus"),
        eventType.as("__ch"))
    val convs = events.filter(eventType === convType)
      .select(entity.as("__e"), Relational.epochMicros(ts).as("__cus"),
        convId.as("conv_id"), value.as("__v"))
    // ONE left join carries untouched conversions through as the null-
    // channel row — a separate anti-join for the 'direct' branch would
    // re-execute the whole pair build (the multi-parent re-execution
    // trap GoldenPlanSpec fences).
    val joined = convs.join(touches,
      col("__e") === col("__te") &&
        col("__tus") < col("__cus") &&
        col("__tus") >= col("__cus") - lookbackSeconds * 1000000L,
      "left")
    // Both window functions share one (partition, order) spec — the
    // count takes an explicit unbounded frame — so they plan into a
    // single WindowExec over a single exchange.
    val wAsc = Window.partitionBy(col("conv_id"))
      .orderBy(col("__tus").asc, col("__ch").asc)
    val wAll = wAsc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .select(col("*"),
        count(col("__ch")).over(wAll).as("__n"),
        row_number().over(wAsc).as("__rn"))
      .withColumn("weight",
        when(col("__n") <= 1, lit(1.0))
          .when(col("__n") === 2, lit(0.5))
          .when(col("__rn") === 1 || col("__rn") === col("__n"), lit(0.4))
          .otherwise(lit(0.2) / (col("__n") - 2)))
      .select(col("conv_id"), coalesce(col("__ch"), lit("direct")).as("channel"),
        col("weight"), (col("weight") * col("__v")).as("attributed"))
  }

  /** Channel rollup of [[positionBased]]: conversions credited, total
    * credited weight, and attributed revenue per channel. */
  def channelSummary(attributed: DataFrame): DataFrame =
    attributed.groupBy("channel")
      .agg(countDistinct(col("conv_id")).as("n_conversions"),
        round(sum(col("weight")), 4).as("total_weight"),
        round(sum(col("attributed")), 4).as("revenue"))
}
