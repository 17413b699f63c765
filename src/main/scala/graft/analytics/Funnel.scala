package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many users complete step 1, then step 2
  * AFTER their step-1 time, then step 3 after that — the conversion
  * query behind every product analytics tool, and a semantics an
  * equi-join cannot express (each step's matching event depends on the
  * PREVIOUS step's matched time).
  *
  * Implementation: one shuffle on the user, then a CHAIN of
  * full-partition window minima — step i's time is
  * `min(ts WHERE type = sᵢ AND ts > tᵢ₋₁)` over the user's partition,
  * with tᵢ₋₁ a materialized column from the previous window pass, so
  * all k windows share one exchange and no self-joins appear at all
  * (the naive formulation is k−1 user-keyed join-aggregates). The
  * final count is a single tiny aggregate.
  */
object Funnel {

  /** (step_index, step, n_users, conversion) — users reaching each
    * step in order; `conversion` = n_users / step-1 users, 4 dp.
    * `maxSpanSeconds` bounds the whole funnel: every step must land
    * within that many seconds of the user's step-1 time. */
  def funnel(
      events: DataFrame,
      user: Column,
      ts: Column,
      typeCol: Column,
      steps: Seq[String],
      maxSpanSeconds: Option[Long] = None): DataFrame = {
    val perUser = stepTimes(events, user, ts, typeCol, steps, maxSpanSeconds)
    val nCols = steps.indices.map(i =>
      sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)).as(s"__n${i + 1}"))
    val counts = perUser.agg(nCols.head, nCols.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1L).as("step_index"), lit(step).as("step"),
        col(s"__n${i + 1}").as("n_users"),
        round(when(col("__n1") > 0,
          col(s"__n${i + 1}").cast("double") / col("__n1")), 4).as("conversion"))
    }
    counts.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Per-user funnel step times: one row per step-1 user with
    * `(user, t1, ..., tk)` — tᵢ = the user's ordered step-i time, null
    * from the first missed step on. The raw material for
    * time-to-convert distributions (B12), cohort segmentation by
    * funnel depth, and drop-off root-causing — everything [[funnel]]
    * aggregates away. Same plan as [[funnel]] up to the per-user
    * rollup: one user shuffle, chained window minima, zero self-joins. */
  def stepTimes(
      events: DataFrame,
      user: Column,
      ts: Column,
      typeCol: Column,
      steps: Seq[String],
      maxSpanSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    maxSpanSeconds.foreach(s => require(s > 0, s"maxSpanSeconds must be positive, got $s"))
    val wu = Window.partitionBy(col("__u"))
    val base = events.select(user.as("__u"), ts.as("__ts"), typeCol.as("__e"))
    val withTimes = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("__e") === step
        else {
          val afterPrev = col("__e") === step && col("__ts") > col(s"__t$i")
          maxSpanSeconds.fold(afterPrev)(s =>
            afterPrev && col("__ts") <= col("__t1") + expr(s"INTERVAL $s SECONDS"))
        }
      df.withColumn(s"__t${i + 1}", min(when(cond, col("__ts"))).over(wu))
    }
    stepTimesFrom(withTimes, steps.size)
  }

  /** Per-user rollup of the chained window columns; step-1 users only
    * (a funnel that never started is not a funnel row). */
  private def stepTimesFrom(withTimes: DataFrame, nSteps: Int): DataFrame = {
    val tCols = (0 until nSteps).map(i => max(col(s"__t${i + 1}")).as(s"t${i + 1}"))
    withTimes.groupBy(col("__u").as("user")).agg(tCols.head, tCols.tail: _*)
      .filter(col("t1").isNotNull)
  }
}
