package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis: for each signup cohort (a user's first
  * active period), what share of its users is still active k periods
  * later — the canonical product-analytics triangle, and the exact
  * formulation behind the reference's "franchise longevity" style
  * questions generalized to any (user, timestamp) event table. The
  * EXACT counterpart of the C8e theta-sketch overlap: run this for the
  * precise triangle, keep theta state for ad-hoc cohort algebra
  * without rescans.
  *
  * Scale: the (user, period) distinct is the dominant shuffle —
  * map-side partial dedup collapses each user's in-partition repeats,
  * so the shuffle carries ≤ (users × active periods) rows, not raw
  * events. Cohorts derive from a per-user min (second, user-keyed
  * aggregate over the already-distinct table) and the final (cohort,
  * offset) aggregate is tiny. Nothing pairwise, no windows over
  * unbounded partitions.
  */
object Retention {

  /** (cohort_week, week_offset, n_users, retention) — one row per
    * cohort × offset with at least one active user. `retention` is
    * n_users / cohort size (offset-0 count of the same cohort).
    * Weeks are ISO `date_trunc("week")` Mondays. */
  def cohortRetention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = df.select(user.as("user_id"), date_trunc("week", ts).as("__w")).distinct()
    // cohort and cohort-size come from WINDOWS, not groupBy+self-join:
    // a join-back formulation gives the expensive (user, week) distinct
    // TWO plan parents, and Spark re-executes the subtree per parent
    // (the c20/rebalanceToMix lesson — lineage must stay linear)
    val withCoh = act.withColumn("__cw",
      min(col("__w")).over(Window.partitionBy(col("user_id"))))
    val r = withCoh
      .select(col("__cw"), (datediff(col("__w"), col("__cw")) / 7).cast("long").as("week_offset"))
      .groupBy("__cw", "week_offset").agg(count(lit(1)).as("n_users"))
    r.withColumn("__size",
        max(when(col("week_offset") === 0, col("n_users"))).over(Window.partitionBy(col("__cw"))))
      .select(col("__cw").cast("date").as("cohort_week"),
        col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("__size"), 4).as("retention"))
  }
}
