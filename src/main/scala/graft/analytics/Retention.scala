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
    val act = df.select(user.as("user_id"), date_trunc("week", ts).as("__w")).distinct()
    val coh = act.groupBy("user_id").agg(min("__w").as("__cw"))
    // act ⋈ coh is user-keyed on both sides — co-partitioned after the
    // aggregates, no extra shuffle
    val j = act.join(coh, "user_id")
      .select(col("__cw"),
        (datediff(col("__w"), col("__cw")) / 7).cast("long").as("week_offset"))
    val r = j.groupBy("__cw", "week_offset").agg(count(lit(1)).as("n_users"))
    val sizes = r.filter(col("week_offset") === 0)
      .select(col("__cw"), col("n_users").as("__size"))
    r.join(sizes, "__cw")
      .select(col("__cw").cast("date").as("cohort_week"),
        col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("__size"), 4).as("retention"))
  }
}
