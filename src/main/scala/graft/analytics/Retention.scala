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

  /** Shifted-beta-geometric retention projection (Fader & Hardie 2007,
    * "How to Project Customer Retention"): each customer churns with a
    * personal probability θ drawn Beta(α, β) — two parameters explain
    * why aggregate retention curves flatten (high-θ users leave first,
    * survivors are selected for stickiness), and a 4-period curve
    * projects to any horizon. THE principled replacement for
    * eyeballing [[cohortRetention]]'s triangle or fitting an
    * exponential that always over-predicts churn.
    *
    * Fit: exact aggregate likelihood Σ_t d_t·ln p_t + n_T·ln S_T over a
    * DECLARATIVE (α, β) grid — `gridSteps²` candidates at `gridStep`
    * spacing (rational grid points: both engines derive identical
    * doubles), each candidate's p/S series from the sBG recurrences
    * p₁ = α/(α+β), p_t = p_{t−1}(β+t−2)/(α+β+t−1),
    * S_t = S_{t−1}(β+t−1)/(α+β+t−1) folded SEQUENTIALLY (identical op
    * order to the oracle's recursive CTE — no Γ/lgamma closed form:
    * Spark has no lgamma, and two different FP paths would make the
    * argmax engine-dependent). Grid×horizon work is bounded
    * (gridSteps²·max(T,horizon) scalar steps — thousands), the curve
    * itself is calendar-bounded: nothing here is corpus-scale; the
    * corpus-scale stage is whatever produced the curve.
    *
    * Contract: `curve` is ONE cohort's (t, n) with contiguous offsets
    * 0..T and non-increasing n (a survival curve; activity blips that
    * resurrect users violate sBG — negative churn steps contribute 0
    * and are visible in `ll`, documented). Contiguity is ENFORCED: the
    * fold indexes the collected curve positionally while T is the max
    * offset VALUE, so a gapped curve (an inactive week emitting no row)
    * would silently misalign every churn step — a `raise_error` guard
    * fails loud instead (densify gapped curves to n=0 rows first, as
    * the b38_sbg driver query does). Ties in the grid argmax
    * break toward larger (α, β) lexicographically (deterministic).
    *
    * Output: one row per t = 0..horizon — t, observed share (null past
    * T), projected share, and the fitted alpha/beta/ll on every row. */
  def sbgProjection(curve: DataFrame, t: Column, n: Column, horizon: Int,
                    gridSteps: Int = 60, gridStep: Double = 0.1): DataFrame = {
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    require(gridSteps >= 2 && gridSteps <= 200, s"gridSteps in [2,200], got $gridSteps")
    require(gridStep > 0, s"gridStep must be positive, got $gridStep")
    val c = curve
      .select(t.cast("int").as("__t"), n.cast("double").as("__n"))
      .filter(col("__t").isNotNull && col("__n").isNotNull && col("__t") >= 0)
    val arr = c.agg(sort_array(collect_list(struct(col("__t"), col("__n")))).as("__c"),
      max(col("__t")).as("__Tm"), count(lit(1)).as("__k"),
      count_distinct(col("__t")).as("__kd"))
      // positional fold below ⇔ offsets are exactly 0..T with no gaps
      // and no duplicates; anything else would misindex silently.
      // Distinctness must be checked EXPLICITLY: a duplicate offset
      // can exactly compensate a gap's row count ((0,1,1,3) has k = 4
      // = maxT + 1), so count == maxT+1 alone is foolable
      // try_element_at, not element_at: an EMPTY curve has no element 1
      // and under ANSI a bare element_at dies with an opaque
      // INVALID_ARRAY_INDEX error before the guard can speak; the null
      // falls through to the raise_error branch with the real message
      .withColumn("__T",
        when(col("__kd") === col("__k") && col("__k") === col("__Tm") + 1 &&
            try_element_at(col("__c"), lit(1)).getField("__t") === 0, col("__Tm"))
          .otherwise(raise_error(concat(
            lit("sbgProjection: curve offsets must be contiguous 0..T "),
            lit("with no gaps/duplicates; got max(t)="),
            // an EMPTY curve nulls these aggregates, and a null inside
            // concat would null the whole message (raise_error "null")
            coalesce(col("__Tm").cast("string"), lit("null")), lit(" over "),
            col("__k").cast("string"), lit(" rows ("),
            col("__kd").cast("string"), lit(" distinct)")))))
      .drop("__Tm", "__k", "__kd")
    val cand = arr
      .withColumn("__i", explode(sequence(lit(1), lit(gridSteps))))
      .withColumn("__j", explode(sequence(lit(1), lit(gridSteps))))
      .select((col("__i") * gridStep).as("__a"), (col("__j") * gridStep).as("__b"),
        col("__c"), col("__T"))
    val kMax = greatest(col("__T"), lit(horizon))
    val a = col("__a"); val b = col("__b")
    val folded = cand.withColumn("__f", aggregate(
      sequence(lit(1), kMax),
      struct(lit(0.0).as("p"), lit(1.0).as("s"), lit(0.0).as("ll"),
        lit(0.0).as("sT"),
        array().cast("array<struct<t:int,s:double>>").as("ss")),
      (acc, i) => {
        val p = when(i === 1, a / (a + b))
          .otherwise(acc.getField("p") * (b + i - 2) / (a + b + i - 1))
        val s = acc.getField("s") * (b + i - 1) / (a + b + i - 1)
        // churn at step i — defined only while observed (i ≤ T);
        // negative steps (resurrection) clamp to 0 by contract
        val d = greatest(
          element_at(col("__c"), i).getField("__n") -
            element_at(col("__c"), i + 1).getField("__n"), lit(0.0))
        val ll = acc.getField("ll") +
          when(i <= col("__T"), d * log(p)).otherwise(lit(0.0))
        struct(p.as("p"), s.as("s"), ll.as("ll"),
          when(i === col("__T"), s).otherwise(acc.getField("sT")).as("sT"),
          concat(acc.getField("ss"),
            array(struct(i.cast("int").as("t"), s.as("s")))).as("ss"))
      }))
      .select(a.as("alpha"), b.as("beta"), col("__c"), col("__T"),
        (col("__f.ll") +
          element_at(col("__c"), col("__T") + 1).getField("__n") *
            log(col("__f.sT"))).as("ll"),
        col("__f.ss").as("__ss"))
    // grid argmax — lexicographic (ll, alpha, beta) max, deterministic
    val best = folded.agg(
      max_by(struct(col("alpha"), col("beta"), col("ll"), col("__ss"),
        col("__c"), col("__T")),
        struct(col("ll"), col("alpha"), col("beta"))).as("__w"))
      .select(col("__w.*"))
    val n0 = element_at(col("__c"), 1).getField("__n")
    best
      .select(col("alpha"), col("beta"), col("ll"), col("__c"), col("__T"), n0.as("__n0"),
        explode(concat(array(struct(lit(0).as("t"), lit(1.0).as("s"))),
          col("__ss"))).as("__r"))
      .filter(col("__r.t") <= horizon)
      .select(col("__r.t").as("t"),
        when(col("__r.t") <= col("__T"),
          element_at(col("__c"), col("__r.t") + 1).getField("__n") / col("__n0"))
          .as("observed"),
        col("__r.s").as("projected"),
        col("alpha"), col("beta"), col("ll"))
  }
}
