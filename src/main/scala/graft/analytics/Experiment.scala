package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment analysis over an event stream — the decision layer on
  * top of the reference's KPI tables (kpis.py computes per-group means;
  * an experiment readout needs the same aggregates per VARIANT plus a
  * significance statement, or the "winning" variant is noise).
  *
  * Exposure grain is the ENTITY, not the event: a user who converts
  * five times still counts once, so heavy users cannot drag a variant's
  * rate (the classic per-event-rate inflation bug). The plan is one
  * entity-keyed partial-aggregating shuffle (corpus-scale), then a
  * |variants|-row aggregate — no windows, no joins, no collect; at
  * 100 TB the event table is touched exactly once.
  */
object Experiment {

  /** Deterministic hash split for entities into `n` variants labeled
    * 'A', 'B', … — md5-derived (engine-agnostic, mirrorable in any SQL
    * dialect), salted per experiment so concurrent experiments get
    * independent assignments. Pure narrow map. */
  def assignVariant(entity: Column, experiment: String, n: Int = 2): Column = {
    require(n >= 2 && n <= 26, s"variant count must be in [2, 26], got $n")
    val bucket = pmod(
      conv(substring(md5(concat(entity.cast("string"), lit(experiment))), 1, 15), 16, 10)
        .cast("long"),
      lit(n.toLong))
    // chr(65 + b) = 'A' + b
    char(bucket + lit(65))
  }

  /** Per-variant readout: exposed entities, converted entities,
    * conversion rate, and converted-value sum. `converted` and `value`
    * are evaluated per EVENT; an entity converts if ANY of its events
    * does, and contributes the sum of its converting events' values. */
  def variantSummary(
      df: DataFrame,
      entity: Column,
      variant: Column,
      converted: Column,
      value: Column): DataFrame = {
    val per = df
      .groupBy(entity.as("__entity"), variant.as("variant"))
      .agg(
        max(converted.cast("int")).as("__conv"),
        sum(when(converted, value).otherwise(lit(0.0))).as("__val"))
    per.groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_entities"),
        sum(col("__conv")).cast("long").as("n_converted"),
        (sum(col("__conv")) / count(lit(1))).as("conv_rate"),
        sum(col("__val")).as("revenue"))
  }

  /** One-row two-variant readout: counts and rates per side, relative
    * lift, the pooled two-proportion z statistic, and a sample-ratio-
    * mismatch chi² (expected 50/50 split — an SRM fires when the
    * assignment or logging is broken, and invalidates the experiment
    * before any rate comparison is meaningful).
    *
    * Contract: exactly two distinct variant labels; side `a` is the
    * lexicographically smaller label (slice multi-arm experiments to
    * the pair under test first). Zero-rate / zero-variance guards yield
    * null z / lift instead of an ANSI divide-by-zero. */
  def abTest(
      df: DataFrame,
      entity: Column,
      variant: Column,
      converted: Column,
      value: Column): DataFrame = {
    val s = variantSummary(df, entity, variant, converted, value)
    val one = s.agg(
      min(col("variant")).as("variant_a"),
      max(col("variant")).as("variant_b"),
      min_by(col("n_entities"), col("variant")).as("n_a"),
      max_by(col("n_entities"), col("variant")).as("n_b"),
      min_by(col("n_converted"), col("variant")).as("conv_a"),
      max_by(col("n_converted"), col("variant")).as("conv_b"),
      min_by(col("revenue"), col("variant")).as("rev_a"),
      max_by(col("revenue"), col("variant")).as("rev_b"))
    val rateA = col("conv_a") / col("n_a")
    val rateB = col("conv_b") / col("n_b")
    val pPool = (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    one.select(
      col("variant_a"), col("variant_b"),
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      rateA.as("rate_a"), rateB.as("rate_b"),
      col("rev_a"), col("rev_b"),
      ((rateB - rateA) / nullif(rateA, lit(0.0)) * 100).as("lift_pct"),
      ((rateB - rateA) / nullif(se, lit(0.0))).as("z_score"),
      (pow(col("n_a") - col("n_b"), 2) / (col("n_a") + col("n_b"))).as("srm_chi2"))
  }

  /** CUPED variance reduction (Deng et al. WSDM 2013 — the industry-
    * standard experiment accelerator): regress the experiment metric on
    * a PRE-EXPERIMENT covariate and analyze the residual
    * y' = y − θ(x − x̄), θ = cov(x,y)/var(x) POOLED across arms (the
    * covariate predates assignment, so the adjustment cannot touch the
    * treatment effect — E[y'_B − y'_A] = E[y_B − y_A] exactly) while
    * shrinking variance by the covariate's ρ²: the same decision at a
    * fraction of the sample, or a significant readout weeks earlier.
    * [[abTest]] answers rates; this is the continuous-metric readout
    * with the variance knob every mature experimentation platform has.
    *
    * Scale shape: ONE entity-grain collapse (metric and covariate sum
    * per entity — the corpus-scale shuffle, truncated once: the θ
    * moment aggregate and the per-arm readout both consume it), a
    * 1-row broadcast carrying θ/x̄, then a |variants|-row aggregate —
    * no windows, no joins. Two-arm contract as [[abTest]] (side `a` =
    * smaller label), ENFORCED: an entity observed under multiple
    * variants, or an arm count ≠ 2, is a `raise_error`, never a silent
    * coercion into arm B. Welch-style z on both raw and adjusted means
    * through the same moments; a zero-variance covariate carries no
    * information — θ coalesces to 0 and the readout degrades to the
    * unadjusted test, never a null cascade. */
  def cuped(
      df: DataFrame,
      entity: Column,
      variant: Column,
      metric: Column,
      covariate: Column): DataFrame = {
    val per = graft.operators.Lineage.truncate(
      df.select(entity.as("__e"), variant.as("__v"),
          metric.cast("double").as("__y"), covariate.cast("double").as("__x"))
        .filter(col("__e").isNotNull && col("__v").isNotNull)
        .groupBy("__e")
        .agg(max(col("__v")).as("__vmax"),
          count_distinct(col("__v")).as("__nv"),
          sum(coalesce(col("__y"), lit(0.0))).as("__y"),
          sum(coalesce(col("__x"), lit(0.0))).as("__x"))
        // two-arm contract ENFORCED, not coerced: an entity observed
        // under >1 variant means broken assignment/logging — silently
        // folding it into arm max(__v) would bias the readout; fail loud
        .select(
          when(col("__nv") === 1, col("__vmax"))
            .otherwise(raise_error(concat(
              lit("cuped: entity observed under multiple variants "),
              lit("(broken assignment/logging); entity="),
              col("__e").cast("string")))).as("__v"),
          col("__e"), col("__y"), col("__x")))
    val mom = per.agg(
        covar_pop(col("__x"), col("__y")).as("__cxy"),
        var_pop(col("__x")).as("__vx"), avg(col("__x")).as("__mx"))
      .select(coalesce(col("__cxy") / nullif(col("__vx"), lit(0.0)), lit(0.0))
          .as("__theta"),
        col("__mx"))
    val adj = per.crossJoin(broadcast(mom))
      .withColumn("__ya", col("__y") - col("__theta") * (col("__x") - col("__mx")))
    val one = adj.groupBy("__v")
      .agg(count(lit(1)).as("n"), avg(col("__y")).as("my"),
        var_samp(col("__y")).as("vy"), avg(col("__ya")).as("mya"),
        var_samp(col("__ya")).as("vya"), max(col("__theta")).as("theta"))
      .agg(
        min(col("__v")).as("variant_a"), max(col("__v")).as("variant_b"),
        min_by(col("n"), col("__v")).as("n_a"), max_by(col("n"), col("__v")).as("n_b"),
        min_by(col("my"), col("__v")).as("mean_a"),
        max_by(col("my"), col("__v")).as("mean_b"),
        min_by(col("mya"), col("__v")).as("mean_adj_a"),
        max_by(col("mya"), col("__v")).as("mean_adj_b"),
        min_by(col("vy"), col("__v")).as("__vya0"),
        max_by(col("vy"), col("__v")).as("__vyb0"),
        min_by(col("vya"), col("__v")).as("__vaa"),
        max_by(col("vya"), col("__v")).as("__vab"),
        max(col("theta")).as("theta"),
        count(lit(1)).as("__narms"))
    def z(d: Column, va: Column, vb: Column) =
      d / nullif(sqrt(va / col("n_a") + vb / col("n_b")), lit(0.0))
    one.select(
      // two-arm contract: >2 arms would silently collapse to the
      // lexicographic extremes while middle arms still polluted θ
      when(col("__narms") === 2, col("variant_a"))
        .otherwise(raise_error(concat(
          lit("cuped: exactly two variants required, got "),
          col("__narms").cast("string"),
          lit(" (slice multi-arm experiments to the pair under test)"))))
        .as("variant_a"),
      col("variant_b"), col("n_a"), col("n_b"),
      col("mean_a"), col("mean_b"), col("mean_adj_a"), col("mean_adj_b"),
      col("theta"),
      // pooled variance-reduction share: 1 − var(y')/var(y)
      (lit(1.0) - (col("__vaa") + col("__vab")) /
        nullif(col("__vya0") + col("__vyb0"), lit(0.0))).as("var_reduction"),
      z(col("mean_b") - col("mean_a"), col("__vya0"), col("__vyb0")).as("z_raw"),
      z(col("mean_adj_b") - col("mean_adj_a"), col("__vaa"), col("__vab")).as("z_adj"))
  }
}
