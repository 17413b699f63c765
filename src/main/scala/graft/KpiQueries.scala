package graft

import graft.analytics.Kpis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.RelationalQueries.revenue


/** B-series driver queries (analytics KPIs: ranks, searches, grouped
  * stats, retention) with their DuckDB oracles — split from SparkEntry,
  * which documents the alias/ordering contract. */
private[graft] object KpiQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // =========================================================== B: KPIs

    "b1_rank_topn" -> ((s, dir) => {
      Kpis.rankTopN(Tables.orders(s, dir), col("o_totalprice"),
          descending = true, n = 10, tieBreak = Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("total_price"))
    }),

    // Ascending instantiation of the generic ranker — the reference runs
    // rank_movies with order="asc" for lowest-profit/roi (kpis.py:85-88).
    "b1b_rank_bottomn" -> ((s, dir) => {
      Kpis.rankTopN(Tables.orders(s, dir), col("o_totalprice"),
          descending = false, n = 10, tieBreak = Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("total_price"))
    }),

    "b2_rank_ratio" -> ((s, dir) => {
      Kpis.rankByRatio(Tables.lineitem(s, dir),
          numer = col("l_extendedprice"), denom = col("l_quantity"),
          denomOk = col("l_quantity") >= 10, as = "unit_price", n = 10,
          tieBreak = Seq(col("l_orderkey"), col("l_linenumber")))
        .select(col("l_orderkey"), col("l_linenumber"), round(col("unit_price"), 4).as("unit_price"))
    }),

    "b3_search_multi" -> ((s, dir) => {
      Kpis.search(Tables.part(s, dir),
          predicates = Seq(col("p_name").contains("re"), col("p_type").contains("AN")),
          orderBy = Seq(col("p_retailprice").desc, col("p_partkey").asc), limit = 20)
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          round(col("p_retailprice"), 4).as("retail"))
    }),

    "b4_group_flag_stats" -> ((s, dir) => {
      Kpis.groupFlagStats(Tables.orders(s, dir),
          flag = col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          value = col("o_totalprice"))
        .orderBy("flag")
    }),

    // Approx-median instantiation — the reference's grouped stats use
    // percentile_approx(roi, 0.5) (kpis.py:137). At accuracy > n the
    // sketch is exact (element at rank ceil(p·n)), which the oracle
    // mirrors with a window rank selection.
    "b4b_group_flag_approx" -> ((s, dir) => {
      Kpis.groupFlagStats(Tables.orders(s, dir),
          flag = col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          value = col("o_totalprice"), exact = false, accuracy = 1000000)
        .orderBy("flag")
    }),

    "b5_top_groups" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = broadcast(Tables.supplier(s, dir))
      Kpis.topGroups(li.join(sup, col("l_suppkey") === col("s_suppkey")),
        groupCol = col("s_name"), measure = revenue, n = 10,
        countAs = "n_items", sumAs = "revenue", avgAs = "avg_revenue")
    }),

    "b6_explode_agg" -> ((s, dir) => {
      Kpis.explodeAgg(Tables.documents(s, dir), lower(col("text")), " ",
        measure = col("n_chars"), n = 20)
    }),

    "b7_per_year" -> ((s, dir) => {
      Kpis.perPeriod(Tables.orders(s, dir),
        period = year(col("o_orderdate")).cast("long"), measure = col("o_totalprice"))
    }),

    // Rolling 7-day active users over the event stream: distinct
    // (day, user) pairs fan out to the report days they support —
    // bounded amplification, no range self-join. The oracle replays
    // the same fan-out.
    "b9_active_users" -> ((s, dir) => {
      Kpis.rollingActiveUsers(Tables.events(s, dir),
          ts = col("ts"), user = col("user_id"), windowDays = 7)
        .orderBy("day")
    }),

    // Position-based (U-shaped) multi-touch attribution of purchase
    // revenue across view/click/signup touches in a 7-day lookback;
    // untouched purchases credit the 'direct' channel in full.
    "b10_attribution" -> ((s, dir) => {
      val at = graft.analytics.Attribution.positionBased(Tables.events(s, dir),
        entity = col("user_id"), ts = col("ts"), eventType = col("event_type"),
        convId = col("event_id"), value = col("value"),
        touchTypes = Seq("view", "click", "signup"), convType = "purchase",
        lookbackSeconds = 7L * 24 * 3600)
      graft.analytics.Attribution.channelSummary(at).orderBy("channel")
    }),

    // Top user paths: most frequent 3-step event sequences WITHIN a
    // session (C10's gap sessionization feeding a path n-gram count —
    // the "how do users actually move" product-analytics staple).
    // Per-session arrays are gap-bounded; the top-k is TakeOrdered.
    "b15_top_paths" -> ((s, dir) => {
      val sess = graft.operators.Relational.sessionize(Tables.events(s, dir),
        entity = col("user_id"), ts = col("ts"), gapSeconds = 1800,
        orderTieBreak = Seq(col("event_id")))
      val seqs = sess.groupBy(col("user_id"), col("session_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("__us"), col("event_id"), col("event_type")))),
          e => e.getField("event_type")).as("seq"))
        .filter(size(col("seq")) >= 3)
      seqs
        .select(explode(transform(sequence(lit(0), size(col("seq")) - 3),
          i => concat_ws(">", element_at(col("seq"), i + 1),
            element_at(col("seq"), i + 2), element_at(col("seq"), i + 3)))).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(15)
    }),

    // Ordered co-occurrence mining: which event type EVENTUALLY precedes
    // which, per user-day basket — (basket, type) collapse to
    // (first, last) timestamps, basket-keyed self-join bounded by the
    // type vocabulary, strict-< so same-instant events never count.
    "b21_precedence" -> ((s, dir) => {
      graft.analytics.Precedence.precedencePairs(Tables.events(s, dir),
          basket = struct(col("user_id"), to_date(col("ts")).as("d")),
          eventType = col("event_type"), ts = col("ts"), minSupport = 5L)
        .orderBy("a", "b")
    }),

    // Exact two-sample KS: did click values and view values come from
    // the same distribution? Distinct-value collapse, distributed
    // prefix CDFs, one-row D + asymptotic p (NR small-sample λ).
    "b22_ks_test" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.analytics.Stats.ksTest(
          e.filter(col("event_type") === "click").select(col("value")),
          e.filter(col("event_type") === "view").select(col("value")),
          col("value"))
        .select(col("n_a"), col("n_b"), round(col("d_stat"), 6).as("d_stat"),
          round(col("p_value"), 6).as("p_value"))
    }),

    // Mann-Whitney U: did click values shift in LOCATION vs view
    // values — the rank-based complement of b22's KS; same distinct-
    // value collapse, one runningSums pass for the rank offsets.
    // CUPED-adjusted experiment readout: per-user purchase revenue
    // regressed on pre-period view activity — same decision, sharper z.
    "b39_cuped" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.analytics.Experiment.cuped(e,
          entity = col("user_id"),
          variant = graft.analytics.Experiment.assignVariant(col("user_id"), "expB"),
          metric = when(col("event_type") === "purchase" && col("value").isNotNull,
            col("value")).otherwise(lit(0.0)),
          covariate = when(col("event_type") === "view" && col("value").isNotNull,
            col("value")).otherwise(lit(0.0)))
        .select(col("variant_a"), col("variant_b"), col("n_a"), col("n_b"),
          round(col("mean_a"), 4).as("mean_a"), round(col("mean_b"), 4).as("mean_b"),
          round(col("mean_adj_a"), 4).as("mean_adj_a"),
          round(col("mean_adj_b"), 4).as("mean_adj_b"),
          round(col("theta"), 6).as("theta"),
          round(col("var_reduction"), 6).as("var_reduction"),
          round(col("z_raw"), 4).as("z_raw"), round(col("z_adj"), 4).as("z_adj"))
    }),

    // sBG retention projection (Fader-Hardie): fit the earliest weekly
    // cohort's survival curve on the declarative (α,β) grid and project
    // 12 weeks — "where does retention flatten" from 5 observed points.
    "b38_sbg" -> ((s, dir) => {
      import graft.operators.Lineage
      val act = Lineage.truncate(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
          .distinct())
      val coh = Lineage.truncate(
        act.groupBy("user_id").agg(min(col("w")).as("cw")))
      val c0 = coh.agg(min(col("cw")).as("c0"))
      val curve0 = act.join(coh, "user_id").crossJoin(broadcast(c0))
        .filter(col("cw") === col("c0"))
        .groupBy((datediff(col("w"), col("cw")) / 7).cast("int").as("t"))
        .agg(count(lit(1)).as("n"))
      // densify to contiguous 0..T (an all-inactive week emits no row;
      // sbgProjection's positional fold requires — and enforces — no
      // gaps); the curve is calendar-bounded, so the 1-row collect-
      // into-map is trivially small
      val curve = curve0
        .agg(max(col("t")).as("__tm"),
          map_from_entries(collect_list(struct(col("t"), col("n")))).as("__m"))
        .select(explode(sequence(lit(0), col("__tm"))).as("t"), col("__m"))
        .select(col("t"), coalesce(element_at(col("__m"), col("t")), lit(0L)).as("n"))
      graft.analytics.Retention.sbgProjection(curve, col("t"), col("n"),
          horizon = 12)
        .select(col("t"), round(col("observed"), 6).as("observed"),
          round(col("projected"), 6).as("projected"),
          round(col("alpha"), 4).as("alpha"), round(col("beta"), 4).as("beta"),
          round(col("ll"), 4).as("ll"))
        .orderBy("t")
    }),

    // Welch unequal-variance t: did the MEAN click value shift vs view —
    // the parametric member of the b22/b28 location family; one moments
    // aggregate per side, a one-row cross join, closed-form everything.
    "b37_welch" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.analytics.Stats.welchTTest(
          e.filter(col("event_type") === "click").select(col("value")),
          e.filter(col("event_type") === "view").select(col("value")),
          col("value"))
        .select(col("n_a"), col("n_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("t"), 6).as("t"), round(col("df"), 4).as("df"),
          round(col("p_approx"), 6).as("p_approx"))
    }),

    // Spearman rank correlation of the lineitem measures — Pearson over
    // average ranks: monotone association, whale-row-proof.
    "b36_spearman" -> ((s, dir) => {
      graft.analytics.Stats.spearmanMatrix(
          Tables.lineitem(s, dir).select(col("l_quantity").as("x"),
            col("l_extendedprice").as("y"), col("l_discount").as("z")),
          Seq("x", "y", "z"))
        .select(col("n"), round(col("corr_x_y"), 4).as("corr_x_y"),
          round(col("corr_x_z"), 4).as("corr_x_z"),
          round(col("corr_y_z"), 4).as("corr_y_z"))
    }),

    // Kruskal-Wallis omnibus: did ANY event type's value distribution
    // shift in location — one rank test ahead of the b31 per-group
    // battery; ties collapse map-side, ranks from one runningSums pass.
    "b35_kruskal" -> ((s, dir) => {
      graft.analytics.Stats.kruskalWallis(Tables.events(s, dir),
          col("event_type"), col("value"))
        .select(col("k"), col("n"), round(col("h"), 6).as("h"),
          round(col("h_tie"), 6).as("h_tie"),
          round(col("p_approx"), 6).as("p_approx"))
    }),

    // Classical additive decomposition of the per-type daily-revenue
    // series at weekly period: trend (centered 7-MA), zero-sum seasonal
    // profile, residual — deseasonalize before comparing weeks.
    "b34_seasonal" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("x"))
      // row_number per key = the REGULAR index the operator contracts
      // (per-key bounded window, the b14 benign class)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("d")
      val idxd = daily.withColumn("i", row_number().over(w))
      graft.operators.TimeSeries.seasonalDecompose(idxd, col("event_type"),
          col("i"), col("x"), period = 7)
        .select(col("key").as("event_type"), col("idx"),
          round(col("x"), 4).as("x"), col("season"),
          round(col("trend"), 4).as("trend"),
          round(col("seasonal"), 4).as("seasonal"),
          round(col("resid"), 4).as("resid"))
        .orderBy("event_type", "idx")
    }),

    // Stationary distribution of the per-user event-type Markov chain
    // (5 synchronous rounds, dangling mass redistributed) — "where do
    // journeys settle", the model-level complement of b15's top paths.
    "b33_markov" -> ((s, dir) => {
      val tr = graft.analytics.Markov.transitions(Tables.events(s, dir),
        col("user_id"), col("ts"), col("event_type"), Seq(col("event_id")))
      graft.analytics.Markov.stationary(tr, iters = 5)
        .select(col("state"), round(col("pi"), 6).as("pi"))
        .orderBy("state")
    }),

    // Holt level+trend smoothing of the per-type daily-revenue series
    // (α=0.3, β=0.1) with a 7-step forecast — the sequential fold runs
    // on the ALREADY-DOWNSAMPLED series, after the one corpus shuffle.
    "b29_holt" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("x"))
        .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
      graft.operators.TimeSeries.holtSmooth(daily, col("event_type"),
          col("di"), col("x"), alpha = 0.3, beta = 0.1, horizon = 7)
        .select(col("key").as("event_type"), col("n"),
          round(col("level"), 4).as("level"), round(col("trend"), 4).as("trend"),
          round(col("forecast"), 4).as("forecast"), round(col("sse"), 4).as("sse"))
        .orderBy("event_type")
    }),

    // Mann-Kendall monotone-trend test on the same daily series — MK's
    // p decides whether b30's slope is signal; same pair join.
    "b40_mann_kendall" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("x"))
        .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
      graft.operators.TimeSeries.mannKendall(daily, col("event_type"),
          col("di"), col("x"))
        .select(col("key").as("event_type"), col("n"), col("n_pairs"),
          col("s_stat"), round(col("z"), 6).as("z"),
          round(col("p_approx"), 6).as("p_approx"))
        .orderBy("event_type")
    }),

    // Theil-Sen robust slope/intercept of the same daily series — the
    // median of all pairwise slopes shrugs off outage/burst days that
    // would drag an OLS line.
    "b30_theil_sen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("x"))
        .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
      graft.operators.TimeSeries.theilSen(daily, col("event_type"),
          col("di"), col("x"))
        .select(col("key").as("event_type"), col("n"), col("n_pairs"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"))
        .orderBy("event_type")
    }),

    // Per-source length-distribution drift battery with FDR control:
    // every source's n_chars CDF KS-tested against the pooled rest in
    // ONE plan, then Benjamini-Hochberg at α=0.1 decides which drifts
    // are discoveries — the multiplicity-honest drift dashboard.
    "b31_fdr_drift" -> ((s, dir) => {
      val ks = graft.analytics.Stats.ksTestGroupedVsRest(
        Tables.documents(s, dir), col("source"), col("n_chars"))
      graft.analytics.Stats.bhFdr(ks, col("p_value"), Seq(col("key")),
          alpha = 0.1)
        .select(col("key"), col("n_group"), col("n_rest"),
          round(col("d_stat"), 6).as("d_stat"),
          round(col("p_value"), 6).as("p_value"),
          col("p_rank"), round(col("q_value"), 6).as("q_value"),
          col("rejected"))
        .orderBy("key")
    }),

    // Empirical-Bayes shrinkage of per-customer 'F'-status order rates:
    // the corpus supplies a beta prior (method of moments), small-n
    // customers shrink toward the global rate, whales keep their own.
    "b32_eb_shrink" -> ((s, dir) => {
      graft.analytics.Stats.ebShrinkRates(Tables.orders(s, dir),
          col("o_custkey"), (col("o_orderstatus") === "F").cast("int"))
        .select(col("key"), col("n"), col("y"),
          round(col("raw_rate"), 6).as("raw_rate"),
          round(col("prior_alpha"), 6).as("prior_alpha"),
          round(col("prior_beta"), 6).as("prior_beta"),
          round(col("shrunk"), 6).as("shrunk"))
        .orderBy("key")
    }),

    "b28_mann_whitney" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.analytics.Stats.mannWhitney(
          e.filter(col("event_type") === "click").select(col("value")),
          e.filter(col("event_type") === "view").select(col("value")),
          col("value"))
        .select(col("n_a"), col("n_b"), round(col("u_a"), 4).as("u_a"),
          round(col("z"), 6).as("z"))
    }),

    // Benford first-digit audit of order totals: digit shares vs
    // log10(1+1/d) with the χ² deviation — the fabricated-data
    // forensic; 9-bucket partial agg, string-derived first digit.
    "b27_benford" -> ((s, dir) => {
      graft.analytics.Stats.benford(Tables.orders(s, dir), col("o_totalprice"))
        .select(col("digit"), col("n"),
          round(col("obs_share"), 6).as("obs_share"),
          round(col("exp_share"), 6).as("exp_share"),
          round(col("chi2"), 4).as("chi2"))
        .orderBy("digit")
    }),

    // Two-sided CUSUM changepoints over the per-type daily-revenue
    // series (sensitive-monitor parameters k=0.25, h=2.5): the
    // non-linear scan folds sequentially per series AFTER the corpus
    // reduces to the calendar-bounded daily table.
    "b26_cusum" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("x"))
        .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
      graft.analytics.Anomaly.cusum(daily, col("event_type"), col("di"),
          col("x"), slack = 0.25, threshold = 2.5)
        .orderBy("key", "idx", "direction")
    }),

    // Mutual information (and NMI) between order priority and status —
    // the shared-bits sibling of b20's Cramér's V; one corpus pass to
    // cells, everything else cardinality²-scale.
    "b25_mutual_info" -> ((s, dir) => {
      graft.analytics.Stats.mutualInformation(Tables.orders(s, dir),
          col("o_orderpriority"), col("o_orderstatus"))
        .select(col("n"), round(col("mi"), 6).as("mi"),
          round(col("nmi"), 6).as("nmi"))
    }),

    // Sample ACF of the per-type daily-revenue series at lags 1..7 —
    // window-free: per-key moments in one agg, lag axis exploded, lagged
    // pairs via a (key, idx-lag) equi-join of the series with itself.
    "b24_acf" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("x"))
        .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
      graft.operators.TimeSeries.acf(daily, col("event_type"), col("di"),
          col("x"), maxLag = 7)
        .select(col("key").as("event_type"), col("lag"), col("n"),
          round(col("acf"), 6).as("acf"))
        .orderBy("event_type", "lag")
    }),

    // Poisson-bootstrap mean CIs per event type: each row draws its 40
    // replicate multiplicities locally from md5 (Chamandy et al.) —
    // replicate means are ONE (type × replicate) partial agg, CI = order
    // stats of 40 sorted values. No global resample coordination.
    "b23_bootstrap_ci" -> ((s, dir) => {
      graft.analytics.Stats.poissonBootstrapCI(Tables.events(s, dir),
          Seq("event_type"), col("value"), col("event_id"),
          replicates = 40, alpha = 0.05)
        .select(col("event_type"), col("n"), round(col("mean"), 4).as("mean"),
          round(col("ci_lo"), 4).as("ci_lo"), round(col("ci_hi"), 4).as("ci_hi"))
        .orderBy("event_type")
    }),

    // Month-over-month and year-over-year growth over the monthly
    // revenue series. The lag window is global but CALENDAR-bounded
    // (one row per month — the b11/liftTable benign class): the heavy
    // reduction to months already partial-aggregated distributed.
    "b14_growth" -> ((s, dir) => {
      val monthly = Tables.orders(s, dir)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(sum(col("o_totalprice")).as("__rev"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("month")
      monthly
        .withColumn("__prev", lag(col("__rev"), 1).over(w))
        .withColumn("__yoy", lag(col("__rev"), 12).over(w))
        .select(col("month"), round(col("__rev"), 4).as("revenue"),
          round((col("__rev") - col("__prev")) / col("__prev") * 100, 4).as("mom_pct"),
          round((col("__rev") - col("__yoy")) / col("__yoy") * 100, 4).as("yoy_pct"))
        .orderBy("month")
    }),

    // RFM customer segmentation: exact quintiles on recency/frequency/
    // monetary via the C33 distributed ntile, rolled up per segment.
    "b13_rfm_segments" -> ((s, dir) => {
      Kpis.rfm(Tables.orders(s, dir), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"), buckets = 5)
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("monetary")), 4).as("avg_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    // Time-to-convert distribution over completed view→click→purchase
    // funnels: exact interpolated percentiles of the whole-funnel span,
    // from the same chained-window step times c21 aggregates away.
    "b12_time_to_convert" -> ((s, dir) => {
      val st = graft.analytics.Funnel.stepTimes(Tables.events(s, dir),
        col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      st.filter(col("t3").isNotNull)
        .select(((graft.operators.Relational.epochMicros(col("t3")) -
          graft.operators.Relational.epochMicros(col("t1"))) / lit(1000000.0)).as("dt"))
        .agg(count(lit(1)).as("n_converted"),
          round(avg(col("dt")), 4).as("avg_sec"),
          round(expr("percentile(dt, 0.5d)"), 4).as("p50_sec"),
          round(expr("percentile(dt, 0.9d)"), 4).as("p90_sec"),
          round(min(col("dt")), 4).as("min_sec"),
          round(max(col("dt")), 4).as("max_sec"))
    }),

    // Customer-spend Gini concentration: the scalar form of b11's lift
    // curve — one distributed global rank + one aggregate.
    "b18_gini" -> ((s, dir) => {
      val spend = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("spend"))
      graft.analytics.Stats.gini(spend, col("spend"), Seq(col("o_custkey")))
        .select(col("n"), round(col("total"), 4).as("total"),
          round(col("gini"), 4).as("gini"))
    }),

    // Market-basket co-occurrence: parts ordered together with
    // support / directional confidence / lift — distinct collapse,
    // size-capped basket self-join (the mega-basket Zipf guard),
    // marginal join-back, top pairs by lift.
    // Cramér's V association between event type and day-of-week —
    // the categorical sibling of c36's correlation matrix, with the
    // closed-form empty-cell χ² correction.
    "b20_cramers_v" -> ((s, dir) => {
      graft.analytics.Stats.cramersV(Tables.events(s, dir),
          col("event_type"), dayofweek(col("ts")))
        .select(col("n"), col("r"), col("c"),
          round(col("chi2"), 4).as("chi2"),
          round(col("cramers_v"), 4).as("cramers_v"))
    }),

    // ABC / Pareto revenue triage: customers ranked by decimal-exact
    // revenue, cumulative share via the C43 distributed prefix (no
    // single-partition window over the customer table), 80/95 cuts.
    "b19_abc" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_totalprice").cast("decimal(18,2)").as("rev"))
      graft.operators.Ranking.abcClassification(rev, col("o_custkey"), col("rev"))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_customers"),
          round(sum("total"), 2).cast("double").as("class_revenue"))
        .orderBy("abc_class")
    }),

    "b17_basket_lift" -> ((s, dir) => {
      graft.analytics.Basket.coOccurrence(Tables.lineitem(s, dir),
          basket = col("l_orderkey"), item = col("l_partkey"), minSupport = 2)
        .select(col("item_a"), col("item_b"), col("n_joint"), col("n_a"), col("n_b"),
          round(col("support"), 6).as("support"),
          round(col("conf_a_to_b"), 4).as("conf_a_to_b"),
          round(col("conf_b_to_a"), 4).as("conf_b_to_a"),
          round(col("lift"), 4).as("lift"))
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(15)
    }),

    // A/B experiment readout: deterministic md5 split of users into two
    // arms, entity-grain conversion (any purchase — a user converting
    // five times counts once), pooled two-proportion z + a sample-ratio-
    // mismatch guard. One entity shuffle, then 2-row algebra.
    "b16_ab_test" -> ((s, dir) => {
      graft.analytics.Experiment.abTest(Tables.events(s, dir),
          entity = col("user_id"),
          variant = graft.analytics.Experiment.assignVariant(col("user_id"), "expA"),
          converted = col("event_type") === "purchase",
          value = col("value"))
        .select(col("variant_a"), col("variant_b"), col("n_a"), col("n_b"),
          col("conv_a"), col("conv_b"),
          round(col("rate_a"), 4).as("rate_a"), round(col("rate_b"), 4).as("rate_b"),
          round(col("rev_a"), 4).as("rev_a"), round(col("rev_b"), 4).as("rev_b"),
          round(col("lift_pct"), 4).as("lift_pct"),
          round(col("z_score"), 4).as("z_score"),
          round(col("srm_chi2"), 4).as("srm_chi2"))
    }),

    // Customer-value decile lift: exact SQL ntile semantics over spend
    // (desc, custkey tie-break) via the distributed ranking path — no
    // single-partition window anywhere except the final 10-row rollup.
    "b11_decile_lift" -> ((s, dir) => {
      val spend = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("spend"))
      graft.operators.Ranking.liftTable(spend, col("spend"),
          Seq(col("spend").desc, col("o_custkey").asc), buckets = 10, as = "decile")
        .withColumnRenamed("n", "n_customers")
        .withColumnRenamed("total", "revenue")
        .orderBy("decile")
    }),

  )

  val oracleSql: Map[String, String] = Map(
    "b1_rank_topn" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,4) AS total_price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "b1b_rank_bottomn" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,4) AS total_price
        |FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 10""".stripMargin,

    "b2_rank_ratio" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice/l_quantity,4) AS unit_price
        |FROM lineitem WHERE l_quantity >= 10
        |ORDER BY l_extendedprice/l_quantity DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "b3_search_multi" ->
      """SELECT p_partkey, p_name, p_type, round(p_retailprice,4) AS retail
        |FROM part WHERE p_name LIKE '%re%' AND p_type LIKE '%AN%'
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 20""".stripMargin,

    "b4_group_flag_stats" ->
      """SELECT o_orderpriority IN ('1-URGENT','2-HIGH') AS flag, count(*) AS n,
        | round(avg(o_totalprice),4) AS mean_value, round(median(o_totalprice),4) AS median_value
        |FROM orders GROUP BY 1 ORDER BY flag""".stripMargin,

    "b4b_group_flag_approx" ->
      """WITH s AS (SELECT o_orderpriority IN ('1-URGENT','2-HIGH') AS flag, o_totalprice AS v FROM orders),
        |r AS (SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY flag) AS cnt FROM s)
        |SELECT flag, count(*) AS n, round(avg(v),4) AS mean_value,
        | round(max(CASE WHEN rn = greatest(1, CAST(ceil(0.5*cnt) AS BIGINT)) THEN v END),4) AS median_value
        |FROM r GROUP BY flag ORDER BY flag""".stripMargin,

    "b5_top_groups" ->
      """SELECT s_name, count(*) AS n_items,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | round(avg(l_extendedprice*(1-l_discount)),4) AS avg_revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY revenue DESC, s_name LIMIT 10""".stripMargin,

    "b6_explode_agg" ->
      """SELECT t.word AS token, count(*) AS n, round(avg(t.n_chars),4) AS avg_value
        |FROM (SELECT n_chars, unnest(string_split(lower(text),' ')) AS word FROM documents) t
        |WHERE t.word <> '' GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "b7_per_year" ->
      """SELECT year(o_orderdate) AS period, count(*) AS n,
        | round(sum(o_totalprice),4) AS sum_value, round(avg(o_totalprice),4) AS avg_value
        |FROM orders GROUP BY 1 ORDER BY period""".stripMargin,

    "b9_active_users" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS eday, user_id AS u FROM events),
        |x AS (SELECT eday + CAST(t.o AS INTEGER) AS day, t.o, u
        |      FROM d CROSS JOIN unnest(generate_series(0, 6)) AS t(o))
        |SELECT day, count(DISTINCT CASE WHEN o = 0 THEN u END) AS dau,
        | count(DISTINCT u) AS n_active,
        | round(count(DISTINCT CASE WHEN o = 0 THEN u END) * 1.0 / count(DISTINCT u), 4) AS stickiness
        |FROM x GROUP BY 1 ORDER BY day""".stripMargin,

    // Same pair expansion, position election, and weight schedule;
    // same (tus, channel) tie ordering for the first/last election.
    "b10_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |t AS (SELECT user_id, us AS tus, event_type AS channel FROM e
        |      WHERE event_type IN ('view','click','signup')),
        |c AS (SELECT user_id, us AS cus, event_id AS conv_id, value AS v FROM e
        |      WHERE event_type = 'purchase'),
        |p AS (SELECT c.conv_id, t.channel, t.tus, c.v FROM c JOIN t ON c.user_id = t.user_id
        |      AND t.tus < c.cus AND t.tus >= c.cus - 604800000000),
        |w AS (SELECT conv_id, channel, v,
        |   row_number() OVER (PARTITION BY conv_id ORDER BY tus, channel) AS rn,
        |   count(*) OVER (PARTITION BY conv_id) AS n FROM p),
        |a AS (SELECT conv_id, channel,
        |   CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
        |        WHEN rn = 1 OR rn = n THEN 0.4 ELSE 0.2 / (n - 2) END AS weight, v FROM w),
        |u AS (SELECT conv_id, channel, weight, weight * v AS attributed FROM a
        |      UNION ALL
        |      SELECT conv_id, 'direct' AS channel, 1.0 AS weight, v AS attributed
        |      FROM c WHERE conv_id NOT IN (SELECT conv_id FROM p))
        |SELECT channel, count(DISTINCT conv_id) AS n_conversions,
        | round(sum(weight), 4) AS total_weight, round(sum(attributed), 4) AS revenue
        |FROM u GROUP BY 1 ORDER BY channel""".stripMargin,

    // Same gap rule (> 1800 s starts a session), same (ts, event_id)
    // total order, same windowed 3-gram expansion.
    "b15_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |o AS (SELECT user_id, event_id, et, us,
        |   CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |        THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM o),
        |g AS (SELECT user_id, sid, list(et ORDER BY us, event_id) AS seq
        |  FROM s GROUP BY 1, 2),
        |p AS (SELECT seq[CAST(i AS INT)] || '>' || seq[CAST(i AS INT) + 1] || '>'
        |    || seq[CAST(i AS INT) + 2] AS path
        |  FROM g, UNNEST(range(1, len(seq) - 1)) t(i) WHERE len(seq) >= 3)
        |SELECT path, count(*) AS n FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin,

    // Same (basket, type) → (min, max) collapse, same strict-< pair
    // rule, same basket-count share.
    "b21_precedence" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type AS t,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL),
        |pt AS (SELECT user_id, d, t, min(us) AS f, max(us) AS l
        |  FROM e GROUP BY 1, 2, 3),
        |tot AS (SELECT count(*) AS nb FROM (SELECT DISTINCT user_id, d FROM pt)),
        |p AS (SELECT x.t AS a, y.t AS b FROM pt x JOIN pt y
        |  ON x.user_id = y.user_id AND x.d = y.d AND x.t <> y.t AND x.f < y.l)
        |SELECT a, b, count(*) AS support,
        | round(count(*) * 1.0 / tot.nb, 6) AS share
        |FROM p, tot GROUP BY a, b, tot.nb HAVING count(*) >= 5
        |ORDER BY a, b""".stripMargin,

    // Same distinct-value collapse, same closed-form tie ranks and
    // tie-corrected variance.
    // Same md5 split, entity collapse, pooled θ, adjustment, and
    // Welch-style z on raw and adjusted means.
    "b39_cuped" ->
      """WITH e AS (SELECT user_id,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'expB'), 1, 15) AS BIGINT) % 2 = 0
        |       THEN 'A' ELSE 'B' END AS v,
        |  CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN value ELSE 0 END AS y,
        |  CASE WHEN event_type = 'view' AND value IS NOT NULL THEN value ELSE 0 END AS x
        |  FROM events WHERE user_id IS NOT NULL),
        |p AS (SELECT user_id, max(v) AS v, sum(y) AS y, sum(x) AS x FROM e GROUP BY 1),
        |m AS (SELECT coalesce(covar_pop(x, y) / nullif(var_pop(x), 0), 0) AS th,
        |    avg(x) AS mx FROM p),
        |a AS (SELECT v, y, y - th * (x - mx) AS ya FROM p, m),
        |s AS (SELECT v, count(*) AS n, avg(y) AS my, var_samp(y) AS vy,
        |    avg(ya) AS mya, var_samp(ya) AS vya FROM a GROUP BY 1),
        |o AS (SELECT min(v) AS variant_a, max(v) AS variant_b,
        |    arg_min(n, v) AS n_a, arg_max(n, v) AS n_b,
        |    arg_min(my, v) AS mean_a, arg_max(my, v) AS mean_b,
        |    arg_min(mya, v) AS mean_adj_a, arg_max(mya, v) AS mean_adj_b,
        |    arg_min(vy, v) AS vya0, arg_max(vy, v) AS vyb0,
        |    arg_min(vya, v) AS vaa, arg_max(vya, v) AS vab FROM s)
        |SELECT variant_a, variant_b, CAST(n_a AS BIGINT) AS n_a,
        | CAST(n_b AS BIGINT) AS n_b,
        | round(mean_a, 4) AS mean_a, round(mean_b, 4) AS mean_b,
        | round(mean_adj_a, 4) AS mean_adj_a, round(mean_adj_b, 4) AS mean_adj_b,
        | round(m.th, 6) AS theta,
        | round(1.0 - (vaa + vab) / nullif(vya0 + vyb0, 0), 6) AS var_reduction,
        | round((mean_b - mean_a) / nullif(sqrt(vya0 / n_a + vyb0 / n_b), 0), 4) AS z_raw,
        | round((mean_adj_b - mean_adj_a) / nullif(sqrt(vaa / n_a + vab / n_b), 0), 4) AS z_adj
        |FROM o, m""".stripMargin,

    // Same curve, densified to contiguous 0..T the same way (gap weeks
    // → n=0), same recurrences with the fold's literal FP op order,
    // same grid argmax and projection.
    "b38_sbg" ->
      """WITH RECURSIVE
        |act AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS w FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |coh AS (SELECT u, min(w) AS cw FROM act GROUP BY 1),
        |c0 AS (SELECT min(cw) AS c0 FROM coh),
        |curve0 AS (SELECT CAST(datediff('day', coh.cw, act.w) / 7 AS INT) AS t,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM act JOIN coh USING (u), c0 WHERE coh.cw = c0.c0 GROUP BY 1),
        |tg AS (SELECT CAST(unnest(range(0, (SELECT max(t) + 1 FROM curve0))) AS INT) AS t),
        |curve AS (SELECT tg.t AS t, coalesce(curve0.n, CAST(0 AS DOUBLE)) AS n,
        |    tg.t AS rn
        |  FROM tg LEFT JOIN curve0 USING (t)),
        |tmax AS (SELECT max(rn) AS tm FROM curve),
        |nn0 AS (SELECT n AS n0 FROM curve WHERE rn = 0),
        |nnT AS (SELECT curve.n AS nT FROM curve, tmax WHERE curve.rn = tmax.tm),
        |cand AS (SELECT i * CAST(0.1 AS DOUBLE) AS a, j * CAST(0.1 AS DOUBLE) AS b
        |  FROM range(1, 61) t1(i), range(1, 61) t2(j)),
        |r AS (
        |  SELECT a, b, 1 AS t, a / (a + b) AS p,
        |    1.0 * (b + 1 - 1) / (a + b + 1 - 1) AS s,
        |    CASE WHEN 1 <= tmax.tm THEN greatest(nn0.n0 -
        |        (SELECT n FROM curve WHERE rn = 1), 0) * ln(a / (a + b))
        |      ELSE 0 END AS ll,
        |    CASE WHEN 1 = tmax.tm THEN 1.0 * (b + 1 - 1) / (a + b + 1 - 1)
        |      ELSE 0 END AS sT
        |  FROM cand, tmax, nn0
        |  UNION ALL
        |  SELECT r.a, r.b, r.t + 1,
        |    r.p * (r.b + (r.t + 1) - 2) / (r.a + r.b + (r.t + 1) - 1),
        |    r.s * (r.b + (r.t + 1) - 1) / (r.a + r.b + (r.t + 1) - 1),
        |    r.ll + CASE WHEN r.t + 1 <= tmax.tm THEN
        |      greatest((SELECT n FROM curve WHERE rn = r.t) -
        |        (SELECT n FROM curve WHERE rn = r.t + 1), 0) *
        |      ln(r.p * (r.b + (r.t + 1) - 2) / (r.a + r.b + (r.t + 1) - 1))
        |      ELSE 0 END,
        |    CASE WHEN r.t + 1 = tmax.tm THEN
        |      r.s * (r.b + (r.t + 1) - 1) / (r.a + r.b + (r.t + 1) - 1)
        |      ELSE r.sT END
        |  FROM r, tmax WHERE r.t + 1 <= greatest(tmax.tm, 12)),
        |fin AS (SELECT r.a, r.b, r.ll + nnT.nT * ln(r.sT) AS ll
        |  FROM r, tmax, nnT WHERE r.t = greatest(tmax.tm, 12)),
        |best AS (SELECT a, b, ll FROM fin ORDER BY ll DESC, a DESC, b DESC LIMIT 1),
        |proj AS (SELECT 0 AS t, CAST(1.0 AS DOUBLE) AS s FROM best
        |  UNION ALL
        |  SELECT r.t, r.s FROM r JOIN best ON r.a = best.a AND r.b = best.b)
        |SELECT proj.t, round(curve.n / nn0.n0, 6) AS observed,
        | round(proj.s, 6) AS projected, round(best.a, 4) AS alpha,
        | round(best.b, 4) AS beta, round(best.ll, 4) AS ll
        |FROM proj LEFT JOIN curve ON curve.rn = proj.t, best, nn0
        |WHERE proj.t <= 12 ORDER BY proj.t""".stripMargin,

    // Same moments, Welch-Satterthwaite df, and Φ polynomial (|t| ≥ 0
    // so p = 2·pdf·poly directly).
    "b37_welch" ->
      """WITH a AS (SELECT value AS v FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL),
        |b AS (SELECT value AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL),
        |ma AS (SELECT count(*) AS na, avg(v) AS mean_a, var_samp(v) AS va FROM a),
        |mb AS (SELECT count(*) AS nb, avg(v) AS mean_b, var_samp(v) AS vb FROM b),
        |j AS (SELECT na, nb, mean_a, mean_b, va / na AS qa, vb / nb AS qb FROM ma, mb),
        |tt AS (SELECT *, (mean_a - mean_b) / sqrt(qa + qb) AS t,
        |    (qa + qb) * (qa + qb) /
        |      (qa * qa / (na - 1) + qb * qb / (nb - 1)) AS dfw FROM j),
        |pp AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(t)) AS tq,
        |    exp(-0.5 * t * t) / sqrt(2 * pi()) AS pdf FROM tt)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        | round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
        | round(t, 6) AS t, round(dfw, 4) AS df,
        | round(2 * pdf * (tq * (0.319381530 + tq * (-0.356563782 +
        |   tq * (1.781477937 + tq * (-1.821255978 + tq * 1.330274429))))), 6) AS p_approx
        |FROM pp""".stripMargin,

    // Same per-column average-rank derivation, same sample corr.
    "b36_spearman" ->
      """WITH base AS (SELECT l_quantity AS x, l_extendedprice AS y, l_discount AS z
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |cx AS (SELECT x, count(*) AS t FROM base GROUP BY 1),
        |rx AS (SELECT x, coalesce(sum(t) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (t + 1) / 2.0 AS r FROM cx),
        |cy AS (SELECT y, count(*) AS t FROM base GROUP BY 1),
        |ry AS (SELECT y, coalesce(sum(t) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (t + 1) / 2.0 AS r FROM cy),
        |cz AS (SELECT z, count(*) AS t FROM base GROUP BY 1),
        |rz AS (SELECT z, coalesce(sum(t) OVER (ORDER BY z
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (t + 1) / 2.0 AS r FROM cz),
        |rb AS (SELECT rx.r AS ra, ry.r AS rb2, rz.r AS rc
        |  FROM base JOIN rx USING (x) JOIN ry USING (y) JOIN rz USING (z))
        |SELECT CAST(count(*) AS BIGINT) AS n,
        | round(corr(ra, rb2), 4) AS corr_x_y,
        | round(corr(ra, rc), 4) AS corr_x_z,
        | round(corr(rb2, rc), 4) AS corr_y_z
        |FROM rb""".stripMargin,

    // Same tie-rank collapse, H and tie correction, and the identical
    // Wilson-Hilferty + Abramowitz-Stegun closed form for p.
    "b35_kruskal" ->
      """WITH base AS (SELECT event_type AS g, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |cells AS (SELECT g, v, count(*) AS c FROM base GROUP BY 1, 2),
        |vals AS (SELECT v, sum(c) AS t FROM cells GROUP BY 1),
        |rk AS (SELECT v, coalesce(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (t + 1) / 2.0 AS r,
        |    t FROM vals),
        |grp AS (SELECT g, sum(c) AS ng, sum(c * r) AS rg
        |  FROM cells JOIN rk USING (v) GROUP BY 1),
        |tt AS (SELECT CAST(sum(t * t * t - t) AS DOUBLE) AS tt FROM rk),
        |ag AS (SELECT count(*) AS k, sum(ng) AS nl, CAST(sum(ng) AS DOUBLE) AS n,
        |    sum(rg * rg / ng) AS s, max(tt.tt) AS tt FROM grp, tt),
        |hh AS (SELECT k, nl, n, 12.0 / (n * (n + 1)) * s - 3 * (n + 1) AS h,
        |    1.0 - tt / nullif(n * n * n - n, 0) AS cc FROM ag),
        |ht AS (SELECT k, nl, n, h,
        |    CASE WHEN k >= 2 THEN h / nullif(cc, 0) END AS h_tie FROM hh),
        |zz AS (SELECT *, (pow(h_tie / (k - 1), 1.0 / 3) -
        |      (1.0 - 2.0 / (9 * (k - 1)))) / sqrt(2.0 / (9 * (k - 1))) AS z FROM ht),
        |pp AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS tq,
        |    exp(-0.5 * z * z) / sqrt(2 * pi()) AS pdf FROM zz)
        |SELECT k, CAST(nl AS BIGINT) AS n, round(h, 6) AS h,
        | round(h_tie, 6) AS h_tie,
        | round(CASE WHEN h_tie IS NULL THEN NULL
        |   WHEN z >= 0 THEN pdf * (tq * (0.319381530 + tq * (-0.356563782 +
        |     tq * (1.781477937 + tq * (-1.821255978 + tq * 1.330274429)))))
        |   ELSE 1.0 - pdf * (tq * (0.319381530 + tq * (-0.356563782 +
        |     tq * (1.781477937 + tq * (-1.821255978 + tq * 1.330274429)))))
        |   END, 6) AS p_approx
        |FROM pp""".stripMargin,

    // Same centered MA windows, same profile means and re-centering.
    "b34_seasonal" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d, sum(value) AS x
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY d) AS i FROM daily),
        |tw AS (SELECT g, i, x, i % 7 AS season,
        |    CASE WHEN count(x) OVER f = 7 THEN avg(x) OVER f END AS trend
        |  FROM o WINDOW f AS (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |pr AS (SELECT g, season, avg(x - trend) AS sraw FROM tw
        |  WHERE trend IS NOT NULL GROUP BY 1, 2),
        |ct AS (SELECT g, avg(sraw) AS sm FROM pr GROUP BY 1),
        |se AS (SELECT pr.g, pr.season, sraw - sm AS seasonal FROM pr JOIN ct USING (g))
        |SELECT tw.g AS event_type, CAST(i AS BIGINT) AS idx, round(x, 4) AS x,
        | CAST(tw.season AS BIGINT) AS season, round(trend, 4) AS trend,
        | round(seasonal, 4) AS seasonal, round(x - trend - seasonal, 4) AS resid
        |FROM tw LEFT JOIN se ON tw.g = se.g AND tw.season = se.season
        |ORDER BY 1, 2""".stripMargin,

    // Same transition derivation + 5 mechanically-unrolled rounds with
    // the same dangling redistribution (the c23 pattern).
    "b33_markov" -> {
      val rounds = (1 to 5).map { i =>
        s"""dm$i AS (SELECT coalesce(sum(CASE WHEN hasout IS NULL THEN pi END), 0) AS m FROM r${i - 1}),
           |fl$i AS (SELECT tr.t2 AS st, sum(r.pi * tr.p) AS f
           |  FROM r${i - 1} r JOIN tr ON r.st = tr.f GROUP BY 1),
           |r$i AS (SELECT sv.st, sv.hasout, coalesce(fl$i.f, 0) + dm$i.m / nn.n AS pi
           |  FROM sv LEFT JOIN fl$i ON sv.st = fl$i.st, dm$i, nn)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT user_id AS e, ts, event_id, event_type AS s FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
         |seq AS (SELECT e, s, lead(s) OVER (PARTITION BY e ORDER BY ts, event_id) AS nxt FROM ev),
         |cnt AS (SELECT s AS f, nxt AS t2, count(*) AS c FROM seq
         |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |tr AS (SELECT f, t2, c * 1.0 / sum(c) OVER (PARTITION BY f) AS p FROM cnt),
         |st AS (SELECT f AS st FROM tr UNION SELECT t2 FROM tr),
         |ho AS (SELECT DISTINCT f AS st, true AS hasout FROM tr),
         |sv AS (SELECT st.st, ho.hasout FROM st LEFT JOIN ho USING (st)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sv),
         |r0 AS (SELECT sv.st, sv.hasout, 1.0 / nn.n AS pi FROM sv, nn),
         |$rounds
         |SELECT st AS state, round(pi, 6) AS pi FROM r5 ORDER BY state""".stripMargin
    },

    // Same seed collapse (l₂=x₂, b₂=x₂−x₁), same coupled recurrence as
    // a recursive CTE over the per-key row_number.
    "b29_holt" ->
      """WITH RECURSIVE
        |daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d, sum(value) AS x
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY d) AS t,
        |    count(*) OVER (PARTITION BY g) AS n FROM daily),
        |h AS (
        |  SELECT o2.g, o2.n, CAST(2 AS BIGINT) AS t, o2.x AS l,
        |    o2.x - o1.x AS b, CAST(0.0 AS DOUBLE) AS sse
        |  FROM o o1 JOIN o o2 ON o1.g = o2.g AND o1.t = 1 AND o2.t = 2
        |  UNION ALL
        |  SELECT o.g, o.n, o.t,
        |    0.3 * o.x + 0.7 * (h.l + h.b),
        |    0.1 * ((0.3 * o.x + 0.7 * (h.l + h.b)) - h.l) + 0.9 * h.b,
        |    h.sse + pow(o.x - (h.l + h.b), 2)
        |  FROM h JOIN o ON o.g = h.g AND o.t = h.t + 1)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n, round(l, 4) AS level,
        | round(b, 4) AS trend, round(l + 7 * b, 4) AS forecast,
        | round(sse, 4) AS sse
        |FROM h WHERE t = n ORDER BY event_type""".stripMargin,

    // Same pair join, tie-corrected variance, continuity-corrected z,
    // and Φ polynomial.
    "b40_mann_kendall" ->
      """WITH daily AS (SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS di, sum(value) AS x
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, CAST(ts AS DATE)),
        |p AS (SELECT a.g, sum(sign(b.x - a.x)) AS s_stat, count(*) AS n_pairs
        |  FROM daily a JOIN daily b ON a.g = b.g AND a.di < b.di GROUP BY 1),
        |t AS (SELECT g, x, count(*) AS t FROM daily GROUP BY 1, 2),
        |v AS (SELECT g, CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(t * (t - 1) * (t * 2 + 5)) AS DOUBLE) AS tsum FROM t GROUP BY 1),
        |j AS (SELECT p.g, v.n, p.n_pairs, p.s_stat,
        |    (CAST(v.n AS DOUBLE) * (v.n - 1) * (v.n * 2 + 5) - v.tsum) / 18.0 AS vs
        |  FROM p JOIN v USING (g)),
        |z AS (SELECT *, CASE WHEN s_stat > 0 THEN (s_stat - 1) / nullif(sqrt(vs), 0)
        |    WHEN s_stat < 0 THEN (s_stat + 1) / nullif(sqrt(vs), 0)
        |    ELSE CASE WHEN sqrt(vs) > 0 THEN 0.0 END END AS zz FROM j),
        |q AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(zz)) AS tq,
        |    exp(-0.5 * zz * zz) / sqrt(2 * pi()) AS pdf FROM z)
        |SELECT g AS event_type, n, CAST(n_pairs AS BIGINT) AS n_pairs,
        | CAST(s_stat AS BIGINT) AS s_stat, round(zz, 6) AS z,
        | round(CASE WHEN zz IS NULL THEN NULL
        |   ELSE 2 * pdf * (tq * (0.319381530 + tq * (-0.356563782 +
        |     tq * (1.781477937 + tq * (-1.821255978 + tq * 1.330274429))))) END, 6) AS p_approx
        |FROM q ORDER BY event_type""".stripMargin,

    // Same pair table, same interpolated medians (DuckDB median
    // averages the two middles on even counts, as sortedMedian does).
    "b30_theil_sen" ->
      """WITH daily AS (SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS di, sum(value) AS x
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, CAST(ts AS DATE)),
        |p AS (SELECT a.g, (b.x - a.x) / (b.di - a.di) AS sl
        |  FROM daily a JOIN daily b ON a.g = b.g AND a.di < b.di),
        |sl AS (SELECT g, count(*) AS n_pairs, median(sl) AS slope FROM p GROUP BY 1)
        |SELECT d.g AS event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(max(n_pairs) AS BIGINT) AS n_pairs, round(max(slope), 6) AS slope,
        | round(median(d.x - slope * d.di), 6) AS intercept
        |FROM daily d JOIN sl ON d.g = sl.g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same grid KS (every group's CDF at every support point), same
    // Kolmogorov series, same step-up rule and suffix-min q-values.
    "b31_fdr_drift" ->
      """WITH base AS (SELECT source AS g, n_chars AS v FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |cells AS (SELECT g, v, count(*) AS c FROM base GROUP BY 1, 2),
        |supc AS (SELECT v, sum(sum(c)) OVER (ORDER BY v) AS cv
        |  FROM cells GROUP BY v),
        |grp AS (SELECT g, sum(c) AS ng FROM cells GROUP BY 1),
        |tot AS (SELECT sum(c) AS nn FROM cells),
        |grid AS (SELECT grp.g, supc.v, supc.cv, grp.ng, coalesce(cells.c, 0) AS c
        |  FROM grp CROSS JOIN supc LEFT JOIN cells ON cells.g = grp.g AND cells.v = supc.v),
        |cum AS (SELECT g, ng, cv, sum(c) OVER (PARTITION BY g ORDER BY v) AS cg FROM grid),
        |d AS (SELECT g, max(ng) AS n_group, max(nn - ng) AS n_rest,
        |    max(abs(cg * 1.0 / ng - (cv - cg) * 1.0 / nullif(nn - ng, 0))) AS ds
        |  FROM cum, tot GROUP BY 1),
        |l AS (SELECT *, (sqrt(n_group * 1.0 * n_rest / (n_group + n_rest)) + 0.12 +
        |    0.11 / sqrt(n_group * 1.0 * n_rest / (n_group + n_rest))) * ds AS lam FROM d),
        |pv AS (SELECT g, n_group, n_rest, ds,
        |    CASE WHEN n_rest = 0 THEN NULL
        |      WHEN lam < 0.05 THEN 1.0
        |      ELSE least(1.0, greatest(0.0, 2.0 * list_sum(list_transform(range(1, 101),
        |        k -> (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END) *
        |          exp(-2.0 * k * k * lam * lam))))) END AS p
        |  FROM l),
        |ranked AS (SELECT *, row_number() OVER (ORDER BY p, g) AS k,
        |    count(*) OVER () AS m FROM pv WHERE p IS NOT NULL),
        |q AS (SELECT *, min(p * m * 1.0 / k) OVER
        |    (ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS qv FROM ranked),
        |kstar AS (SELECT max(CASE WHEN p * m <= 0.1 * k THEN k END) AS ks FROM ranked)
        |SELECT g AS key, CAST(n_group AS BIGINT) AS n_group,
        | CAST(n_rest AS BIGINT) AS n_rest, round(ds, 6) AS d_stat,
        | round(p, 6) AS p_value, CAST(k AS BIGINT) AS p_rank,
        | round(least(1.0, qv), 6) AS q_value,
        | coalesce(k <= kstar.ks, false) AS rejected
        |FROM q, kstar ORDER BY key""".stripMargin,

    // Same per-key collapse, method-of-moments prior, posterior mean.
    "b32_eb_shrink" ->
      """WITH pk AS (SELECT o_custkey AS key, count(*) AS n,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS y
        |  FROM orders GROUP BY 1),
        |m AS (SELECT avg(y / n) AS mu, var_pop(y / n) AS s2 FROM pk),
        |pr AS (SELECT mu, CASE WHEN s2 > 0 AND mu > 0 AND mu < 1
        |      AND mu * (1 - mu) / s2 - 1 > 0
        |    THEN mu * (1 - mu) / s2 - 1 END AS ab FROM m)
        |SELECT key, CAST(n AS BIGINT) AS n, y, round(y / n, 6) AS raw_rate,
        | round(mu * ab, 6) AS prior_alpha, round((1 - mu) * ab, 6) AS prior_beta,
        | round((y + mu * ab) / (n + ab), 6) AS shrunk
        |FROM pk, pr ORDER BY key""".stripMargin,

    "b28_mann_whitney" ->
      """WITH a AS (SELECT value AS v FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL),
        |b AS (SELECT value AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL),
        |ca AS (SELECT v, count(*) AS na FROM a GROUP BY 1),
        |cb AS (SELECT v, count(*) AS nb FROM b GROUP BY 1),
        |m AS (SELECT coalesce(ca.v, cb.v) AS v, coalesce(na, 0) AS ca,
        |    coalesce(nb, 0) AS cb FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (SELECT ca, cb, ca + cb AS t,
        |    coalesce(sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM m),
        |s AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        |    sum(ca * (off + (t + 1) / 2.0)) AS sumra,
        |    CAST(sum(t * t * t - t) AS DOUBLE) AS ties FROM c),
        |u AS (SELECT n_a, n_b, sumra - n_a * (n_a + 1) / 2.0 AS ua, ties FROM s)
        |SELECT n_a, n_b, round(ua, 4) AS u_a,
        | round((ua - n_a * 1.0 * n_b / 2.0) /
        |   nullif(sqrt(n_a * 1.0 * n_b / 12.0 *
        |     (n_a + n_b + 1 - ties / nullif((n_a + n_b) * 1.0 * (n_a + n_b - 1), 0))), 0), 6) AS z
        |FROM u""".stripMargin,

    // Same string-derived digit, same shares and χ².
    "b27_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS tt FROM c),
        |s AS (SELECT digit, n, n * 1.0 / tt AS obs,
        |    log10(1.0 + 1.0 / digit) AS exp FROM c, t),
        |x AS (SELECT max(t.tt) * sum(pow(obs - exp, 2) / exp) AS chi2 FROM s, t)
        |SELECT digit, CAST(n AS BIGINT) AS n, round(obs, 6) AS obs_share,
        | round(exp, 6) AS exp_share, round(x.chi2, 4) AS chi2
        |FROM s, x ORDER BY digit""".stripMargin,

    // The same recurrence as a recursive CTE (t from a per-key
    // row_number), same resets, same raw-statistic alarm predicate.
    "b26_cusum" ->
      """WITH RECURSIVE
        |daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d, sum(value) AS x
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT g, avg(x) AS mu, stddev_pop(x) AS sd FROM daily GROUP BY 1),
        |z AS (SELECT daily.g, (d - DATE '1970-01-01') AS i, (x - mu) / sd AS z,
        |    row_number() OVER (PARTITION BY daily.g ORDER BY d) AS t
        |  FROM daily JOIN st ON daily.g = st.g WHERE sd > 0),
        |c AS (
        |  SELECT g, t, i, z,
        |    greatest(0, z - 0.25) AS sp_raw, greatest(0, -z - 0.25) AS sn_raw,
        |    CASE WHEN greatest(0, z - 0.25) > 2.5 THEN 0
        |         ELSE greatest(0, z - 0.25) END AS sp,
        |    CASE WHEN greatest(0, -z - 0.25) > 2.5 THEN 0
        |         ELSE greatest(0, -z - 0.25) END AS sn
        |  FROM z WHERE t = 1
        |  UNION ALL
        |  SELECT z.g, z.t, z.i, z.z,
        |    greatest(0, c.sp + z.z - 0.25), greatest(0, c.sn - z.z - 0.25),
        |    CASE WHEN greatest(0, c.sp + z.z - 0.25) > 2.5 THEN 0
        |         ELSE greatest(0, c.sp + z.z - 0.25) END,
        |    CASE WHEN greatest(0, c.sn - z.z - 0.25) > 2.5 THEN 0
        |         ELSE greatest(0, c.sn - z.z - 0.25) END
        |  FROM c JOIN z ON z.g = c.g AND z.t = c.t + 1)
        |SELECT g AS key, CAST(i AS BIGINT) AS idx, dir AS direction FROM (
        |  SELECT g, i, 'up' AS dir FROM c WHERE sp_raw > 2.5
        |  UNION ALL
        |  SELECT g, i, 'down' AS dir FROM c WHERE sn_raw > 2.5)
        |ORDER BY 1, 2, 3""".stripMargin,

    // Same cells/margins decomposition, same product-free log terms.
    "b25_mutual_info" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    count(*) AS o FROM orders GROUP BY 1, 2),
        |r AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
        |c AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |ha AS (SELECT -sum(ra * 1.0 / t.n * (ln(ra) - ln(t.n))) AS ha FROM r, t),
        |hb AS (SELECT -sum(cb * 1.0 / t.n * (ln(cb) - ln(t.n))) AS hb FROM c, t),
        |mi AS (SELECT max(t.n) AS n,
        |    sum(o * 1.0 / t.n * (ln(o) + ln(t.n) - ln(ra) - ln(cb))) AS mi
        |  FROM cells JOIN r USING (a) JOIN c USING (b), t)
        |SELECT CAST(n AS BIGINT) AS n, round(mi, 6) AS mi,
        | round(CASE WHEN ha > 0 AND hb > 0 THEN mi / sqrt(ha * hb) END, 6) AS nmi
        |FROM mi, ha, hb""".stripMargin,

    // Same daily collapse, same biased-estimator formula, same
    // aligned-pairs self-join (no window on either side).
    "b24_acf" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS d, sum(value) AS x
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |di AS (SELECT g, (d - DATE '1970-01-01') AS i, x FROM daily),
        |st AS (SELECT g, avg(x) AS mu, count(*) AS n, var_pop(x) AS vp
        |  FROM di GROUP BY 1),
        |p AS (SELECT a.g, l.lag, st.n,
        |    (a.x - st.mu) * (b.x - st.mu) AS prod, st.n * st.vp AS den
        |  FROM di a JOIN st ON a.g = st.g
        |  CROSS JOIN UNNEST(range(1, 8)) AS l(lag)
        |  JOIN di b ON b.g = a.g AND b.i = a.i - l.lag)
        |SELECT g AS event_type, CAST(lag AS INT) AS lag,
        | CAST(max(n) AS BIGINT) AS n,
        | round(sum(prod) / nullif(max(den), 0), 6) AS acf
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same md5→uniform→Poisson-inverse-CDF draws, same order-statistic
    // CI picks; list() FILTERed to mirror collect_list's null-dropping.
    "b23_bootstrap_ci" ->
      """WITH base AS (SELECT event_type AS g, value AS v,
        |    CAST(event_id AS VARCHAR) AS id FROM events WHERE value IS NOT NULL),
        |u AS (SELECT g, v, r,
        |    (CAST('0x' || substr(md5(id || ':bs:' || CAST(r // 2 AS VARCHAR)),
        |        1 + (r % 2) * 15, 15) AS BIGINT)
        |      % 1000000 + 0.5) / 1000000.0 AS u
        |  FROM base, UNNEST(range(0, 40)) AS t(r)),
        |w AS (SELECT g, v, r,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.9999167588507119 THEN 6
        |         WHEN u < 0.9999824406472794 THEN 7
        |         ELSE 8 END * 1.0 AS w FROM u),
        |rep AS (SELECT g, r, sum(w * v) / nullif(sum(w), 0) AS m
        |  FROM w GROUP BY 1, 2),
        |q AS (SELECT g, list_sort(list(m) FILTER (WHERE m IS NOT NULL)) AS ms
        |  FROM rep GROUP BY 1),
        |ci AS (SELECT g, ms, len(ms) AS mn FROM q),
        |pt AS (SELECT g, count(*) AS n, avg(v) AS mean FROM base GROUP BY 1)
        |SELECT pt.g AS event_type, CAST(n AS BIGINT) AS n,
        | round(mean, 4) AS mean,
        | round(ms[greatest(1, CAST(floor(0.025 * mn) AS INT))], 4) AS ci_lo,
        | round(ms[least(mn, CAST(ceil(0.975 * mn) AS INT))], 4) AS ci_hi
        |FROM pt JOIN ci ON pt.g = ci.g ORDER BY event_type""".stripMargin,

    // Same distinct-value CDF merge, same λ correction and 100-term
    // Kolmogorov series (sequential list fold — fp-mirrorable).
    "b22_ks_test" ->
      """WITH a AS (SELECT value AS v FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL),
        |b AS (SELECT value AS v FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL),
        |ca AS (SELECT v, count(*) AS na FROM a GROUP BY 1),
        |cb AS (SELECT v, count(*) AS nb FROM b GROUP BY 1),
        |m AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (SELECT sum(na) OVER w AS cna, sum(nb) OVER w AS cnb FROM m
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT (SELECT count(*) FROM a) AS ta, (SELECT count(*) FROM b) AS tb),
        |d AS (SELECT max(abs(cna * 1.0 / t.ta - cnb * 1.0 / t.tb)) AS ds,
        |    max(t.ta) AS ta, max(t.tb) AS tb FROM c, t),
        |l AS (SELECT ds, ta, tb,
        |    (sqrt(ta * 1.0 * tb / (ta + tb)) + 0.12 +
        |     0.11 / sqrt(ta * 1.0 * tb / (ta + tb))) * ds AS lam FROM d)
        |SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
        | round(ds, 6) AS d_stat,
        | round(CASE WHEN lam < 0.05 THEN 1.0
        |   ELSE least(1.0, greatest(0.0, 2.0 * list_sum(list_transform(range(1, 101),
        |     k -> (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END) *
        |       exp(-2.0 * k * k * lam * lam))))) END, 6) AS p_value
        |FROM l""".stripMargin,

    "b14_growth" ->
      """WITH m AS (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    sum(o_totalprice) AS rev FROM orders GROUP BY 1)
        |SELECT month, round(rev, 4) AS revenue,
        | round((rev - lag(rev, 1) OVER (ORDER BY month)) / lag(rev, 1) OVER (ORDER BY month) * 100, 4) AS mom_pct,
        | round((rev - lag(rev, 12) OVER (ORDER BY month)) / lag(rev, 12) OVER (ORDER BY month) * 100, 4) AS yoy_pct
        |FROM m ORDER BY month""".stripMargin,

    "b13_rfm_segments" ->
      """WITH per AS (SELECT o_custkey AS customer, max(o_orderdate) AS last_order,
        |    count(*) AS frequency, sum(o_totalprice) AS monetary FROM orders GROUP BY 1),
        |sc AS (SELECT customer, monetary,
        |  ntile(5) OVER (ORDER BY last_order, customer) AS r_score,
        |  ntile(5) OVER (ORDER BY frequency, customer) AS f_score,
        |  ntile(5) OVER (ORDER BY monetary, customer) AS m_score FROM per)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        | round(avg(monetary), 4) AS avg_monetary
        |FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin,

    // c21's step-time CTE chain, then quantile_cont — the same linear
    // interpolation as Spark's exact percentile.
    "b12_time_to_convert" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type AS et FROM events),
        |u1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
        |u2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN u1 USING (user_id) WHERE et = 'click' AND t > t1 GROUP BY 1),
        |u3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN u2 USING (user_id) WHERE et = 'purchase' AND t > t2 GROUP BY 1),
        |d AS (SELECT (epoch_us(t3) - epoch_us(t1)) / 1000000.0 AS dt
        |      FROM u3 JOIN u1 USING (user_id))
        |SELECT count(*) AS n_converted, round(avg(dt), 4) AS avg_sec,
        | round(quantile_cont(dt, 0.5), 4) AS p50_sec,
        | round(quantile_cont(dt, 0.9), 4) AS p90_sec,
        | round(min(dt), 4) AS min_sec, round(max(dt), 4) AS max_sec
        |FROM d""".stripMargin,

    // The same ascending rank formula; ties cannot move the statistic.
    "b18_gini" ->
      """WITH s AS (SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY 1),
        |r AS (SELECT spend, row_number() OVER (ORDER BY spend, o_custkey) AS rn,
        |       count(*) OVER () AS n, sum(spend) OVER () AS tot FROM s)
        |SELECT max(n) AS n, round(max(tot), 4) AS total,
        | round(2.0 * sum(spend * rn) / (max(n) * max(tot)) - (max(n) + 1.0) / max(n), 4) AS gini
        |FROM r""".stripMargin,

    // Same distinct collapse, cap, joint/marginal algebra; both sides
    // Same contingency closed form (observed χ² + (n − Σ observed e));
    // DuckDB dayofweek is 0-based where Spark's is 1-based.
    "b20_cramers_v" ->
      """WITH x AS (SELECT event_type AS a,
        |    dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS b FROM events),
        |cells AS (SELECT a, b, count(*) AS o FROM x GROUP BY 1, 2),
        |r AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
        |c AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cells),
        |j AS (SELECT o, ra * cb / t.n AS e
        |  FROM cells JOIN r USING (a) JOIN c USING (b), t),
        |s AS (SELECT sum((o - e) * (o - e) / e) AS chio, sum(e) AS sume FROM j)
        |SELECT CAST(t.n AS BIGINT) AS n,
        | (SELECT count(*) FROM r) AS r, (SELECT count(*) FROM c) AS c,
        | round(chio + (t.n - sume), 4) AS chi2,
        | round(sqrt((chio + (t.n - sume)) /
        |   (t.n * (least((SELECT count(*) FROM r), (SELECT count(*) FROM c)) - 1))), 4)
        |   AS cramers_v
        |FROM s, t""".stripMargin,

    // Same decimal totals, same (total DESC, key) cum order, same cuts.
    "b19_abc" ->
      """WITH t AS (SELECT o_custkey AS k,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders GROUP BY 1),
        |g AS (SELECT sum(total) AS grand FROM t),
        |r AS (SELECT k, total, sum(total) OVER (ORDER BY total DESC, k
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM t),
        |c AS (SELECT total,
        |    CAST(cum AS DOUBLE) / CAST(g.grand AS DOUBLE) AS cs FROM r, g)
        |SELECT CASE WHEN cs <= 0.8 THEN 'A' WHEN cs <= 0.95 THEN 'B'
        |            ELSE 'C' END AS abc_class,
        | count(*) AS n_customers, round(sum(total), 2) AS class_revenue
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // order on the ROUNDED lift with the pair as tie-break.
    "b17_basket_lift" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 1000),
        |k AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)),
        |n AS (SELECT count(DISTINCT b) AS nb FROM k),
        |m AS (SELECT i, count(*) AS ni FROM k GROUP BY 1),
        |p AS (SELECT a.i AS item_a, b2.i AS item_b, count(*) AS n_joint
        |      FROM k a JOIN k b2 ON a.b = b2.b AND a.i < b2.i GROUP BY 1, 2
        |      HAVING count(*) >= 2)
        |SELECT item_a, item_b, CAST(n_joint AS BIGINT) AS n_joint,
        | CAST(ma.ni AS BIGINT) AS n_a, CAST(mb.ni AS BIGINT) AS n_b,
        | round(n_joint * 1.0 / n.nb, 6) AS support,
        | round(n_joint * 1.0 / ma.ni, 4) AS conf_a_to_b,
        | round(n_joint * 1.0 / mb.ni, 4) AS conf_b_to_a,
        | round(n_joint * 1.0 * n.nb / (ma.ni * mb.ni), 4) AS lift
        |FROM p JOIN m ma ON p.item_a = ma.i JOIN m mb ON p.item_b = mb.i, n
        |ORDER BY round(n_joint * 1.0 * n.nb / (ma.ni * mb.ni), 4) DESC, item_a, item_b
        |LIMIT 15""".stripMargin,

    // Same md5 bucket split (the proven d14 hex-cast idiom), same
    // entity-grain collapse, same pooled-z arithmetic; arg_min/arg_max
    // mirror min_by/max_by.
    "b16_ab_test" ->
      """WITH e AS (SELECT user_id,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'expA'), 1, 15) AS BIGINT) % 2 = 0
        |       THEN 'A' ELSE 'B' END AS variant,
        |  event_type = 'purchase' AS conv, value FROM events),
        |p AS (SELECT user_id, variant, max(CASE WHEN conv THEN 1 ELSE 0 END) AS c,
        |      sum(CASE WHEN conv THEN value ELSE 0 END) AS v FROM e GROUP BY 1, 2),
        |s AS (SELECT variant, count(*) AS n, sum(c) AS conv, sum(v) AS rev FROM p GROUP BY 1),
        |o AS (SELECT min(variant) AS variant_a, max(variant) AS variant_b,
        |   arg_min(n, variant) AS n_a, arg_max(n, variant) AS n_b,
        |   arg_min(conv, variant) AS conv_a, arg_max(conv, variant) AS conv_b,
        |   arg_min(rev, variant) AS rev_a, arg_max(rev, variant) AS rev_b FROM s)
        |SELECT variant_a, variant_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        | CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
        | round(conv_a * 1.0 / n_a, 4) AS rate_a, round(conv_b * 1.0 / n_b, 4) AS rate_b,
        | round(rev_a, 4) AS rev_a, round(rev_b, 4) AS rev_b,
        | round((conv_b*1.0/n_b - conv_a*1.0/n_a) / nullif(conv_a*1.0/n_a, 0) * 100, 4) AS lift_pct,
        | round((conv_b*1.0/n_b - conv_a*1.0/n_a)
        |   / nullif(sqrt(((conv_a+conv_b)*1.0/(n_a+n_b)) * (1 - (conv_a+conv_b)*1.0/(n_a+n_b))
        |       * (1.0/n_a + 1.0/n_b)), 0), 4) AS z_score,
        | round(pow(n_a - n_b, 2) * 1.0 / (n_a + n_b), 4) AS srm_chi2
        |FROM o""".stripMargin,

    // DuckDB's ntile is the SQL standard one ntileExact reimplements;
    // same desc/tie order, same round-4 presentation.
    "b11_decile_lift" ->
      """WITH s AS (SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY 1),
        |t AS (SELECT o_custkey, spend,
        |    ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile FROM s),
        |p AS (SELECT decile, count(*) AS n_customers, sum(spend) AS rev FROM t GROUP BY 1)
        |SELECT decile, n_customers, round(rev, 4) AS revenue,
        | round(rev / sum(rev) OVER (), 4) AS share,
        | round(sum(rev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       / sum(rev) OVER (), 4) AS cum_share
        |FROM p ORDER BY decile""".stripMargin,

  )
}
