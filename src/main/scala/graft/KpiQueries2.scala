package graft
import graft.analytics.Kpis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.RelationalQueries.revenue

/** B-series KPI/statistics driver rows, second file (trend and rank
  * tests b40/b28/b30, drift/FDR b31, shrinkage b32, changepoints b26,
  * information measures b25/b20, ACF b24, bootstrap b23, Benford b27,
  * growth/RFM/funnel/lift b11-b14, experiment b16, basket/Gini/ABC
  * b17-b19) — split from [[KpiQueries]] along the registry midpoint
  * purely for file size; KpiQueries merges these maps into the
  * surface SparkEntry exposes.
  */
private[graft] object KpiQueries2 {

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
    })
  )

  private[graft] val oracleSql: Map[String, String] = Map(

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
        |FROM p ORDER BY decile""".stripMargin
  )
}
