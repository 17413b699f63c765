package graft

import graft.etl.{Cleaning, Scd}
import graft.operators.{Ranking, Relational}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** C-series driver queries (relational core: star joins, windows,
  * sessionization, intervals) with their DuckDB oracles — the graph +
  * sketch family lives in [[GraphQueries]]; SparkEntry composes the
  * union and documents the alias/ordering contract. */
private[graft] object RelationalQueries {

  private[graft] def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ==================================================== C: relational core

    "c1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(revenue), 4).as("sum_disc_price"),
          round(sum(revenue * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "c2_join_topk" -> ((s, dir) => {
      val cust = broadcast(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"))
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > to_timestamp(lit("1998-03-15 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
        .agg(round(sum(revenue), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
    }),

    "c3_star_join" -> ((s, dir) => {
      val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nat = broadcast(Tables.nation(s, dir).join(broadcast(reg), col("n_regionkey") === col("r_regionkey")))
      val sup = broadcast(Tables.supplier(s, dir))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(revenue), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    "c4_anti_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 4).as("sum_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // EXISTS/IN as a left-semi join — c4's complement; the filter on
    // the probe side reaches its scan before the join.
    "c4b_semi_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 4).as("sum_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // Scalar-subquery predicate: orders priced above the global mean —
    // the aggregate computes once (one tiny broadcast), never per row.
    "c28_scalar_subquery" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val avgPrice = o.agg(avg("o_totalprice").as("__m"))
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("__m"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(min("o_totalprice"), 4).as("min_price"))
        .orderBy("o_orderstatus")
    }),

    "c5_window_topk" -> ((s, dir) => {
      Relational.topKPerGroup(
          Tables.orders(s, dir).filter(col("o_custkey") % 50 === 0),
          partitionBy = Seq(col("o_custkey")),
          orderBy = Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 4).as("total_price"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    "c6_rollup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")
    }),

    // Full CUBE over (status, priority) — all 2^2 grouping sets, vs
    // ROLLUP's hierarchy in c6.
    "c6b_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")
    }),

    // Arbitrary GROUPING SETS (the general form behind c6/c6b's
    // rollup/cube): (status, priority), (status), () — one Expand-based
    // aggregate, same single shuffle as a plain groupBy.
    "c6c_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")
    }),

    // Fixed-width histogram of order totals — the distribution profile
    // every curation/QA dashboard starts from. Plain floor-division
    // binning (clamped top bucket) so any engine mirrors it exactly.
    "c15_histogram" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(least(floor(col("o_totalprice") / 20000.0), lit(29.0)).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // Equi-depth (quantile) histogram over order prices: 8 depth
    // buckets via the two-level grid decomposition — one corpus
    // shuffle onto 1024 fixed micro-cells, cumulative window over the
    // bounded cell table only. The oracle replays the identical grid,
    // cumsum, and ceil-mapping.
    "c15b_equidepth" -> ((s, dir) => {
      graft.analytics.Kpis.equiDepthHistogram(Tables.orders(s, dir),
          col("o_totalprice"), buckets = 8, lo = 0.0, hi = 600000.0)
        .orderBy("bucket")
    }),

    "c7_pivot" -> ((s, dir) => {
      Relational.pivotAgg(Tables.events(s, dir), col("user_id"), "event_type",
          values = Seq("click", "error", "purchase", "signup", "view"), measure = col("value"))
        .orderBy("user_id")
    }),

    "c8_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          round(sum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0)), 4).as("returned_price"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus")
    }),

    // Binned range join: orders (as day offsets from 1992-01-01) matched
    // into 20 overlapping 150-day windows. The bin trick turns interval
    // containment into an equi-join (PlanSpec enforces no nested-loop
    // product); the windows are constructed deterministically so DuckDB
    // mirrors them with range(20).
    "c16_range_join" -> ((s, dir) => {
      val pts = Tables.orders(s, dir)
        .select(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long").as("d"),
          col("o_totalprice"))
      val ranges = s.range(20).select(col("id").as("range_id"),
        (col("id") * 100).as("r_start"), (col("id") * 100 + 149).as("r_end"))
      Relational.rangeJoin(pts, ranges, col("d"), col("r_start"), col("r_end"), binWidth = 64)
        .groupBy("range_id")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
        .orderBy("range_id")
    }),

    // PageRank over the supplier→part supply graph (5 fixed rounds,
    // dangling part-vertices redistribute their mass) — the iterative
    // graph workload; crawl-curation's domain-ranking shape.
    // Incremental aggregate maintenance: orders split into three
    // slices, per-slice state tables merged and finalized — the hash
    // match against a direct one-shot aggregate PROVES slice-merge ≡
    // full recompute (the never-rescan-the-corpus maintenance path).
    "c25_agg_state" -> ((s, dir) => {
      import graft.operators.AggState
      val keys = Seq("o_orderstatus")
      val vals = Seq("o_totalprice")
      val slices = (0 until 3).map(i =>
        Tables.orders(s, dir).filter(pmod(col("o_orderkey"), lit(3)) === i))
      val states = slices.map(AggState.state(_, keys, vals))
      AggState.finalizeState(AggState.merge(states, keys, vals), vals)
        .select(col("o_orderstatus"), col("n_rows"), col("cnt_o_totalprice"),
          round(col("sum_o_totalprice"), 2).as("sum_price"),
          round(col("min_o_totalprice"), 2).as("min_price"),
          round(col("max_o_totalprice"), 2).as("max_price"),
          round(col("avg_o_totalprice"), 4).as("avg_price"))
        .orderBy("o_orderstatus")
    }),

    // Per-group winsorization: tails clipped into [p05, p95] per
    // return flag; rows kept (contrast with a4's nulling).
    "a17_winsorize" -> ((s, dir) => {
      Cleaning.winsorizeByGroup(Tables.lineitem(s, dir),
          col("l_returnflag"), "l_extendedprice", lo = 0.05, hi = 0.95)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(avg("l_extendedprice"), 4).as("avg_raw"),
          round(avg("l_extendedprice_w"), 4).as("avg_winsorized"))
        .orderBy("l_returnflag")
    }),

    // Time-weighted average per user: value held until the next
    // observation; duration-weighted, not count-weighted.
    "c22_twap" -> ((s, dir) => {
      Relational.timeWeightedAvg(Tables.events(s, dir),
          col("user_id"), col("ts"), col("value"), tieBreak = Seq(col("event_id")))
        .orderBy("entity")
    }),

    // Ordered funnel: view → click-after-view → purchase-after-click
    // per user, one user-keyed shuffle + chained window minima.
    "c21_funnel" -> ((s, dir) => {
      graft.analytics.Funnel.funnel(Tables.events(s, dir),
          col("user_id"), col("ts"), col("event_type"),
          Seq("view", "click", "purchase"))
        .orderBy("step_index")
    }),

    // MERGE/upsert (SCD1): a derived update batch (every 10th order
    // re-priced, every 100th tombstoned) merged into the snapshot,
    // latest version per key wins.
    "a16_upsert" -> ((s, dir) => {
      val cur = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), lit(0L).as("v"))
      val upd = Tables.orders(s, dir).filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit(1L).as("v"),
          (col("o_orderkey") % 100 === 0).as("deleted"))
      graft.etl.Upsert.upsert(cur, upd, Seq("o_orderkey"), "v", tombstone = Some("deleted"))
        .orderBy("o_orderkey")
    }),

    // Fuzzy string join (entity resolution): customers matched against
    // a typo'd mirror of themselves by char-trigram Jaccard over the
    // stop-gram-capped universe — the record-linkage join an equi-join
    // cannot express and a cross join cannot survive.
    "c20_fuzzy_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"))
      val dirty = cust.select((col("id") + 1000000L).as("id"),
        regexp_replace(col("name"), "Customer", "Custmr").as("name"))
      // n=4 + maxDf=250: on zero-padded sequential names the join cost
      // is Σ df² over surviving grams — 4-grams cut per-gram df ~20×
      // vs trigrams, and the 250 cap drops the half-specific grams
      // (df in the hundreds) that each cost df² comparisons while
      // discriminating nothing (3-gram/df=1000 formulation: 8.9s at
      // sf0.1; this one: ~1s)
      graft.operators.Fuzzy.fuzzyJoinPairs(cust, col("id"), col("name"),
          dirty, col("id"), col("name"), threshold = 0.5, n = 4, maxDf = 250)
        .orderBy("left_id", "right_id")
    }),

    // Cohort retention triangle over the events stream: first-active
    // week per user → share still active k weeks later.
    "b8_retention" -> ((s, dir) => {
      graft.analytics.Retention.cohortRetention(Tables.events(s, dir),
          col("user_id"), col("ts"))
        .orderBy("cohort_week", "week_offset")
    }),

    "c9_time_bucket" -> ((s, dir) => {
      Relational.timeBucketAgg(Tables.events(s, dir), col("ts"), "1 hour",
          groupBy = Seq(col("event_type")), value = col("value"))
        .select("bucket_start", "event_type", "n", "sum_value")
        .orderBy("bucket_start", "event_type")
    }),

    // As-of join: each purchase picks up the user's most recent prior
    // view (at-or-before event time) — implemented as the one-shuffle
    // union+window operator; the oracle uses DuckDB's native ASOF JOIN.
    "c11_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts")).agg(max("value").as("view_value"))
        .withColumn("vts", col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      Relational.asOfJoin(purchases, views, key = "user_id", ts = "ts",
          rightVals = Seq("view_value", "vts"))
        .select(col("event_id"), col("user_id"),
          round(col("asof_view_value"), 4).as("last_view_value"),
          (Relational.epochMicros(col("ts")) - Relational.epochMicros(col("asof_vts"))).as("gap_us"))
        .orderBy("event_id")
    }),

    "c10_sessionize" -> ((s, dir) => {
      val sessions = Relational.sessionize(Tables.events(s, dir),
        entity = col("user_id"), ts = col("ts"), gapSeconds = 1800,
        orderTieBreak = Seq(col("event_id")))
      Relational.sessionStats(sessions, col("user_id"))
        .orderBy("user_id", "session_id")
    }),

    // Trailing 1-hour per-user moving aggregate at every event (RANGE
    // frame over event time — tie-safe, order-independent).
    // lag/lead analytics: per-user inter-event gaps (flavor-agnostic
    // epochMicros), aggregated per event type.
    "c29_event_gaps" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      ev.withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .withColumn("__gap",
          (Relational.epochMicros(col("ts")) - Relational.epochMicros(col("__prev")))
            .cast("double") / 1000000.0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg(col("__gap")), 4).as("avg_gap_s"),
          round(max(col("__gap")), 4).as("max_gap_s"))
        .orderBy("event_type")
    }),

    "c14_moving_avg" -> ((s, dir) => {
      Relational.movingAgg(Tables.events(s, dir),
          entity = col("user_id"), ts = col("ts"), value = col("value"), windowSeconds = 3600)
        .select(col("event_id"), col("user_id"), col("moving_n"),
          round(col("moving_avg"), 4).as("moving_avg"))
        .orderBy("event_id")
    }),

    // Rolling z-score anomaly detection: each event scored against its
    // user's 20 STRICTLY PRECEDING observations; warm-up rows and
    // zero-variance baselines are unevaluable, anomalies are |z| > 2.5.
    "c32_anomalies" -> ((s, dir) => {
      graft.analytics.Anomaly.rollingZScore(Tables.events(s, dir),
          entity = col("user_id"), ts = col("ts"), value = col("value"),
          lookback = 20, zThreshold = 2.5, tieBreak = Seq(col("event_id")))
        .groupBy("event_type")
        .agg(count(when(col("evaluated"), 1)).as("n_evaluated"),
          count(when(col("is_anomaly"), 1)).as("n_anomalies"),
          round(avg(abs(col("z"))), 4).as("avg_abs_z"))
        .orderBy("event_type")
    }),

    // State-transition occupancy via a point-in-time lookup: each event
    // asks "what was this user's SCD2 event_type state ONE HOUR AGO" —
    // the lagged lookup makes the fact ts land mid-interval (and, early
    // in a user's history, before the first version → 'none'), so the
    // join genuinely exercises interval containment rather than matching
    // every event to the version it itself created.
    "c30_pit_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = Scd.fromChangeLog(ev,
        keyCols = Seq("user_id"), attrCols = Seq("event_type"),
        tsCol = "ts", tieBreak = Seq("event_id"))
      val facts = ev.select(col("event_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("lookup_ts"),
        col("event_type").as("cur_type"))
      Relational.pointInTimeJoin(facts, dim,
          key = "user_id", factTs = "lookup_ts", attrCols = Seq("event_type"))
        .groupBy(col("cur_type"),
          coalesce(col("pit_event_type"), lit("none")).as("prior_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("cur_type", "prior_type")
    }),

    // Exact global ranking WITHOUT a single-partition window (range
    // shuffle + shuffle-reusing offset count + narrow index map). The
    // every-1000th-rank probe spans all range partitions, so the oracle
    // cross-checks the offset arithmetic end to end.
    "c33_global_rank" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      Ranking.globalRank(o, Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .filter((col("global_rank") - 1) % 1000 === 0)
        .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("total_price"),
          col("global_rank"))
        .orderBy("global_rank")
    }),

    // Daily series densification + LOCF. The event_id % 101 thinning
    // makes real holes in the per-type daily grid (the dense raw stream
    // has none), so spine insertion, is_gap, and the carry-forward all
    // get exercised against the oracle. Sums are rounded BEFORE the
    // fill so carried values equal their source row bit-for-bit.
    "c34_gap_fill" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_id") % 101 === 0)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 4).as("v"), count(lit(1)).as("n"))
      graft.operators.TimeSeries.gapFillLocf(daily, Seq("event_type"), "day", Seq("v", "n"))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("is_gap"), col("filled_v"), col("filled_n"))
        .orderBy("event_type", "day")
    }),

    // Per-segment co-movement profile: every measure pair's corr +
    // covariance from ONE hash aggregate (pairs add accumulators, not
    // passes — the plan pin lives in StatsSpec).
    "c36_corr_matrix" -> ((s, dir) => {
      graft.analytics.Stats.correlationMatrix(Tables.lineitem(s, dir),
          Seq(col("l_returnflag")),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("l_returnflag"), col("n"),
          round(col("corr_l_quantity_l_extendedprice"), 4).as("corr_qty_price"),
          round(col("corr_l_quantity_l_discount"), 4).as("corr_qty_disc"),
          round(col("corr_l_extendedprice_l_discount"), 4).as("corr_price_disc"),
          round(col("cov_l_quantity_l_extendedprice"), 4).as("cov_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Salted-join RESULT parity (C13): the skew-defused join must be
    // indistinguishable from the plain join it replaces — the salt is
    // pure plumbing (each fact row meets exactly one dim replica), so
    // the oracle is the UNSALTED SQL join. Plan shape (dim replicated
    // nSalts×, fact keys spread over (key, salt)) is pinned in
    // RelationalSpec; this row pins the algebra.
    "c13_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_quantity"))
      val supp = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Relational.saltedJoin(li, supp, "l_suppkey", nSalts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    // Bucketed-layout RESULT parity (C12): write both join sides as
    // co-bucketed co-sorted tables (8 buckets on the order key), join
    // THROUGH the catalog tables — the layout's shuffle-free merge
    // join must return exactly what the plain shuffled join returns.
    // BucketingSpec pins the no-Exchange plan; this row pins the
    // result against the oracle's plain join.
    "c12_bucketed_parity" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
      graft.sources.Bucketing.writeBucketed(li, "graft_c12_lineitem",
        "l_orderkey", nBuckets = 8, sortCols = Seq("l_orderkey"))
      graft.sources.Bucketing.writeBucketed(o, "graft_c12_orders",
        "o_orderkey", nBuckets = 8, sortCols = Seq("o_orderkey"))
      val jl = s.table("graft_c12_lineitem")
      val jo = s.table("graft_c12_orders")
      jl.join(jo, jl("l_orderkey") === jo("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // Join-size preflight of the events-on-user self-join (the
    // accidental-quadratic audit): exact per-key pair contributions and
    // the total output forecast from ONE metadata-scale count aggregate
    // — the forecast join itself never runs. Total rides in as a
    // one-row broadcast scalar carrier, never a global window.
    "c42_join_preflight" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      graft.operators.JoinPreflight.hotKeys(e, col("user_id"), e, col("user_id"), topN = 10)
        .select(col("key").as("user_id"), col("n_left"), col("n_right"), col("pairs"),
          col("est_total_pairs"), round(col("share"), 4).as("share"))
        .orderBy(col("pairs").desc, col("user_id"))
    }),

    // Incremental join-view maintenance: the orders⋈customer view kept
    // current through signed-multiset deltas on BOTH sides (odd-key
    // order inserts, mod-31 deletes, mod-53 customer segment rewrites
    // as delete+insert) — the delta algebra's answer must equal a full
    // recompute, which is exactly what the oracle performs.
    "c47_ivm_join" -> ((s, dir) => {
      // the maintained view projects what its readers need — IVM cost
      // (and scan width) tracks the VIEW's schema, not the base tables'
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      val aOld = orders.filter(col("o_orderkey") % 2 === 0)
      val dA = orders.filter(col("o_orderkey") % 2 === 1).withColumn("__mult", lit(1L))
        .unionByName(orders
          .filter(col("o_orderkey") % 2 === 0 && col("o_orderkey") % 31 === 0)
          .withColumn("__mult", lit(-1L)))
      val upd = cust.filter(col("custkey") % 53 === 0)
      val dB = upd.withColumn("__mult", lit(-1L))
        .unionByName(upd.withColumn("c_mktsegment", lit("UPDATED"))
          .withColumn("__mult", lit(1L)))
      val v0 = aOld.join(cust, Seq("custkey"))
      graft.etl.ViewMaintenance.refreshJoinView(v0, aOld, dA, cust, dB, Seq("custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // Interval-overlap join: order activity intervals (orderdate +
    // key-dependent duration) × overlapping campaign windows — binned
    // equi-join with canonical-bin once-per-pair semantics, never a
    // nested loop.
    "c48_interval_join" -> ((s, dir) => {
      val iv = Tables.orders(s, dir)
        .select(col("o_totalprice"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long").as("ls"),
          (col("o_orderkey") % 21).as("dur"))
        .withColumn("le", col("ls") + col("dur")).drop("dur")
      val win = s.range(30).select(col("id").as("win_id"),
        (col("id") * 90).as("rs"), (col("id") * 90 + 119).as("re"))
      Relational.intervalJoin(iv, win,
          col("ls"), col("le"), col("rs"), col("re"), binWidth = 64)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
        .orderBy("win_id")
    }),

    // 2-D radius join on deterministic synthetic coordinates (modular
    // residues of the keys — exactly mirrorable): customer × supplier
    // proximity pairs, histogrammed by integer squared distance.
    "c53_radius_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).select(col("c_custkey").as("cid"),
        (col("c_custkey") % 97).as("cx"), ((col("c_custkey") * 7) % 89).as("cy"))
      val supp = Tables.supplier(s, dir).select(col("s_suppkey").as("sid"),
        (col("s_suppkey") % 97).as("sx"), ((col("s_suppkey") * 11) % 89).as("sy"))
      Relational.radiusJoin2D(cust, supp,
          col("cx"), col("cy"), col("sx"), col("sy"), radius = 5.0, cellSize = 5.0)
        .withColumn("d2", (col("cx") - col("sx")) * (col("cx") - col("sx")) +
          (col("cy") - col("sy")) * (col("cy") - col("sy")))
        .groupBy(expr("d2 div 5").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("cid") + col("sid")).as("id_sum"))
        .orderBy("bucket")
    }),

    // Exact weighted quantiles: the price below which 25/50/75/95% of
    // shipped QUANTITY (not line count) lives — per-distinct-value
    // weight reduce, distributed prefix CDF, broadcast probability
    // table; decimal weights so both engines' prefix sums are exact.
    "c54_weighted_quantiles" -> ((s, dir) => {
      Ranking.weightedQuantiles(Tables.lineitem(s, dir),
          col("l_extendedprice"), col("l_quantity").cast("decimal(18,2)"),
          Seq(0.25, 0.5, 0.75, 0.95), as = "wq_price")
        .orderBy("p")
    }),

    // Wide→long reshape (pandas melt / ANSI UNPIVOT): part measures to
    // a (key, metric, value) triple table — narrow Expand, zero shuffle.
    "c55_melt" -> ((s, dir) => {
      Relational.melt(Tables.part(s, dir), ids = Seq("p_partkey"),
          values = Seq("p_size", "p_retailprice"),
          varName = "metric", valueName = "value")
        .orderBy("p_partkey", "metric")
    }),

    // Exact global percent_rank/cume_dist without the single-partition
    // window: distributed rank pass + key-level tie bounds joined back.
    "c57_percent_rank" -> ((s, dir) => {
      Ranking.percentRanks(
          Tables.part(s, dir).select("p_partkey", "p_retailprice"),
          col("p_retailprice"), Seq(col("p_partkey").asc))
        .select(col("p_partkey"), round(col("percent_rank"), 6).as("pr"),
          round(col("cume_dist"), 6).as("cd"))
        .orderBy("p_partkey")
    }),

    // CIDR blocklist containment: /16-block equi-join + exact prefix
    // verify — no cartesian against the rule table, rule tables may be
    // corpus-scale. IPs are hash-derived from user ids (demo binding);
    // odd-nation /15 rules overlap the even /16s on purpose.
    "c59_cidr_join" -> ((s, dir) => {
      val ips = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
        .withColumn("ip", concat_ws(".", lit(10),
          pmod(col("user_id"), lit(30)),
          pmod(col("user_id") * 7, lit(251)),
          pmod(col("user_id") * 13, lit(241))))
      val rules = Tables.nation(s, dir)
        .select(when(pmod(col("n_nationkey"), lit(2)) === 0,
            format_string("10.%d.0.0/16", col("n_nationkey")))
          .otherwise(format_string("10.%d.0.0/15", col("n_nationkey") - 1))
          .as("cidr"))
      graft.sources.Net.cidrContainmentJoin(ips, col("ip"), rules, col("cidr"))
        .groupBy(col("cidr")).agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cidr")
    }),

    // Grid-tiled interval × interval overlap join: click vs view
    // user-day session windows, classified into Allen relations. Cell
    // equi-join + first-live-cell predicate — no cartesian, no distinct.
    "c58_interval_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      val us = Relational.epochMicros(col("ts"))
      def sessions(t: String, p: String) = e.filter(col("event_type") === t)
        .groupBy(col("user_id").as(s"${p}_user"), to_date(col("ts")).as(s"${p}_day"))
        .agg(min(us).as(s"${p}s"), (max(us) + lit(1L)).as(s"${p}e"))
      val iv = graft.operators.Intervals.intervalJoin(
        sessions("click", "l"), col("ls"), col("le"),
        sessions("view", "r"), col("rs"), col("re"),
        cellWidth = 21600000000L) // 6-hour cells in epoch micros
      iv.groupBy(graft.operators.Intervals.allenRelation(
            col("ls"), col("le"), col("rs"), col("re")).as("relation"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("relation")
    }),

    // OHLC candlestick downsampling: daily bars per event type in one
    // partial-aggregating shuffle (open/close via min_by/max_by over
    // the (ts, event_id) struct — no window, no per-bucket sort).
    "c52_ohlc_bars" -> ((s, dir) => {
      graft.operators.TimeSeries.ohlcBars(Tables.events(s, dir),
          keys = Seq(col("event_type")), ts = col("ts"), value = col("value"),
          bucket = "1 day", tieBreak = Seq(col("event_id")))
        // vwap is the one order-sensitive SUM in the bar (fp summation
        // order differs across engines and a 150-bucket run measurably
        // lands on rounding boundaries) — it stays spec-verified; the
        // oracle pins the exact-pick fields
        .select(col("event_type"), col("bucket_start"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          col("volume"))
        .orderBy("event_type", "bucket_start")
    }),

    // MATCH_RECOGNIZE-lite: per-session event sequences as symbol
    // strings, the funnel pattern "signup, any views/clicks, purchase"
    // as a regex — rolled up per user. Sessionize-first is the scale
    // contract (bounds the per-task sequence AND scopes the pattern).
    "c49_seq_match" -> ((s, dir) => {
      val sess = Relational.sessionize(Tables.events(s, dir),
        entity = col("user_id"), ts = col("ts"), gapSeconds = 1800,
        orderTieBreak = Seq(col("event_id")))
      graft.operators.SequenceMatch.matchPattern(sess,
          entity = struct(col("user_id").as("u"), col("session_id").as("sid")),
          ts = col("ts"), eventType = col("event_type"),
          symbols = Map("signup" -> "s", "view" -> "v", "click" -> "c",
            "purchase" -> "p", "error" -> "e"),
          pattern = "s[vc]*p",
          tieBreak = Seq(col("event_id")))
        .groupBy(col("entity.u").as("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_matches") > 0, 1L).otherwise(0L)).as("matched_sessions"),
          sum(col("n_matches")).as("total_matches"))
        .orderBy("user_id")
    }),

    // Merkle-style replica reconciliation: a tampered in-plan copy
    // (mod-97 balance bumps, mod-101 deletions) against the original —
    // checksum buckets localize, the A23 digest diff classifies; only
    // dirty-bucket rows ever reach the row join.
    "c46_reconcile" -> ((s, dir) => {
      val a = Tables.customer(s, dir)
      val b = a
        .filter(pmod(col("c_custkey"), lit(101)) =!= 0)
        .withColumn("c_acctbal", when(pmod(col("c_custkey"), lit(97)) === 0,
          col("c_acctbal") + 100.0).otherwise(col("c_acctbal")))
      graft.etl.Reconcile.reconcile(a, b, "c_custkey",
          Seq("c_name", "c_acctbal", "c_mktsegment"), buckets = 64)
        .groupBy("change")
        .agg(count(lit(1)).as("n"), sum(col("key")).as("key_sum"),
          max(col("n_dirty_buckets")).as("n_dirty_buckets"),
          max(col("n_buckets")).as("n_buckets"))
        .orderBy("change")
    }),

    // Exact distributed running total over the full order history (no
    // single-partition window): range-sliced local prefixes + bounded
    // offset window, decimal-cast so prefix grouping is exact on both
    // engines; rolled up per year so the whole prefix stream is
    // hash-checked through its extremes.
    "c43_running_total" -> ((s, dir) => {
      graft.operators.Ranking.runningAgg(Tables.orders(s, dir),
          order = Seq(col("o_orderdate").asc, col("o_orderkey").asc),
          value = col("o_totalprice").cast("decimal(18,2)"),
          agg = "sum", as = "run")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"),
          round(max(col("run")).cast("double"), 2).as("max_run"),
          round(min(col("run")).cast("double"), 2).as("min_run"))
        .orderBy("yr")
    }),

    // Set-algebra audience segmentation: viewers ∩ clickers − purchasers
    // via Dataset.intersect/except — ANSI INTERSECT/EXCEPT set
    // semantics (dedup + null-safe equality), the idiom behind every
    // "did X and Y but not Z" audience cut. Each leg is a distinct
    // aggregate; Spark plans intersect/except as left-semi/anti joins
    // over the deduped sides — no row amplification at any scale.
    "c39_set_algebra" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def who(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
      val audience = who("view").intersect(who("click")).except(who("purchase"))
      audience.agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("user_id_sum"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"))
    }),

    // Two-sided nearest-event enrichment: each purchase matched to the
    // user's closest error event within ±1 hour (right side pre-deduped
    // per (user, ts) — the operator's uniqueness contract). Summarized
    // per outcome so the matched/unmatched split and the signed-gap
    // distribution are both oracle-checked.
    "c37_nearest_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("err_id"))
      Relational.nearestJoin(purchases, errors, key = "user_id", ts = "ts",
          rightVals = Seq("err_id"), maxGapSeconds = Some(3600))
        .groupBy(when(col("nearest_dt_sec").isNull, "none")
          .when(col("nearest_dt_sec") < 0, "before").otherwise("after").as("outcome"))
        .agg(count(lit(1)).as("n"), round(avg(abs(col("nearest_dt_sec"))), 4).as("avg_abs_sec"),
          sum(col("nearest_err_id")).as("err_id_sum"))
        .orderBy("outcome")
    })
  )

  val oracleSql: Map[String, String] = Map(

    "c1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "c2_join_topk" ->
      """SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1,3,4 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "c3_star_join" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "c4_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal),4) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "c4b_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal),4) AS sum_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "c28_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n, round(min(o_totalprice),4) AS min_price
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "c5_window_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS total_price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        | FROM orders WHERE o_custkey % 50 = 0)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "c6_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(o_orderpriority,'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice),4) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "c6b_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(o_orderpriority,'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice),4) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "c6c_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(o_orderpriority,'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice),4) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin,

    "c15_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 20000.0), 29.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "c29_event_gaps" ->
      """WITH x AS (SELECT user_id, event_id, event_type, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events)
        |SELECT event_type, count(*) AS n,
        | round(avg(date_diff('microsecond', prev, ts) / 1000000.0), 4) AS avg_gap_s,
        | round(max(date_diff('microsecond', prev, ts) / 1000000.0), 4) AS max_gap_s
        |FROM x WHERE prev IS NOT NULL GROUP BY 1 ORDER BY event_type""".stripMargin,

    // SCD2 rebuild (the a14 CTE chain) + interval-containment join at
    // each event's ts minus one hour. Boundary semantics mirror the
    // Spark side: lookup exactly at valid_from matches the NEW version
    // (vfrom <= lus), exactly at valid_to does not (lus < vto).
    "c30_pit_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |f AS (SELECT user_id, event_type, us, event_id,
        |  (row_number() OVER w = 1
        |   OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (SELECT user_id, event_type AS vtype, us AS vfrom,
        |   lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS vto FROM f WHERE chg),
        |fc AS (SELECT event_id, user_id, event_type AS cur_type, us - 3600000000 AS lus FROM e),
        |j AS (SELECT fc.cur_type, v.vtype
        |      FROM fc LEFT JOIN v ON fc.user_id = v.user_id
        |        AND v.vfrom <= fc.lus AND (v.vto IS NULL OR fc.lus < v.vto))
        |SELECT cur_type, coalesce(vtype, 'none') AS prior_type, count(*) AS n
        |FROM j GROUP BY 1, 2 ORDER BY cur_type, prior_type""".stripMargin,

    // Same strictly-trailing ROWS frame, full-window gate, and
    // zero-variance null; the threshold compares the UNROUNDED z in
    // both engines.
    "c32_anomalies" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |w AS (SELECT event_type, value,
        |   count(value) OVER win AS n,
        |   avg(value) OVER win AS mu,
        |   stddev_samp(value) OVER win AS sd
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, (n = 20) AS evaluated,
        |   CASE WHEN n = 20 AND sd > 0 THEN (value - mu) / sd END AS z FROM w)
        |SELECT event_type, count(CASE WHEN evaluated THEN 1 END) AS n_evaluated,
        | count(CASE WHEN abs(z) > 2.5 THEN 1 END) AS n_anomalies,
        | round(avg(abs(z)), 4) AS avg_abs_z
        |FROM z GROUP BY 1 ORDER BY event_type""".stripMargin,

    // Identical grid (1024 cells over [0, 600000)), identical cumsum
    // and ceil bucket mapping, so counts AND bucket min/max match.
    // The total is aliased "tot", NOT "N" — like Spark, DuckDB
    // resolves case-insensitively and "N" would capture the per-cell
    // "n" (the bug both engines hit symmetrically on first cut).
    "c15b_equidepth" ->
      """WITH c AS (SELECT
        |   CAST(greatest(least(floor((o_totalprice - 0.0) / (600000.0 / 1024)), 1023), 0) AS BIGINT) AS cell,
        |   CAST(o_totalprice AS DOUBLE) AS v FROM orders),
        |p AS (SELECT cell, count(*) AS n, min(v) AS lo_v, max(v) AS hi_v FROM c GROUP BY 1),
        |m AS (SELECT cell, n, lo_v, hi_v,
        |   sum(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cum,
        |   sum(n) OVER () AS tot FROM p)
        |SELECT CAST(least(ceil(CAST(cum AS DOUBLE) * 8 / CAST(tot AS DOUBLE)), 8) AS BIGINT) AS bucket,
        |  CAST(sum(n) AS BIGINT) AS n, round(min(lo_v), 4) AS lo, round(max(hi_v), 4) AS hi
        |FROM m GROUP BY 1 ORDER BY bucket""".stripMargin,

    "c7_pivot" ->
      """SELECT user_id,
        | round(coalesce(sum(CASE WHEN event_type='click' THEN value END),0),4) AS click,
        | round(coalesce(sum(CASE WHEN event_type='error' THEN value END),0),4) AS error,
        | round(coalesce(sum(CASE WHEN event_type='purchase' THEN value END),0),4) AS purchase,
        | round(coalesce(sum(CASE WHEN event_type='signup' THEN value END),0),4) AS signup,
        | round(coalesce(sum(CASE WHEN event_type='view' THEN value END),0),4) AS view
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,

    "c8_distinct" ->
      """SELECT l_linestatus, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | round(sum(CASE WHEN l_returnflag='R' THEN l_extendedprice ELSE 0 END),4) AS returned_price,
        | count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "c16_range_join" ->
      """WITH pts AS (SELECT date_diff('day', DATE '1992-01-01', o_orderdate) AS d, o_totalprice FROM orders),
        |r AS (SELECT CAST(range AS BIGINT) AS range_id, range*100 AS s, range*100+149 AS e FROM range(20)),
        |j AS (SELECT range_id, o_totalprice FROM pts JOIN r ON d >= s AND d <= e)
        |SELECT range_id, count(*) AS n, round(sum(o_totalprice),4) AS sum_price
        |FROM j GROUP BY 1 ORDER BY range_id""".stripMargin,

    // Direct one-shot aggregate — equality with the merged slice
    // states is exactly the mergeability guarantee under test.
    "c25_agg_state" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        | count(o_totalprice) AS cnt_o_totalprice,
        | round(sum(o_totalprice), 2) AS sum_price,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price,
        | round(sum(o_totalprice) / count(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "a17_winsorize" ->
      """WITH b AS (SELECT l_returnflag AS g, quantile_cont(l_extendedprice, 0.05) AS qlo,
        |            quantile_cont(l_extendedprice, 0.95) AS qhi FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, round(avg(l_extendedprice),4) AS avg_raw,
        | round(avg(least(greatest(l_extendedprice, qlo), qhi)),4) AS avg_winsorized
        |FROM lineitem JOIN b ON l_returnflag = b.g GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "c22_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value AS v, event_id FROM events),
        |l AS (SELECT user_id, v, us,
        |      lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur FROM e)
        |SELECT user_id AS entity, CAST(count(*) AS BIGINT) AS n_obs,
        | round(sum(v*dur)/sum(dur), 4) AS twap
        |FROM l GROUP BY 1 ORDER BY entity""".stripMargin,

    "c21_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type AS et FROM events),
        |u1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
        |u2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN u1 USING (user_id) WHERE et = 'click' AND t > t1 GROUP BY 1),
        |u3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN u2 USING (user_id) WHERE et = 'purchase' AND t > t2 GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM u1) AS n1, (SELECT count(*) FROM u2) AS n2, (SELECT count(*) FROM u3) AS n3)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS step_index, 'view' AS step, CAST(n1 AS BIGINT) AS n_users, round(n1*1.0/n1,4) AS conversion FROM n
        | UNION ALL SELECT 2, 'click', CAST(n2 AS BIGINT), round(n2*1.0/n1,4) FROM n
        | UNION ALL SELECT 3, 'purchase', CAST(n3 AS BIGINT), round(n3*1.0/n1,4) FROM n
        |) ORDER BY step_index""".stripMargin,

    "a16_upsert" ->
      """WITH upd AS (SELECT o_orderkey, o_custkey, o_totalprice*2 AS o_totalprice, 1 AS v,
        |             (o_orderkey % 100 = 0) AS del
        |      FROM orders WHERE o_orderkey % 10 = 0),
        |allrows AS (SELECT o_orderkey, o_custkey, o_totalprice, 0 AS v, false AS del FROM orders
        |            UNION ALL SELECT * FROM upd),
        |latest AS (SELECT * FROM allrows
        |           QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) = 1)
        |SELECT o_orderkey, o_custkey, o_totalprice, CAST(v AS BIGINT) AS v
        |FROM latest WHERE NOT del ORDER BY o_orderkey""".stripMargin,

    "c20_fuzzy_join" ->
      """WITH l AS (SELECT CAST(c_custkey AS BIGINT) AS id, regexp_replace(lower(trim(c_name)),'\s+',' ','g') AS s FROM customer),
        |r AS (SELECT CAST(c_custkey AS BIGINT) + 1000000 AS id,
        |      regexp_replace(lower(trim(regexp_replace(c_name,'Customer','Custmr','g'))),'\s+',' ','g') AS s FROM customer),
        |lg AS (SELECT DISTINCT id, substr(s, CAST(i AS INT), 4) AS g FROM l, UNNEST(range(1, length(s)-2)) AS u(i)),
        |rg AS (SELECT DISTINCT id, substr(s, CAST(i AS INT), 4) AS g FROM r, UNNEST(range(1, length(s)-2)) AS u(i)),
        |keep AS (SELECT g FROM (SELECT g FROM lg UNION ALL SELECT g FROM rg) GROUP BY g HAVING count(*) <= 250),
        |lk AS (SELECT lg.* FROM lg JOIN keep USING (g)),
        |rk AS (SELECT rg.* FROM rg JOIN keep USING (g)),
        |ls AS (SELECT id AS left_id, count(*) AS na FROM lk GROUP BY 1),
        |rs AS (SELECT id AS right_id, count(*) AS nb FROM rk GROUP BY 1),
        |sh AS (SELECT lk.id AS left_id, rk.id AS right_id, count(*) AS ns FROM lk JOIN rk USING (g) GROUP BY 1,2)
        |SELECT left_id, right_id, n_shared, jaccard FROM (
        | SELECT sh.left_id, sh.right_id, CAST(ns AS BIGINT) AS n_shared,
        |  round(ns*1.0/(na+nb-ns), 4) AS jaccard
        | FROM sh JOIN ls USING (left_id) JOIN rs USING (right_id))
        |WHERE jaccard >= 0.5 ORDER BY left_id, right_id""".stripMargin,

    "b8_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS w FROM events),
        |coh AS (SELECT user_id, min(w) AS cw FROM act GROUP BY 1),
        |j AS (SELECT a.user_id, c.cw, CAST(date_diff('day', c.cw, a.w)/7 AS BIGINT) AS week_offset
        |      FROM act a JOIN coh c USING (user_id)),
        |r AS (SELECT cw, week_offset, count(*) AS n_users FROM j GROUP BY 1,2),
        |s AS (SELECT cw, n_users AS cohort_size FROM r WHERE week_offset = 0)
        |SELECT CAST(r.cw AS DATE) AS cohort_week, r.week_offset, r.n_users,
        | round(r.n_users*1.0/s.cohort_size, 4) AS retention
        |FROM r JOIN s USING (cw) ORDER BY cohort_week, week_offset""".stripMargin,

    "c9_time_bucket" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS bucket_start,
        | event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY bucket_start, event_type""".stripMargin,

    "c10_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, us,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        | CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec
        |FROM g GROUP BY 1,2 ORDER BY user_id, session_id""".stripMargin,

    "c11_asof_join" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, max(value) AS view_value
        |           FROM events WHERE event_type = 'view' GROUP BY 1,2),
        |p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, round(v.view_value, 4) AS last_view_value,
        | epoch_us(p.pts) - epoch_us(v.vts) AS gap_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.pts >= v.vts
        |ORDER BY event_id""".stripMargin,

    "c14_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |SELECT event_id, user_id,
        | count(value) OVER w AS moving_n,
        | round(avg(value) OVER w, 4) AS moving_avg
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Same total order (price desc, key asc) and the same every-1000th
    // probe; raw column values, so ranks are bit-identical.
    "c33_global_rank" ->
      """WITH r AS (SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS global_rank
        |  FROM orders)
        |SELECT o_orderkey, round(o_totalprice, 4) AS total_price, global_rank
        |FROM r WHERE (global_rank - 1) % 1000 = 0 ORDER BY global_rank""".stripMargin,

    // Same spine construction (per-type min..max day), same pre-fill
    // rounding, same IGNORE NULLS trailing-frame carry.
    "c34_gap_fill" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(sum(value), 4) AS v, count(*) AS n
        |  FROM events WHERE event_id % 101 = 0 GROUP BY 1, 2),
        |b AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1),
        |s AS (SELECT event_type, CAST(t.d AS DATE) AS day
        |  FROM b CROSS JOIN unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
        |j AS (SELECT s.event_type, s.day, d.v, d.n
        |  FROM s LEFT JOIN d ON s.event_type = d.event_type AND s.day = d.day)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, (n IS NULL) AS is_gap,
        | last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v,
        | last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_n
        |FROM j ORDER BY event_type, day""".stripMargin,

    "c36_corr_matrix" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | round(corr(l_quantity, l_discount), 4) AS corr_qty_disc,
        | round(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    // The full recompute the delta algebra must reproduce.
    "c47_ivm_join" ->
      """WITH o2 AS (SELECT * FROM orders
        |            WHERE NOT (o_orderkey % 2 = 0 AND o_orderkey % 31 = 0)),
        |c2 AS (SELECT c_custkey,
        |   CASE WHEN c_custkey % 53 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 4) AS revenue
        |FROM o2 JOIN c2 ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The same overlap join as a direct non-equi join (fine at oracle
    // scale; the engine's binned form exists because this shape is a
    // nested loop at 100 TB).
    "c48_interval_join" ->
      """WITH iv AS (SELECT o_totalprice,
        |  date_diff('day', DATE '1992-01-01', o_orderdate) AS ls,
        |  date_diff('day', DATE '1992-01-01', o_orderdate)
        |    + o_orderkey % 21 AS le FROM orders),
        |w AS (SELECT CAST(range AS BIGINT) AS win_id, range*90 AS rs,
        |             range*90 + 119 AS re FROM range(30)),
        |j AS (SELECT win_id, o_totalprice FROM iv JOIN w
        |      ON ls <= re AND rs <= le)
        |SELECT win_id, count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
        |FROM j GROUP BY 1 ORDER BY win_id""".stripMargin,

    // The naive distance join at oracle scale; all-integer outputs.
    "c53_radius_join" ->
      """WITH c AS (SELECT c_custkey AS cid, c_custkey % 97 AS cx,
        |    (c_custkey * 7) % 89 AS cy FROM customer),
        |s AS (SELECT s_suppkey AS sid, s_suppkey % 97 AS sx,
        |    (s_suppkey * 11) % 89 AS sy FROM supplier),
        |p AS (SELECT cid, sid,
        |    (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS d2
        |  FROM c, s
        |  WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 25)
        |SELECT d2 // 5 AS bucket, count(*) AS n_pairs,
        | CAST(sum(cid + sid) AS BIGINT) AS id_sum
        |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin,

    // The same inclusive-cumulative-weight CDF via a sequential window.
    "c54_weighted_quantiles" ->
      """WITH g AS (SELECT l_extendedprice AS v,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity > 0 GROUP BY 1),
        |c AS (SELECT v,
        |    sum(w) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    (SELECT sum(w) FROM g) AS tw
        |  FROM g)
        |SELECT t.p, min(c.v) AS wq_price
        |FROM c CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p) t
        |WHERE c.cw >= t.p * c.tw
        |GROUP BY t.p ORDER BY t.p""".stripMargin,

    // UNION ALL is the declarative unpivot; int measure cast to the
    // same promoted double the engine picks.
    "c55_melt" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        |FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    // Arithmetic containment (no string parsing, no blocks) — the
    // tiling must be invisible in the result.
    "c59_cidr_join" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
        |ip AS (SELECT user_id,
        |    10 * 16777216 + (user_id % 30) * 65536 +
        |    ((user_id * 7) % 251) * 256 + ((user_id * 13) % 241) AS ipu FROM u),
        |r AS (SELECT
        |    CASE WHEN n_nationkey % 2 = 0
        |      THEN '10.' || n_nationkey || '.0.0/16'
        |      ELSE '10.' || (n_nationkey - 1) || '.0.0/15' END AS cidr,
        |    10 * 16777216 +
        |      (CASE WHEN n_nationkey % 2 = 0 THEN n_nationkey
        |            ELSE n_nationkey - 1 END) * 65536 AS netu,
        |    CASE WHEN n_nationkey % 2 = 0 THEN 16 ELSE 15 END AS len
        |  FROM nation),
        |m AS (SELECT ip.user_id, r.cidr FROM ip JOIN r
        |  ON ip.ipu // CAST(power(2, 32 - r.len) AS BIGINT)
        |   = r.netu // CAST(power(2, 32 - r.len) AS BIGINT))
        |SELECT cidr, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // Plain theta overlap join (DuckDB IEJoin) + the same Allen CASE
    // in the same guard order — the grid decomposition must be
    // invisible in the result.
    "c58_interval_join" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |l AS (SELECT user_id, d, min(us) AS ls, max(us) + 1 AS le FROM e
        |  WHERE event_type = 'click' GROUP BY 1, 2),
        |r AS (SELECT user_id, d, min(us) AS rs, max(us) + 1 AS re FROM e
        |  WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT ls, le, rs, re FROM l JOIN r ON ls < re AND rs < le),
        |c AS (SELECT CASE
        |    WHEN le < rs THEN 'before' WHEN le = rs THEN 'meets'
        |    WHEN ls > re THEN 'after' WHEN ls = re THEN 'meets-inv'
        |    WHEN ls = rs AND le = re THEN 'equal'
        |    WHEN ls = rs AND le < re THEN 'starts'
        |    WHEN ls = rs THEN 'starts-inv'
        |    WHEN le = re AND ls > rs THEN 'finishes'
        |    WHEN le = re THEN 'finishes-inv'
        |    WHEN ls < rs AND le > re THEN 'contains'
        |    WHEN ls > rs AND le < re THEN 'during'
        |    WHEN ls < rs THEN 'overlaps'
        |    ELSE 'overlaps-inv' END AS relation FROM p)
        |SELECT relation, count(*) AS n_pairs FROM c
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "c57_percent_rank" ->
      """SELECT p_partkey,
        | round(percent_rank() OVER (ORDER BY p_retailprice), 6) AS pr,
        | round(cume_dist() OVER (ORDER BY p_retailprice), 6) AS cd
        |FROM part ORDER BY p_partkey""".stripMargin,

    // First/last resolved by the same (us, event_id) order via ranked
    // rows; vwap with unit weights is the plain mean.
    "c52_ohlc_bars" ->
      """WITH e AS (SELECT event_type, value, event_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, d ORDER BY us, event_id) AS ra,
        |    row_number() OVER (PARTITION BY event_type, d ORDER BY us DESC, event_id DESC) AS rz
        |  FROM e)
        |SELECT event_type, d AS bucket_start,
        | round(max(CASE WHEN ra = 1 THEN value END), 4) AS open,
        | round(max(value), 4) AS high, round(min(value), 4) AS low,
        | round(max(CASE WHEN rz = 1 THEN value END), 4) AS close,
        | count(*) AS volume
        |FROM r GROUP BY 1, 2 ORDER BY event_type, bucket_start""".stripMargin,

    // The same sessionization (b15's derivation), the same symbol
    // string, the same non-overlapping leftmost regex count (Java regex
    // and RE2 agree on this construct class).
    "c49_seq_match" ->
      """WITH e AS (SELECT user_id, event_id,
        |   CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
        |        WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |        WHEN 'error' THEN 'e' ELSE '_' END AS sym,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |o AS (SELECT user_id, event_id, sym, us,
        |   CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |        THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM o),
        |g AS (SELECT user_id, sid, string_agg(sym, '' ORDER BY us, event_id) AS seq
        |  FROM s GROUP BY 1, 2),
        |m AS (SELECT user_id, len(regexp_extract_all(seq, 's[vc]*p')) AS nm FROM g)
        |SELECT user_id, count(*) AS n_sessions,
        | CAST(sum(CASE WHEN nm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS matched_sessions,
        | CAST(sum(nm) AS BIGINT) AS total_matches
        |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin,

    // The affected-key classes and the same md5 bucket rule; dirty
    // buckets = distinct buckets of affected keys (a removed key always
    // flips the count; a changed key flips the digest sum — exact
    // decimal sums, cancellation would need md5-delta coincidence).
    "c46_reconcile" ->
      """WITH aff AS (SELECT c_custkey AS k,
        |   CASE WHEN c_custkey % 101 = 0 THEN 'removed' ELSE 'changed' END AS change
        |  FROM customer WHERE c_custkey % 101 = 0 OR c_custkey % 97 = 0),
        |d AS (SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) % 64
        |        AS bucket FROM aff),
        |s AS (SELECT count(DISTINCT bucket) AS ndirty FROM d)
        |SELECT change, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum,
        | s.ndirty AS n_dirty_buckets, CAST(64 AS BIGINT) AS n_buckets
        |FROM aff, s GROUP BY change, s.ndirty ORDER BY change""".stripMargin,

    // Same total order, same decimal-exact prefix, same yearly rollup.
    "c43_running_total" ->
      """WITH r AS (SELECT o_orderdate,
        |   sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |     ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM orders)
        |SELECT year(o_orderdate) AS yr, count(*) AS n,
        | round(CAST(max(run) AS DOUBLE), 2) AS max_run,
        | round(CAST(min(run) AS DOUBLE), 2) AS min_run
        |FROM r GROUP BY 1 ORDER BY yr""".stripMargin,

    // The UNSALTED join — the salt must be invisible in the algebra.
    "c13_salted_join" ->
      """SELECT s.s_nationkey, count(*) AS n, round(sum(l.l_quantity), 2) AS sum_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY s_nationkey""".stripMargin,

    // The plain (layout-oblivious) join — bucketing must be invisible
    // in the algebra.
    "c12_bucketed_parity" ->
      """SELECT o.o_orderpriority, count(*) AS n, round(sum(l.l_quantity), 2) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // Same counts table (self-join: both sides the same aggregate),
    // same product/total/share arithmetic, same deterministic order.
    "c42_join_preflight" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events
        |           WHERE user_id IS NOT NULL GROUP BY 1),
        |j AS (SELECT key, n AS n_left, n AS n_right, n * n AS pairs FROM c),
        |t AS (SELECT sum(pairs) AS tot FROM j)
        |SELECT key AS user_id, CAST(n_left AS BIGINT) AS n_left,
        | CAST(n_right AS BIGINT) AS n_right, CAST(pairs AS BIGINT) AS pairs,
        | CAST(t.tot AS BIGINT) AS est_total_pairs,
        | round(pairs * 1.0 / t.tot, 4) AS share
        |FROM j, t ORDER BY pairs DESC, user_id LIMIT 10""".stripMargin,

    "c39_set_algebra" ->
      """WITH a AS (SELECT user_id FROM events WHERE event_type = 'view'
        |  INTERSECT SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT count(*) AS n_users, CAST(sum(user_id) AS BIGINT) AS user_id_sum,
        | min(user_id) AS min_user, max(user_id) AS max_user FROM a""".stripMargin,

    // Exhaustive per-purchase candidate scan; (|dt|, dt) ordering
    // reproduces the closer-side election and the backward tie rule.
    "c37_nearest_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
        |l AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, t AS rt, min(event_id) AS err_id
        |      FROM e WHERE event_type = 'error' GROUP BY 1, 2),
        |cand AS (SELECT l.event_id, r.err_id,
        |    (epoch_us(r.rt) - epoch_us(l.t)) / 1000000.0 AS dt
        |  FROM l JOIN r USING (user_id)
        |  WHERE abs(epoch_us(r.rt) - epoch_us(l.t)) <= 3600000000),
        |best AS (SELECT event_id, err_id, dt,
        |    row_number() OVER (PARTITION BY event_id ORDER BY abs(dt), dt) AS rn FROM cand),
        |m AS (SELECT l.event_id, b.err_id, b.dt
        |  FROM l LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (event_id))
        |SELECT CASE WHEN dt IS NULL THEN 'none' WHEN dt < 0 THEN 'before' ELSE 'after' END AS outcome,
        | count(*) AS n, round(avg(abs(dt)), 4) AS avg_abs_sec,
        | CAST(sum(err_id) AS BIGINT) AS err_id_sum
        |FROM m GROUP BY 1 ORDER BY outcome""".stripMargin
  )
}
