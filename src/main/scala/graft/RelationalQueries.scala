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

  // lazy + merged: the sibling file holds the other half of this
  // registry (split along the SURVEY midpoint purely for file size)
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    localQueries ++ RelationalQueries2.queries

  lazy val oracleSql: Map[String, String] =
    localOracleSql ++ RelationalQueries2.oracleSql

  private val localQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


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
  )

  private val localOracleSql: Map[String, String] = Map(


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
  )
}
