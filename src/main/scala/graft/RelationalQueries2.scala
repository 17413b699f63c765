package graft
import graft.etl.{Cleaning, Scd}
import graft.operators.{Ranking, Relational}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C-series relational driver rows, second file (point-in-time c30,
  * nearest/radius/interval/CIDR joins c37/c53/c48/c58/c59, bucketed
  * parity c12, salted join c13, global rank c33, gap fill c34,
  * correlation matrix c36, set algebra c39, join preflight c42,
  * running totals c43, reconciliation c46, incremental-view join c47,
  * sequence match c49, OHLC c52, weighted quantiles c54, melt c55,
  * percent rank c57) — split from [[RelationalQueries]] along the
  * registry midpoint purely for file size; RelationalQueries merges
  * these maps into the surface SparkEntry exposes.
  */
private[graft] object RelationalQueries2 {

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

  private[graft] val oracleSql: Map[String, String] = Map(

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
