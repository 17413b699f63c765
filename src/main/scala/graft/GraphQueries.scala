package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** C-series GRAPH + SKETCH driver queries (PageRank/HyperBall/LPA/BFS
  * and the mergeable-sketch table family) with their DuckDB oracles —
  * split from RelationalQueries; SparkEntry composes the union. */
private[graft] object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sketch distinct-count: at 100 TB exact countDistinct shuffles every
    // distinct value; the HLL++ sketch is the production path. The sketch
    // value is engine-specific, so the driver-checked output carries the
    // exact count plus a boolean asserting the sketch landed within 5%
    // (rsd=0.02 ⇒ ~2σ) — the oracle expects TRUE, so a drifting sketch
    // fails the gate.
    "c8b_distinct_approx" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("__n_approx"))
        .select(col("l_linestatus"), col("n_exact"),
          (abs(col("__n_approx") - col("n_exact")).cast("double") / col("n_exact") <= 0.05)
            .as("within_bound"))
        .orderBy("l_linestatus")
    }),

    // KLL quantile sketch TABLE (C8d): sketch per (status, returnflag),
    // percentiles from a UNION rollup (no raw-data rescan), then the
    // estimates' empirical ranks verified against the raw distribution
    // — |rank(p_q) − q| ≤ 0.05 covers KLL's ~1.65% rank error plus the
    // ~2% rank step of l_quantity's 50 tied values. The oracle mirrors
    // the exact columns and pins the bound booleans to TRUE.
    "c8d_quantile_sketch" -> ((s, dir) => {
      import graft.operators.Sketches
      val li = Tables.lineitem(s, dir)
      val table = Sketches.quantileSketchTable(li,
        Seq(col("l_linestatus"), col("l_returnflag")), col("l_quantity"))
      val rolled = Sketches.quantileRollup(table, Seq(col("l_linestatus")), Seq(0.5, 0.95))
      li.join(broadcast(rolled), "l_linestatus")
        .groupBy("l_linestatus")
        .agg(max("n_buckets").as("n_buckets"), count(lit(1)).as("n"),
          (sum(when(col("l_quantity") <= col("p50"), 1L).otherwise(0L)).cast("double")
            / count(lit(1))).as("__r50"),
          (sum(when(col("l_quantity") <= col("p95"), 1L).otherwise(0L)).cast("double")
            / count(lit(1))).as("__r95"))
        .select(col("l_linestatus"), col("n_buckets"), col("n"),
          (abs(col("__r50") - 0.5) <= 0.05).as("p50_in_bound"),
          (abs(col("__r95") - 0.95) <= 0.05).as("p95_in_bound"))
        .orderBy("l_linestatus")
    }),

    // Frequent-items sketch table (C8f): per-priority approx_top_k
    // sketches combined into a global top-3 — Spark 4's built-in state
    // functions, no custom aggregate needed. maxItemsTracked (1000) far
    // exceeds the distinct item count, so estimates are exact and the
    // oracle is a plain GROUP BY.
    "c8f_topk_sketch" -> ((s, dir) => {
      import graft.operators.Sketches
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority"), length(col("o_orderkey").cast("string")).as("digits"))
      val t = Sketches.topKSketchTable(o, Seq(col("o_orderpriority")), col("digits"),
        maxItemsTracked = 1000)
      Sketches.topKRollup(t, Seq.empty, k = 3)
        .select(col("item").as("digits"), col("n_estimate").as("n"))
        .orderBy(desc("n"), col("digits"))
    }),

    // Count-min frequency sketch table (C8h): per-day CM sketches over
    // user_id merged into one corpus sketch (counter ADD — exact,
    // order-independent), then five fixed users' estimated event counts
    // checked against the guaranteed [exact, exact + ε·N] envelope
    // (ε = e/width; depth 5 ⇒ the one-sided overflow prob < 0.7%/probe,
    // and deterministic here: fixed seed + fixed data). The c8b/c8d
    // bound-check pattern for a sketch whose exact answer the oracle
    // can compute.
    "c8h_countmin" -> ((s, dir) => {
      import graft.expressions.CountMin
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(to_date(col("ts")).as("day"))
        .agg(CountMin.cmAgg(col("user_id")).as("cm"))
      val bytes = daily.agg(CountMin.cmUnionAgg(col("cm")).as("cm"))
        .head().getAs[Array[Byte]]("cm")
      val slack = math.ceil(math.E / CountMin.DefaultWidth * CountMin.totalCount(bytes)).toLong
      ev.filter(col("user_id") < 5)
        .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .withColumn("__est", CountMin.estimate(bytes, col("user_id")))
        .select(col("user_id"), col("n_exact"),
          (col("__est") >= col("n_exact") &&
            col("__est") <= col("n_exact") + lit(slack)).as("est_in_bound"))
        .orderBy("user_id")
    }),

    // Theta sketch set algebra (C8e): distinct users who clicked AND
    // purchased (purchases restricted to the user_id%3==0 cohort so the
    // three set estimates differ). At verification scale the corpus has
    // far fewer distinct users than the 4096 nominal entries, so the
    // sketches are in EXACT mode and the oracle mirrors the set sizes
    // exactly — the same sized-for-exactness pattern as d6/d12.
    "c8e_theta_overlap" -> ((s, dir) => {
      import graft.operators.Sketches
      val ev = Tables.events(s, dir).filter(
        col("event_type") === "click" ||
          (col("event_type") === "purchase" && col("user_id") % 3 === 0))
      val sk = Sketches.thetaSketchTable(ev, Seq(col("event_type")),
        col("user_id")) // long input hashes natively — no per-row stringify
      sk.agg(
          max(when(col("event_type") === "click", col("tsketch"))).as("__a"),
          max(when(col("event_type") === "purchase", col("tsketch"))).as("__b"))
        .select(
          Sketches.thetaSetEstimate("intersect", col("__a"), col("__b")).as("n_both"),
          Sketches.thetaSetEstimate("union", col("__a"), col("__b")).as("n_either"),
          Sketches.thetaSetEstimate("diff", col("__a"), col("__b")).as("n_click_only"))
    }),

    // Mergeable sketch TABLE rollup: per-(event_type, day) HLL sketches
    // union up to per-type distinct users without rescanning events —
    // the incremental distinct-count state pattern (see operators/
    // Sketches). Verified like c8b: the estimate must sit within 5% of
    // exact (lgK=12 ⇒ rse ≈ 1.6%), and the bucket count is exact.
    "c8c_sketch_union" -> ((s, dir) => {
      import graft.operators.Sketches
      val ev = Tables.events(s, dir)
      val daily = Sketches.sketchTable(ev,
        Seq(col("event_type"), to_date(col("ts")).as("day")), col("user_id"))
      val rolled = Sketches.unionEstimate(daily, Seq(col("event_type")))
      val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n_exact"))
      rolled.join(exact, "event_type")
        .select(col("event_type"), col("n_buckets"), col("n_exact"),
          (abs(col("n_estimate") - col("n_exact")).cast("double") / col("n_exact") <= 0.05)
            .as("within_bound"))
        .orderBy("event_type")
    }),

    // Johnson–Lindenstrauss random projection 64 → 16 dims: the cheap
    // dimensionality cut before ANN/clustering; 16 fused dot products
    // in the scan, matrix regenerated from indices on any engine.
    "d36_random_projection" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(graft.vectors.VectorOps.randomProject(
            graft.vectors.VectorOps.toDouble(col("embedding")), dims = 64, outDim = 16)))
        .select(col("vec_id"), col("pos").cast("long").as("j"),
          round(col("col"), 4).as("val"))
        .orderBy("vec_id", "j")
    }),

    // Synthetic unipartite graph over the PART key space (the
    // supplier↔part bipartite graph c23 ranks has no triangles by
    // construction): edge (l_partkey, 1 + l_orderkey mod max_partkey)
    // over low-quantity lineitems — the part domain keeps average
    // degree ~6 (a realistically sparse link graph; vertices over the
    // 20× smaller supplier domain make it near-complete and wedge
    // counting quadratic). The scalar max stages as a broadcast cross
    // join so the derivation stays plan-side.
    "c31_triangles" -> ((s, dir) => {
      val maxP = Tables.part(s, dir).agg(max(col("p_partkey")).as("__maxp"))
      val edges = Tables.lineitem(s, dir)
        .filter(col("l_quantity") <= 10)
        .crossJoin(broadcast(maxP))
        .select(col("l_partkey").as("src"),
          (lit(1) + col("l_orderkey") % col("__maxp")).as("dst"))
      graft.graph.Triangles.triangleStats(edges, "src", "dst")
    }),

    "c23_pagerank" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir).select(
        concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      graft.graph.PageRank.pageRank(edges, damping = 0.85, iters = 5)
        .orderBy("vertex")
    }),

    // Multi-source BFS radius over the c31 synthetic part-space graph:
    // per-hop frontier sizes + vertex-sum checksum, so every round's
    // anti-join and the min-distance semantics are oracle-checked
    // against DuckDB's recursive CTE (UNION recursion = visited-set
    // BFS, capped at the same 3 hops).
    "c35_bfs" -> ((s, dir) => {
      val maxP = Tables.part(s, dir).agg(max(col("p_partkey")).as("__maxp"))
      val edges = Tables.lineitem(s, dir)
        .filter(col("l_quantity") <= 10)
        .crossJoin(broadcast(maxP))
        .select(col("l_partkey").as("src"),
          (lit(1) + col("l_orderkey") % col("__maxp")).as("dst"))
      val seeds = s.range(1, 4).select(col("id").as("v"))
      graft.graph.Bfs.hopDistances(edges, seeds, maxHops = 3)
        .groupBy("dist")
        .agg(count(lit(1)).as("n_vertices"), sum("vertex").as("vertex_sum"))
        .orderBy("dist")
    }),

    // HyperBall neighborhood function on the supplier-part subgraph:
    // HLL ball per vertex, |E|-scale merge rounds. The exact pair-BFS
    // runs alongside at this scale to pin the estimate in-bound (the
    // c8b exact-mode discipline); the oracle owns the exact counts.
    // Weighted PageRank over the c63 projection: an edge seen 40× votes
    // 40× — supplier centrality in the shared-parts graph.
    "c64_weighted_pagerank" -> ((s, dir) => {
      val e = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      val proj = graft.graph.Projection.bipartiteProject(e, minShared = 3,
        maxRightDegree = 25)
      val edges = proj.select(col("a").as("src"), col("b").as("dst"),
          col("shared").as("weight"))
        .unionAll(proj.select(col("b").as("src"), col("a").as("dst"),
          col("shared").as("weight")))
      graft.graph.PageRank.weightedPageRank(edges, damping = 0.85, iters = 4)
        .orderBy("vertex")
    }),

    // Bipartite projection: suppliers connected by shared parts, hub
    // parts (degree > 25) dropped whole before pairing, ≥3 shared —
    // the co-purchase graph build with normalized weights.
    "c63_bipartite" -> ((s, dir) => {
      val e = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      graft.graph.Projection.bipartiteProject(e, minShared = 3,
          maxRightDegree = 25)
        .select(col("a"), col("b"), col("shared"),
          round(col("overlap"), 6).as("overlap"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("a", "b")
    }),

    // Label-propagation communities on the sparse supplier-part graph:
    // 4 deterministic voting rounds (max count, min label) — dense
    // substructure collapses to shared labels.
    // k-core decomposition by distributed peeling (C56), promoted from
    // spec-only to the oracle standard: a SPARSER supplier-part graph
    // than the c23/c62 one (l_partkey % 7 over a tenth of the orders)
    // so the peel runs a real multi-round fixpoint (3 rounds to
    // converge at sf0.01) instead of terminating immediately; k = 3
    // leaves a non-trivial 3-core. The oracle iterates the same peel
    // as generated SQL rounds (c62's technique) past convergence —
    // extra rounds are no-ops at the fixpoint, so the round counts
    // need not match, only the fixpoint itself.
    "c56_kcore" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .filter(pmod(col("l_partkey"), lit(7)) === 0 &&
          pmod(col("l_orderkey"), lit(10)) === 0)
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      graft.graph.KCore.kCore(edges, col("src"), col("dst"), k = 3)
        .orderBy("v")
    }),

    "c62_lpa" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .filter(pmod(col("l_partkey"), lit(100)) === 0)
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      graft.graph.Communities.labelPropagation(edges, iters = 4)
        .orderBy("vertex")
    }),

    // Harmonic centrality from the same HyperBall recurrence — the
    // Common Crawl host-ranking signal; estimates checked in-plan
    // against the exact pair-BFS values (the c60/c8b discipline).
    "c61_harmonic" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .filter(pmod(col("l_partkey"), lit(100)) === 0)
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      val est = graft.graph.HyperBall.harmonicCentrality(edges, maxT = 4)
      val exact = graft.graph.HyperBall.exactHarmonicCentrality(edges, maxT = 4)
      est.join(exact, "vertex")
        .select(col("vertex"), round(col("harmonic"), 6).as("harmonic"),
          (abs(col("harmonic_est") - col("harmonic")) / col("harmonic") <= 0.1)
            .as("within_bound"))
        .orderBy("vertex")
    }),

    "c60_hyperball" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .filter(pmod(col("l_partkey"), lit(100)) === 0)
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      val est = graft.graph.HyperBall.neighborhoodFunction(edges, maxT = 4)
      val exact = graft.graph.HyperBall.exactNeighborhoodFunction(edges, maxT = 4)
        .withColumnRenamed("n_pairs_est", "__exact")
      est.join(exact, "t")
        .select(col("t"), col("__exact").cast("long").as("n_pairs"),
          (abs(col("n_pairs_est") - col("__exact")) / col("__exact") <= 0.05)
            .as("within_bound"))
        .orderBy("t")
    }),

    // Sketch-scale join forecast (C42's triage sibling): theta-sketch
    // key estimates + the uniformity pairs estimate, checked IN-PLAN
    // against the exact instruments — the oracle recomputes the exact
    // values and the bound booleans must come back true.
    "c50_join_sketch" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val o = Tables.orders(s, dir)
      val f = graft.operators.JoinPreflight.sketchForecast(
        e, col("user_id"), o, col("o_custkey"))
      val exact = graft.operators.JoinPreflight.summary(
          e, col("user_id"), o, col("o_custkey"))
        .select(col("est_rows").as("exact_pairs"), col("n_matched_keys"))
      val kl = e.filter(col("user_id").isNotNull)
        .agg(countDistinct(col("user_id")).as("keys_left"))
      val kr = o.agg(countDistinct(col("o_custkey")).as("keys_right"))
      f.crossJoin(broadcast(exact)).crossJoin(broadcast(kl)).crossJoin(broadcast(kr))
        .select(
          col("n_left"), col("n_right"), col("keys_left"), col("keys_right"),
          col("n_matched_keys"), col("exact_pairs"),
          (abs(col("keys_left_est") - col("keys_left")) <= col("keys_left") * 0.05)
            .as("kl_in_bound"),
          (abs(col("keys_right_est") - col("keys_right")) <= col("keys_right") * 0.05)
            .as("kr_in_bound"),
          // intersection RSE scales with the UNION size (theta-sketch
          // property), so the bound is union-relative, not overlap-relative
          (abs(col("keys_match_est") - col("n_matched_keys")) <=
            (col("keys_left") + col("keys_right")) * 0.05).as("km_in_bound"),
          (col("est_pairs") <= col("exact_pairs") * 2 &&
            col("exact_pairs") <= col("est_pairs") * 2).as("pairs_in_factor2"))
    }),

    // Hierarchy flattening by pointer doubling: a synthetic div-10
    // forest over the customer keys (0-9 roots, ~log10 deep) resolves
    // every node's root and depth in O(log depth) equi-join rounds —
    // Spark's answer to the recursive CTE it does not have.
    "c45_hierarchy" -> ((s, dir) => {
      val rel = Tables.customer(s, dir).select(col("c_custkey").as("n"),
        when(col("c_custkey") < 10, lit(null).cast("long"))
          .otherwise(expr("c_custkey div 10")).as("p"))
      graft.graph.Hierarchy.flatten(rel, col("n"), col("p"))
        .groupBy("depth")
        .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("node_sum"),
          countDistinct(col("root")).as("n_roots"))
        .orderBy("depth")
    }),

    // Hierarchical subtree rollup over the same div-10 customer forest:
    // every node's subtree headcount + balance via the squared closure,
    // summarized per depth against a recursive-CTE oracle.
    "c51_subtree_agg" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).select(col("c_custkey").as("n"),
        when(col("c_custkey") < 10, lit(null).cast("long"))
          .otherwise(expr("c_custkey div 10")).as("p"),
        col("c_acctbal"))
      val sub = graft.graph.Hierarchy.subtreeAgg(cust, col("n"), col("p"), col("c_acctbal"))
      val depths = graft.graph.Hierarchy.flatten(cust, col("n"), col("p"))
        .select(col("node"), col("depth"))
      sub.join(depths, "node")
        .groupBy("depth")
        .agg(count(lit(1)).as("n_nodes"), sum(col("n_subtree")).as("subtree_rows"),
          round(sum(col("subtree_sum")), 2).as("subtree_bal"))
        .orderBy("depth")
    }),

    // 2D Pareto frontier: parts no other part beats on BOTH size and
    // price — per-x reduce, exclusive running max sweep (distributed),
    // frontier semi-joined back; equal maximal points all survive.
    "c44_skyline" -> ((s, dir) => {
      graft.operators.Ranking.skyline2D(Tables.part(s, dir),
          col("p_size"), col("p_retailprice"))
        .select(col("p_partkey"), col("p_size"),
          round(col("p_retailprice"), 4).as("retail"))
        .orderBy("p_partkey")
    }),

    // C8g promoted: the mergeable Bloom MEMBERSHIP sketch through the
    // gate. Per-(lang, slice) filters are built where the member rows
    // (even doc_ids) live (bloomAgg), unioned per lang (bloomUnionAgg
    // — the distributed merge is the graded machinery), and every doc
    // of the lang is probed against its lang's filter. Two guarantees
    // ride the rows: member_hits ≡ n_members (a Bloom filter has NO
    // false negatives, so the oracle emits the exact member count in
    // that column) and non-member FPs within max(8, 3% of non-member
    // probes) — ~3× the 1% design fpp, the c40/c8b bound-pin
    // technique. Filters are sized from one bounded member count so
    // the fpp design point holds at every sf, not just the gate's.
    "c8g_bloom_members" -> ((s, dir) => {
      import graft.expressions.BloomSketch
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val members = docs.filter(col("doc_id") % 2 === 0)
      val expected = math.max(64L, members.count())
      val perLang = members
        .groupBy(col("lang"), pmod(col("doc_id"), lit(4L)).as("__slice"))
        .agg(BloomSketch.bloomAgg(col("doc_id"), expected, 0.01).as("bf"))
        .groupBy("lang")
        .agg(BloomSketch.bloomUnionAgg(col("bf"), expected, 0.01).as("bf"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("bf"))
      perLang.sortBy(_._1).map { case (lang, bytes) =>
        docs.filter(col("lang") === lang)
          .withColumn("__hit", BloomSketch.mightContain(bytes, col("doc_id")))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_probes"),
            sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_members"),
            sum(when(col("doc_id") % 2 === 0 && col("__hit"), 1L)
              .otherwise(0L)).as("member_hits"),
            sum(when(col("doc_id") % 2 =!= 0 && col("__hit"), 1L)
              .otherwise(0L)).as("__fps"))
      }.reduce(_ unionAll _)
        .select(col("lang"), col("n_probes"), col("n_members"), col("member_hits"),
          (col("__fps") <= greatest(lit(8L),
            ceil((col("n_probes") - col("n_members")) * lit(0.03)).cast("long")))
            .as("fp_within_bound"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // Identical derivation and identical forward-counting orientation:
    // row-value (degree, id) comparisons mirror the Spark struct ranks.
    "c31_triangles" ->
      """WITH raw AS (SELECT l_partkey AS s,
        |    1 + (l_orderkey % (SELECT max(p_partkey) FROM part)) AS t
        |  FROM lineitem WHERE l_quantity <= 10),
        |und AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM raw WHERE s <> t),
        |deg AS (SELECT v, count(*) AS d
        |        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY 1),
        |o AS (SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
        |             CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS w,
        |             CASE WHEN (da.d, a) < (db.d, b) THEN db.d ELSE da.d END AS dw
        |      FROM und JOIN deg da ON da.v = a JOIN deg db ON db.v = b),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM o x JOIN o y ON x.u = y.u AND (x.dw, x.w) < (y.dw, y.w)
        |        JOIN o z ON z.u = x.w AND z.w = y.w)
        |SELECT (SELECT count(*) FROM deg) AS n_vertices,
        |       (SELECT count(*) FROM und) AS n_edges,
        |       (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
        |       (SELECT n_triangles FROM tri) AS n_triangles,
        |       round(3.0 * (SELECT n_triangles FROM tri)
        |             / (SELECT sum(d * (d - 1) / 2) FROM deg), 4) AS clustering""".stripMargin,

    "c8b_distinct_approx" ->
      """SELECT l_linestatus, count(DISTINCT l_partkey) AS n_exact,
        | TRUE AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "c8d_quantile_sketch" ->
      """SELECT l_linestatus, count(DISTINCT l_returnflag) AS n_buckets, count(*) AS n,
        | TRUE AS p50_in_bound, TRUE AS p95_in_bound
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "c8f_topk_sketch" ->
      """SELECT CAST(length(CAST(o_orderkey AS VARCHAR)) AS INT) AS digits, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY n DESC, digits LIMIT 3""".stripMargin,

    // Exact set sizes (sketches are in exact mode at this scale — see
    // the query comment).
    "c8e_theta_overlap" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0)
        |SELECT (SELECT count(*) FROM c JOIN p USING (user_id)) AS n_both,
        | (SELECT count(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM p)) AS n_either,
        | (SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p)) AS n_click_only""".stripMargin,

    // The estimate side is the sketch's own guarantee (checked as a
    // boolean envelope like c8b/c8d); the oracle owns the exact counts.
    "c8h_countmin" ->
      """SELECT user_id, count(*) AS n_exact, true AS est_in_bound
        |FROM events WHERE user_id < 5 GROUP BY 1 ORDER BY user_id""".stripMargin,

    "c8c_sketch_union" ->
      """SELECT event_type,
        | count(DISTINCT CAST(ts AS DATE)) AS n_buckets,
        | count(DISTINCT user_id) AS n_exact,
        | TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "d36_random_projection" -> {
      // the 16×64 projection matrix inlined row-wise — regenerated from
      // the same (outIdx, seed, dimIdx) splitmix derivation as the plan
      val scale = math.sqrt(3.0 / 16.0)
      val values = (for { j <- 0 until 16; d <- 0 until 64 } yield
        s"($j, $d, CAST(${graft.vectors.VectorOps.projCoef(0, j, d) * scale} AS DOUBLE))")
        .mkString(", ")
      s"""WITH m(j, d, c) AS (VALUES $values),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |x AS (SELECT vec_id, CAST(u.d AS INT) AS d, v[CAST(u.d AS INT) + 1] AS val
         |      FROM e, UNNEST(range(64)) AS u(d)),
         |p AS (SELECT vec_id, m.j, sum(x.val * m.c) AS s FROM x JOIN m ON x.d = m.d GROUP BY 1,2)
         |SELECT vec_id, CAST(j AS BIGINT) AS j, round(s, 4) AS val FROM p ORDER BY vec_id, j""".stripMargin
    },

    "c23_pagerank" -> {
      // 5 unrolled power-iteration rounds (standard SQL forbids
      // aggregates over a recursive CTE term, so the oracle generates
      // the rounds mechanically); same IEEE op order as the Spark plan
      val rounds = (1 to 5).map { i =>
        s"""dm$i AS (SELECT coalesce(sum(CASE WHEN d IS NULL THEN rank END), 0) AS m FROM r${i - 1}),
           |inc$i AS (SELECT e.dst AS v, sum(r.rank/r.d) AS s FROM r${i - 1} r JOIN e ON r.v = e.src
           |          WHERE r.d IS NOT NULL GROUP BY 1),
           |r$i AS (SELECT vd.v, vd.d,
           |        (1.0-0.85)*(1.0/nn.n) + 0.85*(coalesce(inc$i.s, 0) + dm$i.m*(1.0/nn.n)) AS rank
           |        FROM vd LEFT JOIN inc$i ON vd.v = inc$i.v, dm$i, nn)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src, 'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
         |v AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src AS v, count(*) AS d FROM e GROUP BY 1),
         |vd AS (SELECT v.v, deg.d FROM v LEFT JOIN deg USING (v)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
         |r0 AS (SELECT vd.v, vd.d, 1.0/nn.n AS rank FROM vd, nn),
         |$rounds
         |SELECT v AS vertex, round(rank, 6) AS rank FROM r5 ORDER BY vertex""".stripMargin
    },

    // Same c31 edge derivation, both directions; recursive-CTE UNION
    // dedups against all prior rows (visited-set BFS), min(d) per
    // vertex = hop distance.
    "c35_bfs" ->
      """WITH RECURSIVE raw AS (SELECT l_partkey AS s,
        |    1 + (l_orderkey % (SELECT max(p_partkey) FROM part)) AS t
        |  FROM lineitem WHERE l_quantity <= 10),
        |und AS (SELECT DISTINCT s, t
        |  FROM (SELECT s, t FROM raw UNION ALL SELECT t AS s, s AS t FROM raw)
        |  WHERE s IS NOT NULL AND t IS NOT NULL),
        |walk AS (
        |  SELECT CAST(v AS BIGINT) AS v, 0 AS d FROM (VALUES (1), (2), (3)) AS seeds(v)
        |  UNION
        |  SELECT u.t AS v, w.d + 1 AS d FROM walk w JOIN und u ON u.s = w.v WHERE w.d < 3),
        |dist AS (SELECT v, min(d) AS dist FROM walk GROUP BY v)
        |SELECT dist, count(*) AS n_vertices, CAST(sum(v) AS BIGINT) AS vertex_sum
        |FROM dist GROUP BY 1 ORDER BY dist""".stripMargin,

    // The declarative window pair the distributed form must equal.
    // Exact min-distance pairs via a depth-bounded recursive CTE; the
    // estimate column is pinned by the TRUE bound flags (c8b style).
    // Same projection chain, same weight-proportional rounds with the
    // dangling mirror (zero here — symmetric edges), c23 pattern.
    "c64_weighted_pagerank" -> {
      val rounds = (1 to 4).map { i =>
        s"""dm$i AS (SELECT coalesce(sum(CASE WHEN hasout IS NULL THEN rank END), 0) AS m FROM r${i - 1}),
           |fl$i AS (SELECT tr.dst AS v, sum(r.rank * tr.p) AS f
           |  FROM r${i - 1} r JOIN tr ON r.v = tr.src GROUP BY 1),
           |r$i AS (SELECT vh.v, vh.hasout,
           |    0.15 * (1.0 / nn.n) + 0.85 * (coalesce(fl$i.f, 0) + dm$i.m * (1.0 / nn.n)) AS rank
           |  FROM vh LEFT JOIN fl$i ON vh.v = fl$i.v, dm$i, nn)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
         |rd AS (SELECT p FROM e0 GROUP BY p HAVING count(*) <= 25),
         |k AS (SELECT e0.s, e0.p FROM e0 JOIN rd USING (p)),
         |pr AS (SELECT a.s AS a, b.s AS b, count(*) AS w
         |  FROM k a JOIN k b ON a.p = b.p AND a.s < b.s
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |ed AS (SELECT a AS src, b AS dst, CAST(w AS DOUBLE) AS w FROM pr
         |  UNION ALL SELECT b, a, CAST(w AS DOUBLE) FROM pr),
         |e AS (SELECT src, dst, sum(w) AS w FROM ed GROUP BY 1, 2),
         |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
         |tr AS (SELECT e.src, e.dst, e.w / ow.ow AS p FROM e JOIN ow USING (src)),
         |v AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |vh AS (SELECT v.v, ho.hasout FROM v LEFT JOIN
         |  (SELECT DISTINCT src AS v, true AS hasout FROM e) ho USING (v)),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vh),
         |r0 AS (SELECT v, hasout, 1.0 / nn.n AS rank FROM vh, nn),
         |$rounds
         |SELECT v AS vertex, round(rank, 6) AS rank FROM r4 ORDER BY vertex""".stripMargin
    },

    // Same distinct edges, hub cap, capped-degree weights, and pair
    // derivation.
    "c63_bipartite" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |rd AS (SELECT p FROM e GROUP BY p HAVING count(*) <= 25),
        |k AS (SELECT e.s, e.p FROM e JOIN rd USING (p)),
        |ld AS (SELECT s, count(*) AS d FROM k GROUP BY 1),
        |pr AS (SELECT a.s AS a, b.s AS b, count(*) AS shared
        |  FROM k a JOIN k b ON a.p = b.p AND a.s < b.s
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pr.a, pr.b, CAST(shared AS BIGINT) AS shared,
        | round(shared * 1.0 / least(x.d, y.d), 6) AS overlap,
        | round(shared * 1.0 / sqrt(x.d * y.d), 6) AS cosine
        |FROM pr JOIN ld x ON pr.a = x.s JOIN ld y ON pr.b = y.s
        |ORDER BY a, b""".stripMargin,

    // Same symmetric graph, same deterministic (count desc, label asc)
    // vote, 4 mechanically-unrolled synchronous rounds.
    // 8 generated peel rounds (3 suffice at sf0.01; the peel is
    // monotone, so post-fixpoint rounds are identities). Final degrees
    // are measured INSIDE the converged core, k-filtered like the
    // library's vacuous-by-fixpoint contract filter. The `chk` CTE is
    // a convergence tripwire: on a dataset whose peel depth exceeds
    // the unrolled budget (library iterates to fixpoint, maxRounds =
    // 100) the oracle raises a NAMED error instead of surfacing as a
    // bare hash mismatch that reads like a library bug.
    "c56_kcore" -> {
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
      // reference, so 8 rounds x 3 refs re-expand the base parquet
      // scan enough times to exhaust the process's file descriptors.
      val rounds = (1 to 8).map { i =>
        s"""d$i AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
           |   SELECT a AS v FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
           |e$i AS MATERIALIZED (SELECT e${i - 1}.a, e${i - 1}.b FROM e${i - 1}
           |  JOIN d$i da ON da.v = e${i - 1}.a JOIN d$i db ON db.v = e${i - 1}.b
           |  WHERE da.deg >= 3 AND db.deg >= 3)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (SELECT DISTINCT 's' || l_suppkey AS a0, 'p' || l_partkey AS b0
         |  FROM lineitem WHERE l_partkey % 7 = 0 AND l_orderkey % 10 = 0),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(a0, b0) AS a, greatest(a0, b0) AS b
         |  FROM raw WHERE a0 <> b0),
         |$rounds,
         |chk AS MATERIALIZED (SELECT CASE WHEN (SELECT count(*) FROM e7) = (SELECT count(*) FROM e8)
         |  THEN TRUE ELSE error('c56 oracle: peel not converged within 8 rounds - '
         |    || 'widen the unrolled round budget before trusting the compare') END AS ok)
         |SELECT v, CAST(count(*) AS BIGINT) AS degree FROM (
         |  SELECT a AS v FROM e8 UNION ALL SELECT b FROM e8) CROSS JOIN chk GROUP BY 1
         |HAVING count(*) >= 3 ORDER BY v""".stripMargin
    },

    "c62_lpa" -> {
      val rounds = (1 to 4).map { i =>
        s"""vt$i AS (SELECT e.dst AS v, l${i - 1}.label, count(*) AS c
           |  FROM l${i - 1} JOIN e ON l${i - 1}.v = e.src GROUP BY 1, 2),
           |pk$i AS (SELECT v, label FROM (SELECT v, label,
           |    row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn FROM vt$i) t
           |  WHERE rn = 1),
           |l$i AS (SELECT l${i - 1}.v, coalesce(pk$i.label, l${i - 1}.label) AS label
           |  FROM l${i - 1} LEFT JOIN pk$i USING (v))""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
         |  FROM lineitem WHERE l_partkey % 100 = 0),
         |e AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
         |n AS (SELECT DISTINCT src AS v FROM e),
         |l0 AS (SELECT v, v AS label FROM n),
         |$rounds
         |SELECT v AS vertex, label FROM l4 ORDER BY vertex""".stripMargin
    },

    // Oracle owns the exact per-vertex harmonic sums (≤4 hops); the
    // estimate's 10% envelope is the boolean the compare checks.
    "c61_harmonic" ->
      """WITH RECURSIVE
        |raw AS (SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
        |  FROM lineitem WHERE l_partkey % 100 = 0),
        |ed AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
        |n AS (SELECT DISTINCT src AS v FROM ed),
        |p AS (SELECT v, v AS u, 0 AS t FROM n
        |  UNION
        |  SELECT p.v, ed.dst, p.t + 1 FROM p JOIN ed ON ed.src = p.u
        |  WHERE p.t < 4),
        |m AS (SELECT v, u, min(t) AS d FROM p GROUP BY 1, 2)
        |SELECT v AS vertex, round(sum(CASE WHEN d > 0 THEN 1.0 / d END), 6) AS harmonic,
        | TRUE AS within_bound
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "c60_hyperball" ->
      """WITH RECURSIVE
        |raw AS (SELECT DISTINCT 's' || l_suppkey AS a, 'p' || l_partkey AS b
        |  FROM lineitem WHERE l_partkey % 100 = 0),
        |ed AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
        |n AS (SELECT DISTINCT src AS v FROM ed),
        |p AS (SELECT v, v AS u, 0 AS t FROM n
        |  UNION
        |  SELECT p.v, ed.dst, p.t + 1 FROM p JOIN ed ON ed.src = p.u
        |  WHERE p.t < 4),
        |m AS (SELECT v, u, min(t) AS d FROM p GROUP BY 1, 2),
        |nf AS (SELECT r.t, (SELECT count(*) FROM m WHERE m.d <= r.t) AS np
        |  FROM UNNEST(range(0, 5)) AS r(t))
        |SELECT CAST(t AS INT) AS t, CAST(np AS BIGINT) AS n_pairs,
        | TRUE AS within_bound
        |FROM nf ORDER BY t""".stripMargin,

    // Exact counts recomputed; every sketch bound must hold (theta is
    // deterministic: exact below 2^12 distinct, ~1.6% RSE above).
    "c50_join_sketch" ->
      """WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |o AS (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL),
        |m AS (SELECT count(*) AS n_matched_keys FROM
        |   (SELECT DISTINCT user_id FROM e) x JOIN
        |   (SELECT DISTINCT o_custkey FROM o) y ON user_id = o_custkey),
        |p AS (SELECT CAST(sum(ne * no) AS BIGINT) AS exact_pairs FROM
        |   (SELECT user_id AS k, count(*) AS ne FROM e GROUP BY 1) a JOIN
        |   (SELECT o_custkey AS k, count(*) AS no FROM o GROUP BY 1) b USING (k))
        |SELECT (SELECT count(*) FROM e) AS n_left,
        |  (SELECT count(*) FROM o) AS n_right,
        |  (SELECT count(DISTINCT user_id) FROM e) AS keys_left,
        |  (SELECT count(DISTINCT o_custkey) FROM o) AS keys_right,
        |  m.n_matched_keys, p.exact_pairs,
        |  TRUE AS kl_in_bound, TRUE AS kr_in_bound,
        |  TRUE AS km_in_bound, TRUE AS pairs_in_factor2
        |FROM m, p""".stripMargin,

    // The recursive CTE the doubling replaces, same parent rule.
    "c45_hierarchy" ->
      """WITH RECURSIVE h(node, root, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, h.root, h.depth + 1
        |  FROM customer c JOIN h ON c.c_custkey // 10 = h.node
        |  WHERE c.c_custkey >= 10)
        |SELECT depth, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS node_sum,
        | count(DISTINCT root) AS n_roots
        |FROM h GROUP BY 1 ORDER BY depth""".stripMargin,

    // The ancestor closure (self included) by recursive walk, subtree
    // sums grouped per ancestor, summarized at each depth.
    "c51_subtree_agg" ->
      """WITH RECURSIVE anc(node, anc) AS (
        |  SELECT c_custkey, c_custkey FROM customer
        |  UNION ALL
        |  SELECT a.node, c.c_custkey // 10
        |  FROM anc a JOIN customer c ON a.anc = c.c_custkey
        |  WHERE c.c_custkey >= 10),
        |sub AS (SELECT a.anc AS node, count(*) AS n_subtree,
        |    sum(c2.c_acctbal) AS s
        |  FROM anc a JOIN customer c2 ON a.node = c2.c_custkey GROUP BY 1),
        |h(node, depth) AS (
        |  SELECT c_custkey, 0 FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, h.depth + 1
        |  FROM customer c JOIN h ON c.c_custkey // 10 = h.node
        |  WHERE c.c_custkey >= 10)
        |SELECT h.depth, count(*) AS n_nodes,
        | CAST(sum(sub.n_subtree) AS BIGINT) AS subtree_rows,
        | round(sum(sub.s), 2) AS subtree_bal
        |FROM sub JOIN h ON sub.node = h.node GROUP BY 1 ORDER BY depth""".stripMargin,

    // The declarative dominance definition the sweep implements.
    "c44_skyline" ->
      """SELECT p.p_partkey, p.p_size, round(p.p_retailprice, 4) AS retail
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_size >= p.p_size AND q.p_retailprice >= p.p_retailprice
        |    AND (q.p_size > p.p_size OR q.p_retailprice > p.p_retailprice))
        |ORDER BY p.p_partkey""".stripMargin,

    // member_hits ≡ n_members is the no-false-negative guarantee;
    // fp_within_bound is the engine-side pinned bound (the FP count
    // itself is a property of Spark's filter hashes and is asserted,
    // not mirrored — the c40 discipline).
    "c8g_bloom_members" ->
      """SELECT lang, count(*) AS n_probes,
        | CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
        | CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS member_hits,
        | TRUE AS fp_within_bound
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
