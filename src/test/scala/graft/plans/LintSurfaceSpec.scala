package graft.plans

import graft.SparkSpec

/** The whole-surface lint fence: every driver query is linted and the
  * findings must match the DOCUMENTED benign allowlist EXACTLY — a new
  * global window, cartesian, nested-loop, single-partition exchange,
  * or unpruned wide scan anywhere in the 146-query surface fails this
  * one named test with the offending query and rule. The allowlist is
  * the complete, justified inventory of intentional exceptions:
  *
  *  - GLOBAL_WINDOW entries are all BOUNDED-row windows (lift/growth
  *    rollups over ≤ buckets/calendar rows, equi-depth cumsum over
  *    ≤ cells, IVF rank windows over ≤ nLists, mix-target and shard
  *    head windows over stratum/head counts).
  *  - NESTED_LOOP entries are DELIBERATE bounded sweeps: the
  *    brute-force cosine baselines (d5, and d64 which composes d5),
  *    IVF centroid assignment (corpus × nLists by design), drift's
  *    slice×bin grid, hard-negative exact scoring, cohesion's
  *    L-centroid QA scoring.
  *  - a10's UNPRUNED_WIDE_SCAN: the Bronze→Silver pipeline genuinely
  *    consumes every column of the raw table.
  */
class LintSurfaceSpec extends SparkSpec {

  private val allow: Map[String, Map[String, Int]] = Map(
    "a10_silver_pipeline" -> Map("UNPRUNED_WIDE_SCAN" -> 1),
    "b11_decile_lift" -> Map("GLOBAL_WINDOW" -> 1),
    "b14_growth" -> Map("GLOBAL_WINDOW" -> 1),
    "c15b_equidepth" -> Map("GLOBAL_WINDOW" -> 2),
    // runningAgg's offset window runs over ≤ numShufflePartitions slice
    // totals — the liftTable bounded class
    "b19_abc" -> Map("GLOBAL_WINDOW" -> 1),
    "c43_running_total" -> Map("GLOBAL_WINDOW" -> 1),
    "c44_skyline" -> Map("GLOBAL_WINDOW" -> 1),
    "c54_weighted_quantiles" -> Map("GLOBAL_WINDOW" -> 1),
    "b22_ks_test" -> Map("GLOBAL_WINDOW" -> 1),
    // same runningSums rank-offset pass as b22: the one window runs
    // over the SLICE-TOTALS table (numSlices rows), not corpus data
    "b28_mann_whitney" -> Map("GLOBAL_WINDOW" -> 1),
    // bhFdr's q-value suffix-min is a runningAgg whose offset window
    // runs over the slice-totals table (≤ numShufflePartitions rows) —
    // the b22/b28 bounded class; the battery itself is group-scale
    "b31_fdr_drift" -> Map("GLOBAL_WINDOW" -> 1),
    // the same runningSums rank-offset window (slice totals) — once for
    // the pooled ranks, and once PER RANKED COLUMN for Spearman
    "b35_kruskal" -> Map("GLOBAL_WINDOW" -> 1),
    "b36_spearman" -> Map("GLOBAL_WINDOW" -> 3),
    "d84_heaps_fit" -> Map("GLOBAL_WINDOW" -> 1),
    // the basket-count scalar rides a filtered CHECKPOINT scan, whose
    // one-row-ness the linter cannot prove from the plan (unlike a
    // grouping-free aggregate); the cross is 1 × |pairs| by contract
    "b21_precedence" -> Map("NESTED_LOOP" -> 1),
    "d23_ann_ivf" -> Map("NESTED_LOOP" -> 2, "GLOBAL_WINDOW" -> 2),
    "d23b_ann_ivf_hier" -> Map("NESTED_LOOP" -> 2),
    // d23's two bounded sweeps (corpus × 8 centroids assignment,
    // queries × 8 probe ranking) + d23's two quantizer-size windows
    // (centroid list ids ≤ nLists rows, PQ codebook seed ranks ≤
    // kCodes rows — the d78 seeding pass)
    "d79_ivfpq" -> Map("NESTED_LOOP" -> 2, "GLOBAL_WINDOW" -> 2),
    // d79's plan + the exact-L2 truth sweep: broadcast 10-query side ×
    // corpus scan — the d5 bounded-sweep class
    "d79b_ivfpq_recall" -> Map("NESTED_LOOP" -> 3, "GLOBAL_WINDOW" -> 2),
    "d27_rebalance_mix" -> Map("GLOBAL_WINDOW" -> 1),
    "d50_zipf_fit" -> Map("GLOBAL_WINDOW" -> 1),
    "d52_quality_drift" -> Map("NESTED_LOOP" -> 1),
    "d55_temperature_mix" -> Map("GLOBAL_WINDOW" -> 1),
    "d58_hard_negatives" -> Map("NESTED_LOOP" -> 1),
    "d5_ann_bruteforce" -> Map("NESTED_LOOP" -> 1),
    // broadcast eval set × corpus scan — the d58 bounded-sweep class
    "d81_semantic_contam" -> Map("NESTED_LOOP" -> 1),
    // broadcast group-B × group-A candidate scores (IVF is the scale
    // path) — the d5 bounded-sweep class
    "d82_margin_pairs" -> Map("NESTED_LOOP" -> 1),
    "d60_balanced_shards" -> Map("GLOBAL_WINDOW" -> 1),
    // isotonic minimax fit: the j≤k pair join and both cumulative
    // windows run over the BINNED table (≤ nBins ≤ 4096 rows by
    // construction) — the c15b bounded-grid class, not corpus data
    "d89_isotonic" -> Map("NESTED_LOOP" -> 1, "GLOBAL_WINDOW" -> 2),
    "d64_hybrid_rrf" -> Map("NESTED_LOOP" -> 1),
    // the 1-row broadcast query vector × corpus scan — the d5 bounded-
    // sweep class (the cross IS the graded surface: every embedding
    // dotted against one pinned vector through the native expression)
    "d18_native_dot" -> Map("NESTED_LOOP" -> 1),
    // the lag window runs over the 8-row per-file z-range stats table
    // (the liftTable bounded class); the layout_ok flag cross is a
    // grouping-free aggregate whose one-row-ness the linter PROVES, so
    // it raises no NESTED_LOOP finding
    "c17_zorder_layout" -> Map("GLOBAL_WINDOW" -> 1),
    "d65_label_cohesion" -> Map("NESTED_LOOP" -> 1),
    // the E14 rollup genuinely consumes EVERY column of the state
    // table it reads (n_rows + cnt/sum/min/max per value col) — the
    // a10 whole-table class, over key-cardinality state rows
    "e14_agg_state" -> Map("UNPRUNED_WIDE_SCAN" -> 1),
    // qualityDriftFromCells' slice×bin grid cross — the d52 bounded
    // class (|slices| × nBins rows by construction)
    "e15_drift_cells" -> Map("NESTED_LOOP" -> 1),
    // vocabGrowthCurve's cumulative runs over the bounded EPOCH axis
    // (one row per micro-batch — the liftTable benign window class)
    "e32_vocab_growth" -> Map("GLOBAL_WINDOW" -> 1),
    // skylineFrom re-runs c44's sort + running-max over the PERSISTED
    // per-epoch skyline candidates (|skyline| × epochs rows — already
    // dominance-pruned per batch), the c44 bounded-window class
    "e40_skyline_state" -> Map("GLOBAL_WINDOW" -> 1))

  test("every driver query lints to exactly the documented benign allowlist") {
    val dir = "/root/testdata/sf0.001"
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val got = PlanLint.lint(fn(spark, dir))
          .groupBy(_.rule).view.mapValues(_.size).toMap
        val want = allow.getOrElse(name, Map.empty)
        if (got == want) None else Some(s"$name: got $got, allowed $want")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
