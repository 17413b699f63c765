package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-column statistical profiling aggregates — the numeric-column
  * relationship half of the profiling surface (C18 checks values,
  * D40/D52 profile distributions; this profiles CO-movement: which
  * measures rise together, per segment).
  */
object Stats {

  /** EXACT two-sample Kolmogorov–Smirnov test: the maximum gap between
    * the two empirical CDFs, with the classic asymptotic two-sided
    * p-value — the distribution-free "did this metric's SHAPE change"
    * test that PSI/χ² binning (D52) approximates: no bins, no binning
    * bias, sensitive to location, scale, and shape shifts alike.
    *
    * Distributed exactly at any size: each side reduces to per-distinct-
    * value counts (partial-aggregating — ties collapse map-side), a
    * full-outer merge aligns the supports, and BOTH cumulative counts
    * come from [[graft.operators.Ranking.runningAgg]]'s range-sliced
    * prefix (never a single-partition window over the value axis); the
    * D-statistic is then a one-row max over |F̂ₐ − F̂ᵦ| evaluated at
    * every distinct value — exactly the points where the gap can attain
    * its max, CDFs being right-continuous step functions. The p-value
    * uses the Kolmogorov series 2·Σ(−1)ᵏ⁻¹e^(−2k²λ²) (100 terms —
    * overkill: terms decay like e^(−2k²)) with the Numerical-Recipes
    * small-sample correction λ = (√nₑ + 0.12 + 0.11/√nₑ)·D,
    * nₑ = nₐnᵦ/(nₐ+nᵦ), summed by a SEQUENTIAL higher-order fold so
    * the fp result is deterministic and engine-mirrorable. Null values
    * are excluded (they have no place on a CDF); an empty side yields
    * D = null (no distribution to compare — ANSI-null, not an error). */
  def ksTest(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    import graft.operators.Ranking
    def sideCounts(df: DataFrame, n: String) =
      df.filter(value.isNotNull).groupBy(value.as("__ks_v"))
        .agg(count(lit(1)).as(n))
    val m = sideCounts(a, "__ks_na")
      .join(sideCounts(b, "__ks_nb"), Seq("__ks_v"), "full_outer")
      .select(col("__ks_v"),
        coalesce(col("__ks_na"), lit(0L)).as("__ks_na"),
        coalesce(col("__ks_nb"), lit(0L)).as("__ks_nb"))
    val cum = Ranking.runningSums(m, Seq(col("__ks_v").asc),
      Seq(col("__ks_na") -> "__ks_ca", col("__ks_nb") -> "__ks_cb"))
    val tot = m.agg(sum(col("__ks_na")).as("__ks_ta"),
      sum(col("__ks_nb")).as("__ks_tb"))
    val d = cum.crossJoin(broadcast(tot))
      .agg(max(col("__ks_ta")).as("n_a"), max(col("__ks_tb")).as("n_b"),
        // an empty side makes a 0 denominator; ANSI throws on ANY
        // divide-by-zero, so null it out — the null rides max() to a
        // null D, which the degenerate guard below formalizes
        max(abs(col("__ks_ca").cast("double") /
            when(col("__ks_ta") === 0, lit(null)).otherwise(col("__ks_ta")) -
          col("__ks_cb").cast("double") /
            when(col("__ks_tb") === 0, lit(null)).otherwise(col("__ks_tb"))))
          .as("__ks_d"))
    val ne = col("n_a").cast("double") * col("n_b") / (col("n_a") + col("n_b"))
    val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * col("__ks_d")
    val series = aggregate(sequence(lit(1), lit(100)), lit(0.0).cast("double"),
      (acc, k) => acc +
        when(k % 2 === 1, lit(1.0)).otherwise(lit(-1.0)) *
          exp(lit(-2.0) * k.cast("double") * k.cast("double") * lam * lam))
    val degenerate = coalesce(col("n_a"), lit(0L)) === 0 ||
      coalesce(col("n_b"), lit(0L)) === 0
    d.select(col("n_a"), col("n_b"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(col("__ks_d")).as("d_stat"),
      when(degenerate, lit(null).cast("double"))
        // λ < 0.05 ⇒ Q(λ) = 1 to >10 significant digits AND the
        // truncated alternating series is not yet converged (its terms
        // decay like e^(−2k²λ²)) — the Numerical-Recipes small-λ guard
        .when(lam < 0.05, lit(1.0))
        .otherwise(least(lit(1.0), greatest(lit(0.0), lit(2.0) * series)))
        .as("p_value"))
  }

  /** The classic asymptotic two-sided KS p-value as a COLUMN, so a
    * battery of tests (one per group) evaluates it per row: Kolmogorov
    * series 2·Σ(−1)ᵏ⁻¹e^(−2k²λ²) with the Numerical-Recipes small-
    * sample correction λ = (√nₑ + 0.12 + 0.11/√nₑ)·D, nₑ = n_a·n_b/N,
    * summed by a sequential fold (deterministic, engine-mirrorable);
    * empty sides or null D propagate to null, and λ < 0.05 clamps to
    * p = 1 (the series is not yet converged there and the true value
    * is 1 to >10 digits). */
  private def ksPvalue(d: Column, na: Column, nb: Column): Column = {
    val ne = na.cast("double") * nb / (na + nb)
    val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * d
    val series = aggregate(sequence(lit(1), lit(100)), lit(0.0).cast("double"),
      (acc, k) => acc +
        when(k % 2 === 1, lit(1.0)).otherwise(lit(-1.0)) *
          exp(lit(-2.0) * k.cast("double") * k.cast("double") * lam * lam))
    when(coalesce(na, lit(0L)) === 0 || coalesce(nb, lit(0L)) === 0,
        lit(null).cast("double"))
      .when(lam < 0.05, lit(1.0))
      .otherwise(least(lit(1.0), greatest(lit(0.0), lit(2.0) * series)))
  }

  /** Per-group-vs-rest KS battery: for EVERY group, the exact
    * two-sample KS of its value distribution against the pooled rest of
    * the corpus — "which sources/slices drifted" as ONE plan instead of
    * a [[ksTest]] loop (a per-group driver loop re-scans the corpus
    * |G| times; this scans once). Feed the p-values to [[bhFdr]]: a
    * battery without multiplicity control manufactures discoveries.
    *
    * Shape: one corpus pass to (group × distinct value) cells (ties
    * collapse map-side; truncated once — five consumers would otherwise
    * re-aggregate under column pruning), the global support with its
    * cumulative through ONE distributed
    * [[graft.operators.Ranking.runningSums]] pass, then the |G|×|V|
    * GRID (each group's CDF must be evaluated at every support point —
    * where either side can jump) built by broadcasting the |G|-row
    * group table across the support; per-group cumulatives are a window
    * whose partitions are |V| rows. The grid is the cost contract:
    * |G|·|V| rows — fine for slices × a bounded support, so BIN a
    * continuous metric first (the D52 drift discipline) and keep G to
    * slice cardinality; rest-side counts derive by subtraction from the
    * global cumulative, so the rest never materializes. A group owning
    * the whole corpus has an empty rest → null D and p, not an error. */
  def ksTestGroupedVsRest(df: DataFrame, group: Column, value: Column): DataFrame = {
    import graft.operators.{Lineage, Ranking}
    val cells = Lineage.truncate(
      df.filter(group.isNotNull && value.isNotNull)
        .groupBy(group.as("__g"), value.as("__v"))
        .agg(count(lit(1)).as("__c")))
    val support = Ranking.runningSums(
      cells.groupBy("__v").agg(sum(col("__c")).as("__cv")),
      Seq(col("__v").asc), Seq(col("__cv") -> "__CV"))
    val groups = cells.groupBy("__g").agg(sum(col("__c")).as("__ng"))
    val tot = cells.agg(sum(col("__c")).as("__N"))
    val grid = support.crossJoin(broadcast(groups))
      .join(cells, Seq("__g", "__v"), "left")
      .na.fill(0L, Seq("__c"))
    val w = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = grid.withColumn("__cg", sum(col("__c")).over(w))
      .crossJoin(broadcast(tot))
      .groupBy(col("__g").as("key"))
      .agg(max(col("__ng")).as("n_group"),
        max(col("__N") - col("__ng")).as("n_rest"),
        max(abs(
          col("__cg").cast("double") / when(col("__ng") =!= 0, col("__ng")) -
            (col("__CV") - col("__cg")).cast("double") /
              when(col("__N") - col("__ng") =!= 0, col("__N") - col("__ng"))))
          .as("d_stat"))
    d.select(col("key"), col("n_group"), col("n_rest"), col("d_stat"),
      ksPvalue(col("d_stat"), col("n_group"), col("n_rest")).as("p_value"))
  }

  /** Benjamini-Hochberg FDR control over a battery of p-values — run
    * 10⁴ per-slice tests ([[ksTestGroupedVsRest]], [[ksTest]], B16,
    * D52's χ²) at α and ~500 pass by chance; BH caps the EXPECTED
    * FALSE-DISCOVERY SHARE at α instead (step-up rule: reject the
    * smallest k* p-values where k* = max k with p₍ₖ₎ ≤ α·k/m). Adds
    * `p_rank`, `q_value` (the adjusted p: min over j ≥ rank of
    * p₍ⱼ₎·m/j, capped at 1 — reject where q ≤ α at ANY later-chosen α),
    * and `rejected`.
    *
    * Distributed with no single-partition stage at any battery size:
    * the sort is [[graft.operators.Ranking.globalRank]]'s range shuffle
    * (`tieBreak` completes the total order; ties in p are
    * decision-invariant — α·k/m grows with k, so a tie group qualifies
    * or fails as a block and shares one suffix-min q), the suffix min
    * behind q is ONE descending-rank [[graft.operators.Ranking.runningAgg]]
    * pass, and k* is a one-row aggregate broadcast back. Null p-values
    * are not hypotheses and are excluded. */
  def bhFdr(df: DataFrame, p: Column, tieBreak: Seq[Column],
            alpha: Double = 0.05): DataFrame = {
    import graft.operators.{Lineage, Ranking}
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(!df.columns.exists(c => c.startsWith("__bh_") ||
      Seq("p_rank", "q_value", "rejected").contains(c)),
      "bhFdr reserves 'p_rank', 'q_value', 'rejected' and '__bh_*'; rename the input column")
    val base = df.filter(p.isNotNull).withColumn("__bh_p", p.cast("double"))
    val m = base.count()
    // rank + the BH scaling, truncated once: both the suffix-min branch
    // and the k* aggregate consume it, and column pruning would
    // otherwise re-execute the range-rank subtree per consumer
    val scaled = Lineage.truncate(
      Ranking.globalRank(base, col("__bh_p").asc +: tieBreak, "__bh_k")
        .withColumn("__bh_pm", col("__bh_p") * lit(m.toDouble) / col("__bh_k")))
    val kStar = scaled.agg(
      max(when(col("__bh_p") * m <= lit(alpha) * col("__bh_k"), col("__bh_k")))
        .as("__bh_kstar"))
    Ranking.runningAgg(scaled, Seq(col("__bh_k").desc), col("__bh_pm"),
        agg = "min", as = "__bh_q")
      .crossJoin(broadcast(kStar))
      .withColumn("p_rank", col("__bh_k"))
      .withColumn("q_value", least(lit(1.0), col("__bh_q")))
      .withColumn("rejected", coalesce(col("__bh_k") <= col("__bh_kstar"), lit(false)))
      .drop("__bh_p", "__bh_pm", "__bh_q", "__bh_k", "__bh_kstar")
  }

  /** Spearman rank correlation matrix: Pearson over AVERAGE RANKS —
    * the outlier-robust, monotonicity-not-linearity sibling of
    * [[correlationMatrix]] (a single whale row can manufacture Pearson
    * correlation out of nothing; ranks cap its leverage at one rank
    * step). Listwise deletion: rows with ANY null measure are dropped
    * first, so every pair correlates over the same row set (the
    * matrix stays positive semi-definite — pairwise deletion doesn't).
    *
    * Ranks per column come from the distinct-value machinery ([[mannWhitney]]/
    * [[kruskalWallis]] discipline): per-distinct-value counts collapse
    * ties map-side, ONE [[graft.operators.Ranking.runningSums]] pass
    * per column yields the closed-form average tie rank, and the rank
    * attaches back by a value-keyed join — p columns cost p key-hashed
    * joins of the corpus (the honest price of p independent orderings;
    * never a global-order window). The final matrix is
    * [[correlationMatrix]]'s single hash aggregate over the rank
    * columns. Constant columns have zero rank variance → null corr. */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    import graft.operators.{Lineage, Ranking}
    require(cols.size >= 2, s"spearmanMatrix needs >= 2 columns, got $cols")
    // complete rows only; truncated once — every per-column rank build
    // scans it, and pruning would re-execute the upstream per column
    val base = Lineage.truncate(
      df.select(cols.map(c => col(c).cast("double").as(c)): _*)
        .na.drop("any", cols))
    val ranked = cols.foldLeft(base) { (acc, c) =>
      val counts = base.groupBy(col(c)).agg(count(lit(1)).as("__t"))
      val rk = Ranking.runningSums(counts, Seq(col(c).asc),
          Seq(col("__t").cast("double") -> "__off"), inclusive = false)
        .select(col(c),
          (coalesce(col("__off"), lit(0.0)) + (col("__t") + 1) / lit(2.0))
            .as(s"__rk_$c"))
      acc.join(rk, Seq(c))
    }
    correlationMatrix(
      ranked.select(cols.map(c => col(s"__rk_$c").as(c)): _*),
      Seq.empty, cols)
  }

  /** Standard normal CDF Φ as a COLUMN via the Abramowitz-Stegun
    * 7.1.26 rational approximation (|ε| < 7.5e-8) — Spark has no erf
    * builtin, and a fixed polynomial + exp is deterministic and
    * engine-mirrorable where a library erf is not. */
  private[graft] def phi(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * ax)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val pdf = exp(lit(-0.5) * ax * ax) / lit(math.sqrt(2 * math.Pi))
    val upper = lit(1.0) - pdf * poly
    when(x >= 0, upper).otherwise(lit(1.0) - upper)
  }

  /** Welch's unequal-variance t-test: did the MEAN shift between two
    * samples — the parametric member of the location family
    * ([[mannWhitney]] ranks are outlier-robust; Welch answers about the
    * mean itself, which is what a cost/revenue delta IS), never pooling
    * variances (Student's equal-variance assumption silently lies when
    * group sizes and spreads differ — Welch is the safe default).
    * t = (x̄ₐ−x̄ᵦ)/√(s²ₐ/nₐ + s²ᵦ/nᵦ) with the Welch-Satterthwaite
    * degrees of freedom; `p_approx` is the large-sample normal tail
    * 2(1−Φ(|t|)) through the same [[phi]] polynomial (at corpus n the
    * t and normal tails agree to far past the 6th digit; the name says
    * approximate, both engines share the closed form).
    *
    * ONE moments aggregate per side (count/avg/var_samp — partial-
    * aggregating, a one-row cross join joins them), no shuffle beyond
    * the two aggregates. Sides with n < 2 or a zero standard error
    * yield null t/df/p, never a division error. */
  def welchTTest(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    def side(df: DataFrame, p: String) =
      df.filter(value.isNotNull).agg(
        count(value).as(s"n_$p"), avg(value).as(s"mean_$p"),
        var_samp(value).as(s"__v$p"))
    val j = side(a, "a").crossJoin(broadcast(side(b, "b")))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (va, vb) = (col("__va") / na, col("__vb") / nb)
    val se2 = va + vb
    val t = (col("mean_a") - col("mean_b")) /
      when(sqrt(se2) =!= 0, sqrt(se2))
    val dfW = se2 * se2 /
      when(va * va / (na - 1) + vb * vb / (nb - 1) =!= 0,
        va * va / (na - 1) + vb * vb / (nb - 1))
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    j.select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        when(ok, t).as("t"), when(ok, dfW).as("df"))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("t"), col("df"),
        when(col("t").isNotNull,
          lit(2.0) * (lit(1.0) - phi(abs(col("t"))))).as("p_approx"))
  }

  /** Kruskal-Wallis k-sample rank test: did ANY group's location shift —
    * the omnibus gate that runs BEFORE [[ksTestGroupedVsRest]]'s
    * per-group battery (one test, no multiplicity problem; only if it
    * fires do the per-group tests + [[bhFdr]] localize which groups).
    * Generalizes [[mannWhitney]] to k groups with the identical
    * distributed shape: per-(group × distinct value) counts collapse
    * ties map-side (truncated once — three consumers), ONE
    * [[graft.operators.Ranking.runningSums]] pass yields every distinct
    * value's average tie rank closed-form (off + (t+1)/2), per-group
    * rank sums are a partial aggregate, and the verdict is a one-row
    * reduction — never a global-order window over the corpus.
    *
    * H = 12/(N(N+1))·Σ R²_g/n_g − 3(N+1), tie-corrected
    * H' = H / (1 − Σ(t³−t)/(N³−N)); `p_approx` is the Wilson-Hilferty
    * cube-root normal approximation of the χ²(k−1) tail through [[phi]]
    * — approximate BY CONSTRUCTION (named accordingly) but identical
    * closed form in both engines. All-tied input (C = 0) and k < 2
    * yield null H'/p, never a division error. */
  def kruskalWallis(df: DataFrame, group: Column, value: Column): DataFrame = {
    import graft.operators.{Lineage, Ranking}
    val cells = Lineage.truncate(
      df.filter(group.isNotNull && value.isNotNull)
        .groupBy(group.as("__g"), value.as("__v"))
        .agg(count(lit(1)).as("__c")))
    val vals = cells.groupBy("__v").agg(sum(col("__c")).as("__t"))
    val ranks = Ranking.runningSums(vals, Seq(col("__v").asc),
        Seq(col("__t").cast("double") -> "__off"), inclusive = false)
      .select(col("__v"),
        (coalesce(col("__off"), lit(0.0)) + (col("__t") + 1) / lit(2.0)).as("__r"),
        col("__t"))
    val grp = cells.join(ranks.select("__v", "__r"), "__v")
      .groupBy("__g")
      .agg(sum(col("__c")).as("__ng"), sum(col("__c") * col("__r")).as("__rg"))
    val ties = ranks.agg(
      sum(col("__t") * col("__t") * col("__t") - col("__t")).cast("double").as("__tt"))
    val agg = grp.crossJoin(broadcast(ties)).agg(
      count(lit(1)).as("k"), sum(col("__ng")).as("n"),
      sum(col("__rg") * col("__rg") / col("__ng")).as("__s"),
      max(col("__tt")).as("__tt"))
    val n = col("n").cast("double")
    val h = lit(12.0) / (n * (n + 1)) * col("__s") - lit(3.0) * (n + 1)
    val c = lit(1.0) - col("__tt") / when(n * n * n - n =!= 0, n * n * n - n)
    val hT = h / when(c =!= 0, c)
    val dof = (col("k") - 1).cast("double")
    // Wilson-Hilferty: χ²/k is approximately normal on the cube-root scale
    val z = (pow(col("h_tie") / dof, 1.0 / 3) - (lit(1.0) - lit(2.0) / (dof * 9))) /
      sqrt(lit(2.0) / (dof * 9))
    agg
      .select(col("k"), col("n"), h.as("h"),
        when(col("k") >= 2, hT).as("h_tie"))
      .select(col("k"), col("n"), col("h"), col("h_tie"),
        when(col("k") >= 2 && col("h_tie").isNotNull,
          lit(1.0) - phi(z)).as("p_approx"))
  }

  /** Empirical-Bayes (beta-binomial) shrinkage of per-key success
    * rates — THE fix for "rank domains/sources/authors by rate" when
    * key volumes span decades: a 1/1 key must not outrank a 980/1000
    * key. The corpus itself supplies the prior (method of moments on
    * the per-key raw rates: α+β = μ(1−μ)/s² − 1, α = μ(α+β)), and each
    * key's posterior mean (y+α)/(n+α+β) shrinks small-n keys toward the
    * corpus mean while big-n keys keep their own rate — the principled
    * replacement for minimum-volume cutoffs ahead of A20-style caps or
    * D41-gate tuning per source.
    *
    * Shape: ONE corpus pass to per-key (n, y) (partial-aggregating),
    * ONE 1-row moment aggregate over the key table broadcast back, then
    * a narrow map — no window, no second scan. When the rate spread
    * exceeds what any beta prior explains (s² ≥ μ(1−μ), degenerate μ of
    * 0/1, or a single key) the prior is undefined and `shrunk` is null
    * with null α/β — explicitly inspectable, never silently unshrunk. */
  def ebShrinkRates(df: DataFrame, key: Column, success: Column): DataFrame = {
    // the key table feeds BOTH the moment aggregate and the posterior
    // map; column pruning specializes each consumer's aggregate (the
    // B21 lesson — exchange reuse does not save you), so the key-scale
    // table is truncated once: exactly one corpus scan, plan-pinned
    ebShrinkFromCounts(graft.operators.Lineage.truncate(
      df.filter(key.isNotNull && success.isNotNull)
        .groupBy(key.as("key"))
        .agg(count(lit(1)).as("n"), sum(success.cast("double")).as("y"))))
  }

  /** [[ebShrinkRates]] from an ALREADY-AGGREGATED (key, n, y) table —
    * the entry point for pre-counted state (E38's streaming rate state,
    * C25-style agg tables). Same prior, posterior, and degenerate-null
    * contract; the input is key-scale, so no truncation is forced here
    * (pass a truncated frame if it has an expensive lineage). */
  def ebShrinkFromCounts(perKeyCounts: DataFrame): DataFrame = {
    val perKey = perKeyCounts.withColumn("raw_rate", col("y") / col("n"))
    val prior = perKey.agg(
        avg(col("raw_rate")).as("__mu"), var_pop(col("raw_rate")).as("__s2"))
      .select(col("__mu"),
        when(col("__s2") > 0 && col("__mu") > 0 && col("__mu") < 1,
          col("__mu") * (lit(1.0) - col("__mu")) / col("__s2") - 1).as("__ab"))
      .select(
        when(col("__ab") > 0, col("__mu") * col("__ab")).as("prior_alpha"),
        when(col("__ab") > 0, (lit(1.0) - col("__mu")) * col("__ab")).as("prior_beta"))
    perKey.crossJoin(broadcast(prior))
      .withColumn("shrunk",
        (col("y") + col("prior_alpha")) /
          (col("n") + col("prior_alpha") + col("prior_beta")))
  }

  /** Gini concentration coefficient of a non-negative measure — THE
    * one-number inequality statistic ("top decile drives X%" as a
    * scalar; B11's lift table is its curve form). Uses the rank
    * formula over the ascending sort: G = 2·Σ rᵢxᵢ / (n·Σx) − (n+1)/n,
    * so the heavy work is ONE [[graft.operators.Ranking.globalRank]]
    * (distributed range sort, no single-partition window) plus one
    * aggregate. 0 = perfectly even, → 1 = one unit holds everything.
    * Also the corpus-curation lens: Gini over per-source token counts
    * says how concentrated a training mix is before D27/D55 rebalance.
    * `tieBreak` must complete a total order; negative values violate
    * the Gini domain and throw (ANSI-loud, not silently wrong). */
  def gini(df: DataFrame, value: Column, tieBreak: Seq[Column]): DataFrame = {
    val proj = (value.cast("double").as("__v") +:
      tieBreak.zipWithIndex.map { case (c, i) => c.as(s"__t$i") })
    val ranked = graft.operators.Ranking.globalRank(
      df.select(proj: _*),
      col("__v").asc +: tieBreak.indices.map(i => col(s"__t$i").asc), "__r")
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("total"),
        sum(col("__v") * col("__r")).as("__rx"),
        min(col("__v")).as("__min"))
      .select(col("n"), col("total"),
        when(col("__min") < 0, raise_error(lit("gini requires non-negative values")))
          .otherwise(
            lit(2.0) * col("__rx") / (col("n") * col("total")) -
              (col("n") + lit(1.0)) / col("n")).as("gini"))
  }

  /** Pairwise Pearson correlation + sample covariance for every
    * unordered pair of `cols`, per group — ALL pairs in ONE hash
    * aggregate (one shuffle on the group keys, partial aggregation
    * upstream): each pair adds two co-moment accumulators to the same
    * aggregate, not a pass over the data, so profiling p columns costs
    * O(p²) accumulator slots and exactly one scan at any data size.
    * Output is wide: `corr_<a>_<b>` / `cov_<a>_<b>` per pair, plus
    * `n`. Rounding is left to the caller (raw doubles out). */
  def correlationMatrix(df: DataFrame, groupBy: Seq[Column],
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"correlationMatrix needs >= 2 columns, got $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // corr is DERIVED (cov / sd·sd) behind a lazy zero-variance guard
    // rather than aggregated with corr(): under ANSI mode the built-in
    // corr throws DIVIDE_BY_ZERO on a constant column, where SQL
    // engines (and this operator) answer null. Same co-moment math,
    // and the guard's branches evaluate lazily so no division runs.
    val aggs =
      pairs.map { case (a, b) => covar_samp(col(a), col(b)).as(s"cov_${a}_$b") } ++
        cols.map(c => stddev_samp(col(c)).as(s"__sd_$c"))
    val corrs = pairs.map { case (a, b) =>
      when(col(s"__sd_$a") > 0 && col(s"__sd_$b") > 0,
        col(s"cov_${a}_$b") / (col(s"__sd_$a") * col(s"__sd_$b")))
        .as(s"corr_${a}_$b")
    }
    val base = df.groupBy(groupBy: _*)
      .agg(count(lit(1)).as("n"), aggs: _*)
    base.select(groupBy ++ Seq(col("n")) ++ corrs
      ++ pairs.map { case (a, b) => col(s"cov_${a}_$b") }: _*)
  }

  /** Cramér's V association between two CATEGORICAL columns — the
    * categorical sibling of [[correlationMatrix]] (chi² rescaled to
    * [0,1]: 0 independent, 1 perfectly determined). One corpus pass
    * builds the contingency cells; row totals, column totals, n, and
    * χ² all derive FROM the cells (metadata-scale — cardinality², not
    * corpus rows; keep the columns low-cardinality, the contingency
    * contract). Empty cells contribute their expected count to χ²
    * WITHOUT being materialized: Σ_all expected = n, so
    * χ² = Σ_observed (o−e)²/e + (n − Σ_observed e) — the closed form
    * sidesteps generating the r×c − observed zero cells entirely.
    * Null categories are their own level (nulls associate too); a
    * single-level column has no association to measure → V null. */
  def cramersV(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("__a"), b.as("__b")).agg(count(lit(1)).as("__o"))
    val rows = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val colsT = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("__n")) // one-row scalar carrier
    val e = col("__ra") * col("__cb") / col("__n")
    cells
      .join(broadcast(rows), Seq("__a"))
      .join(broadcast(colsT), Seq("__b"))
      .crossJoin(broadcast(tot))
      .agg(
        max(col("__n")).as("n"),
        countDistinct(col("__a")).as("r"),
        countDistinct(col("__b")).as("c"),
        sum((col("__o") - e) * (col("__o") - e) / e).as("__chi_obs"),
        sum(e).as("__sum_e"))
      .select(col("n"), col("r"), col("c"),
        (col("__chi_obs") + (col("n") - col("__sum_e"))).as("chi2"),
        when(least(col("r"), col("c")) > 1,
          sqrt((col("__chi_obs") + (col("n") - col("__sum_e"))) /
            (col("n") * (least(col("r"), col("c")) - 1))))
          .as("cramers_v"))
  }

  /** Mutual information between two categorical columns, in nats, with
    * the normalized variant NMI = I/√(H(a)·H(b)) — the information-
    * theoretic sibling of [[cramersV]]: χ² measures deviation from
    * independence, MI measures the shared bits, and the two disagree
    * usefully on skewed tables. I = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))).
    *
    * Same scale decomposition as cramersV: ONE corpus pass builds the
    * contingency cells; margins, total, entropies, and the MI sum all
    * derive FROM the cells (cardinality²-scale, broadcast-joined, never
    * a corpus rescan). Log terms use the product-free decomposition
    * ln o + ln n − ln ra − ln cb, so no long×long product can overflow
    * at trillion-row tables. Nulls are their own level; a single-level
    * column gives MI = 0 and NMI null (no entropy to share — ANSI null,
    * not an error). */
  def mutualInformation(df: DataFrame, a: Column, b: Column): DataFrame = {
    // the cells table has FIVE downstream consumers (margins ×2, total,
    // entropies via margins, the MI sum) and column pruning specializes
    // each one's aggregate (the B21 lesson — exchange reuse does not
    // save you), so the cardinality²-bounded cells are truncated once:
    // exactly one corpus scan, plan-pinned
    val cells = graft.operators.Lineage.truncate(
      df.groupBy(a.as("__a"), b.as("__b")).agg(count(lit(1)).as("__o")))
    val rows = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val colsT = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("__n"))
    val ha = rows.crossJoin(broadcast(tot))
      .agg((-sum(col("__ra") / col("__n") * (log(col("__ra")) - log(col("__n"))))).as("__ha"))
    val hb = colsT.crossJoin(broadcast(tot))
      .agg((-sum(col("__cb") / col("__n") * (log(col("__cb")) - log(col("__n"))))).as("__hb"))
    cells
      .join(broadcast(rows), Seq("__a"))
      .join(broadcast(colsT), Seq("__b"))
      .crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n"),
        sum(col("__o") / col("__n") *
          (log(col("__o")) + log(col("__n")) - log(col("__ra")) - log(col("__cb"))))
          .as("mi"))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n"), col("mi"),
        when(col("__ha") > 0 && col("__hb") > 0,
          col("mi") / sqrt(col("__ha") * col("__hb"))).as("nmi"))
  }

  /** Mann-Whitney U rank-sum test (two-sided, tie-corrected): did the
    * LOCATION of a metric shift between two samples — the rank-based,
    * outlier-robust complement of [[ksTest]] (KS sees any shape change;
    * U targets stochastic dominance and keeps power under heavy tails
    * where a t-test dies). Returns U_a, and z under the normal
    * approximation with the tie-corrected variance
    * σ² = nₐn_b/12 · (N+1 − Σ(t³−t)/(N(N−1))); no continuity
    * correction (both engines mirror the same closed form; at the
    * corpus sizes this engine targets the ±0.5 is noise).
    *
    * Distributed exactly like KS: per-side distinct-value counts
    * (ties collapse map-side), one full-outer support merge, and ONE
    * [[graft.operators.Ranking.runningSums]] pass for the exclusive
    * rank offsets — never a global-order window. Average tie ranks are
    * closed-form per distinct value (offset + (t+1)/2). All moments in
    * doubles (nₐ·n_b at 10¹² rows overflows long). Empty or
    * zero-variance cases yield null z, never a division error. */
  def mannWhitney(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    import graft.operators.Ranking
    def side(df: DataFrame, n: String) =
      df.select(value.as("__v")).filter(col("__v").isNotNull)
        .groupBy("__v").agg(count(lit(1)).as(n))
    val m = side(a, "__sca").join(side(b, "__scb"), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__sca"), lit(0L)).as("__ca"),
        coalesce(col("__scb"), lit(0L)).as("__cb"))
    val wc = Ranking.runningSums(m, Seq(col("__v")),
      Seq(((col("__ca") + col("__cb")).cast("double"), "__off")), inclusive = false)
    val t = col("__ca") + col("__cb")
    wc.agg(
        sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__ca") * (coalesce(col("__off"), lit(0.0)) + (t + 1) / lit(2.0)))
          .as("__sumra"),
        sum(t * t * t - t).cast("double").as("__ties"))
      .select(col("n_a"), col("n_b"),
        (col("__sumra") - col("n_a").cast("double") * (col("n_a") + 1) / 2.0).as("u_a"),
        col("__ties"))
      .select(col("n_a"), col("n_b"), col("u_a"), {
        val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
        val nn = na + nb
        val varU = na * nb / 12.0 *
          (nn + 1 - col("__ties") / when(nn * (nn - 1) =!= 0, nn * (nn - 1)))
        ((col("u_a") - na * nb / 2.0) / when(sqrt(varU) =!= 0, sqrt(varU))).as("z")
      })
  }

  /** Benford first-digit audit: observed vs expected
    * P(d) = log₁₀(1 + 1/d) leading-digit distribution of a positive
    * measure — the classic fabricated-/synthetic-data forensic (real
    * multiplicative processes follow it; invented numbers don't). One
    * partial-aggregating pass to 9 digit buckets; χ² = n·Σ(obs−exp)²/exp
    * rides a broadcast of the 9-row table. The first digit comes from
    * the DECIMAL STRING of floor(value) — never floor(value/10^⌊log₁₀⌋),
    * whose log sits on a rounding knife-edge at every power of ten and
    * flips digits cross-engine. Values < 1 have no stable first digit
    * at integer grain and are excluded (documented, oracle-mirrored). */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val digits = df
      .filter(value >= 1)
      .select(substring(floor(value).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("__t"))
    val shares = digits.crossJoin(broadcast(tot))
      .withColumn("obs_share", col("n") / col("__t"))
      .withColumn("exp_share", log(10.0, lit(1.0) + lit(1.0) / col("digit")))
    val chi2 = shares
      .agg((max(col("__t")) * sum(pow(col("obs_share") - col("exp_share"), 2) /
        col("exp_share"))).as("__chi2"))
    shares.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n"), col("obs_share"), col("exp_share"),
        col("__chi2").as("chi2"))
  }

  /** Poisson(1) cumulative distribution thresholds e⁻¹·Σ₀ᵏ 1/k!,
    * k = 0..7 — the inverse-CDF table for [[poissonBootstrapCI]]'s
    * deterministic draws. P(X > 7) ≈ 1.8e-5; the tail clamps to 8. */
  private val PoissonCdf = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999824406472794)

  /** Per-group mean with a Poisson-bootstrap percentile confidence
    * interval — uncertainty quantification that actually distributes
    * (the method of Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google TR 2012): classic bootstrap resamples
    * n rows WITH replacement R times (undistributable — every resample
    * needs global coordination), but for large n the multinomial
    * resample counts are approximately independent Poisson(1), so each
    * row can draw its R replicate multiplicities LOCALLY and the
    * replicate estimates become plain weighted aggregates.
    *
    * Every draw is hash-derived (md5 of id × digest-index through the
    * [[graft.operators.Sampling.hashBucket]] recipe; each 32-hex digest
    * yields TWO 60-bit uniforms — chars 1-15 and 16-30 — so R replicates
    * cost R/2 digests; half-bucket-centered uniform → inverse-CDF lookup
    * in [[PoissonCdf]]) — fully deterministic, engine-mirrorable, no RNG
    * state to coordinate.
    *
    * Scale shape: the replicate axis is an `explode(sequence(...))` of
    * a bounded int literal FIRST, and the digest/weight math is a plain
    * scalar projection AFTER it — whole-stage-codegen'd end to end
    * (deriving weights inside a `transform` lambda would drop the hot
    * path to interpreted eval: higher-order lambdas are CodegenFallback,
    * measured ~5× slower on the R×corpus row stream). The exploded
    * stream feeds a (group × replicate) partial aggregate — map-side
    * combine collapses each partition to |groups|·R rows before the
    * ONLY corpus-wide shuffle — and the percentile step sorts R values
    * per group (R bounded, never a window over data). CI = order
    * statistics of the sorted replicate means: lo = element
    * max(1, ⌊α/2·m⌋), hi = element min(m, ⌈(1−α/2)·m⌉), m = replicates
    * with a non-degenerate (weight-sum > 0) resample. Null values are
    * excluded. */
  def poissonBootstrapCI(df: DataFrame, groupCols: Seq[String], value: Column,
                         id: Column, replicates: Int = 40, alpha: Double = 0.05,
                         salt: String = "bs"): DataFrame = {
    require(replicates >= 4, s"need >= 4 replicates for a percentile CI, got $replicates")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    import graft.operators.Sampling.M
    val base = df
      .select(groupCols.map(col) ++ Seq(value.cast("double").as("__v"),
        id.cast("string").as("__id")): _*)
      .filter(col("__v").isNotNull)
    def pois(u: Column): Column =
      PoissonCdf.zipWithIndex.foldRight(lit(8): Column) {
        case ((t, k), acc) => when(u < t, lit(k)).otherwise(acc)
      }
    val digest = md5(concat(col("__id"), lit(":" + salt + ":"),
      floor(col("__r") / 2).cast("string")))
    val u = (pmod(conv(digest.substr(lit(1) + pmod(col("__r"), lit(2)) * 15,
      lit(15)), 16, 10).cast("long"), lit(M)).cast("double") + 0.5) / M.toDouble
    // The replicate explode amplifies per-row compute ×R (digest +
    // inverse-CDF per replicate), so a source NARROWER than the cluster
    // (few files, single-row-group parquet) would serialize the hot
    // stage on a handful of tasks. Aligning width costs one shuffle of
    // the UN-amplified rows and fires only when the source actually
    // under-partitions — at corpus scale (≥ cores splits) it's a no-op.
    val wide = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (base.rdd.getNumPartitions < wide) base.repartition(wide) else base
    // the point estimate rides the SAME aggregate: every replicate row
    // of a group carries the identical unweighted count/sum, so n and
    // the mean come from max() over the replicate axis — no second
    // corpus scan for a trivial avg (plan-pinned scans=1)
    val rep = spread
      .withColumn("__r", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__w", pois(u).cast("double"))
      .groupBy((groupCols :+ "__r").map(col): _*)
      .agg(sum(col("__w") * col("__v")).as("__sw"), sum(col("__w")).as("__sn"),
        count(lit(1)).as("__cnt"), sum(col("__v")).as("__sv"))
      .withColumn("__m", col("__sw") / when(col("__sn") =!= 0.0, col("__sn")))
    rep
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("__m"))).as("__ms"),
        max(col("__cnt")).as("n"),
        (max(col("__sv")) / max(col("__cnt"))).as("mean"))
      .withColumn("__mn", size(col("__ms")))
      .select(groupCols.map(col) ++ Seq(col("n"), col("mean"),
        element_at(col("__ms"),
          greatest(lit(1), floor(lit(alpha / 2) * col("__mn")).cast("int"))).as("ci_lo"),
        element_at(col("__ms"),
          least(col("__mn"), ceil(lit(1 - alpha / 2) * col("__mn")).cast("int"))).as("ci_hi")): _*)
  }
}
