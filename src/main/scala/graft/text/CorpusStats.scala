package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-composition statistics for dataset mixing: how far each
  * source's token distribution sits from the corpus-wide distribution.
  * Mixing decisions (up/down-weighting a source in the training blend)
  * need exactly this signal, next to the per-document scores in
  * [[TextFunctions]].
  *
  * Plan shape at 100 TB: one explode → (source, token) hash aggregate
  * (map-side combine — the shuffle carries one row per distinct
  * (source, token), not per occurrence), a token-keyed join to attach
  * global counts (both sides already aggregated), and a final per-source
  * aggregate. No driver-side vocabulary, no collects — the same shuffle
  * discipline as [[TfIdf]].
  */
object CorpusStats {

  /** Per-source token-distribution report:
    * (source, n_tokens, n_distinct, kl_bits).
    *
    * `kl_bits` is the Kullback–Leibler divergence KL(source ‖ corpus) in
    * bits: Σ_t p_s(t) · log2(p_s(t) / q(t)) over the source's tokens,
    * where p_s is the source's empirical unigram distribution and q the
    * whole corpus's. 0 = indistinguishable from the blend; larger =
    * more idiosyncratic. Always finite: every token of a source is by
    * construction part of the corpus distribution (q(t) > 0). */
  def sourceDivergence(df: DataFrame, source: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(source.as("source"), explode(TextFunctions.tokens(text)).as("t"))
    // STRICTLY LINEAR from the explosion down: per-source totals and
    // global token counts are window sums over the (source, token)
    // aggregate instead of groupBy+join-back — the joins gave the
    // explosion three lineage parents, and AQE's stage reuse only
    // deduped one of them (measured: 2 executed explosions). Both
    // window partitions are structurally bounded on the DISTINCT
    // (source, token) table: by-source rows = that source's vocabulary,
    // by-token rows = the number of sources carrying the token — no
    // occurrence-level Zipf skew (which is why this rewrite is safe
    // here but NOT for per-doc tables like d35's).
    val bySource = tok.groupBy("source", "t").agg(count(lit(1)).as("c_st"))
      .withColumn("n_s", sum("c_st").over(Window.partitionBy("source")))
      .withColumn("c_t", sum("c_st").over(Window.partitionBy("t")))
    // corpus total = Σ token-array lengths: an explode-FREE second scan,
    // broadcast as a single row (the d16/TfIdf pattern)
    val grandTotal = df.agg(sum(size(TextFunctions.tokens(text)).cast("long")).as("n_total"))
    bySource
      .crossJoin(broadcast(grandTotal))
      .withColumn("__p", col("c_st").cast("double") / col("n_s"))
      .withColumn("__q", col("c_t").cast("double") / col("n_total"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(sum(col("__p") * log2(col("__p") / col("__q"))), 4).as("kl_bits"))
  }

  /** Per-document cross-entropy under the corpus unigram LM, in bits
    * per token: H(d) = −Σ_t (c_dt/n_d)·log2(q(t)) with q the corpus
    * unigram distribution. The relational analog of CCNet's LM-
    * perplexity filter: low = built from the corpus's most common
    * tokens (boilerplate), high = rare-token-heavy (gibberish, wrong
    * language, binary junk) — both tails are what quality filters cut.
    * Always finite (every doc token is in the corpus distribution).
    *
    * Plan shape: (doc, token) hash aggregate → token-keyed join to the
    * (already aggregated) global counts → per-doc aggregate; the corpus
    * total is a single-row broadcast. n_d rides inside the final
    * aggregate as Σc_dt, so one pass computes both count and entropy. */
  def docCrossEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(TextFunctions.tokens(text)).as("t"))
    val byDoc = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c_dt"))
    val global = byDoc.groupBy("t").agg(sum("c_dt").as("c_t"))
    // corpus total = Σ token-array lengths ≡ Σ c_t, from an explode-FREE
    // scan: with the total derived from `global` the explosion had a
    // third lineage parent, surviving only by AQE's canonical-plan
    // stage-reuse luck (global counts can't become window sums here —
    // byDoc is a PER-DOC table, so partition-by-token windows carry
    // occurrence-level Zipf skew; the d26 rewrite does not apply)
    val grandTotal = df.agg(sum(size(TextFunctions.tokens(text)).cast("long")).as("n_total"))
    byDoc.join(global, "t")
      .crossJoin(broadcast(grandTotal))
      .groupBy("doc_id")
      .agg(sum("c_dt").as("n_tokens"),
        round(-sum(col("c_dt") * log2(col("c_t").cast("double") / col("n_total")))
          / sum("c_dt"), 4).as("xent_bits"))
  }

  /** Per-document cross-entropy under an interpolated BIGRAM corpus LM,
    * in bits per bigram event: the order-2 upgrade of [[docCrossEntropy]]
    * (CCNet's actual filter model is a 5-gram LM; the bigram captures the
    * first-order structure signal a unigram model cannot — scrambled
    * token bags score identically under unigrams but high here).
    *
    * P(w | p) = λ · c(p,w)/c(p,·)  +  (1 − λ) · c(w)/N
    * H(d) = −Σ_{(p,w)∈d} c_d(p,w) · log2 P(w|p) / n_d
    *
    * The unigram back-off term keeps every probability strictly positive
    * (each cur token occurs in the corpus), so H is always finite even
    * for bigrams the corpus saw only in this document. Documents with
    * fewer than 2 tokens have no bigram events and are absent.
    *
    * Plan shape at 100 TB: bigram pairing happens in the ARRAY domain
    * (`zip_with` of the token array with its own shift — a narrow map,
    * no positional self-join), then one explode → (doc, prev, cur) hash
    * aggregate with map-side combine. Context and cur-unigram totals are
    * WINDOW sums over the corpus-bigram table — a strictly linear chain
    * byDoc → bg → windows, so the expensive explosion has ONE derived
    * consumer (the d28/c20 discipline: AQE stage reuse covers identical
    * duplicate subtrees only when canonicalization happens to line up —
    * measured here, the 4-way join formulation re-ran the explode 3×).
    * Window partitions are vocabulary-bounded (bg is corpus-distinct
    * (prev, cur); the heaviest `p` partition is one context's vocab
    * fan-out, not its occurrence count). The grand total Σ(len−1) comes
    * from a second, explode-FREE scan of the source (narrow length sum,
    * single-row broadcast), and the final per-doc aggregate folds n_d
    * in as Σc. */
  def docBigramCrossEntropy(df: DataFrame, id: Column, text: Column,
                            lambda: Double = 0.8): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, "need 0 < lambda < 1 (λ=1 loses the unigram floor)")
    import org.apache.spark.sql.expressions.Window
    val nBigrams = greatest(size(TextFunctions.tokens(text)) - 1, lit(0))
    val pairs = df
      .select(id.as("doc_id"), TextFunctions.tokens(text).as("__ts"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("__ts"), lit(1), greatest(size(col("__ts")) - 1, lit(0))),
        slice(col("__ts"), lit(2), greatest(size(col("__ts")) - 1, lit(0))),
        (a, b) => struct(a.as("p"), b.as("t")))).as("__bg"))
      .select(col("doc_id"), col("__bg.p").as("p"), col("__bg.t").as("t"))
    // byDoc deliberately has TWO consumers (join left + the bg chain),
    // both of which re-run the scan→explode→partial-agg map stage when
    // AQE's canonical-plan stage reuse misses (measured: it covers the
    // first duplicate in d35's shape but not deeper copies). That is
    // the RIGHT trade here, stated explicitly: the alternatives are a
    // checkpoint of the (doc, prev, cur) table — rewriting an
    // intermediate ~the size of the tokenized corpus, far costlier than
    // re-running an embarrassingly-parallel map stage — or occurrence-
    // level window counts over byDoc, whose per-token partitions are
    // Zipf-skewed (every "the"-bigram row in one reducer). ScanSpec pins
    // the executed plan at ≤ 2 explosions so a regression to the 3× of
    // the naive 4-way-join formulation stays visible.
    val byDoc = pairs.groupBy("doc_id", "p", "t").agg(count(lit(1)).as("c_dpt"))
    val bg = byDoc.groupBy("p", "t").agg(sum("c_dpt").as("c_pt"))
      .withColumn("c_p", sum("c_pt").over(Window.partitionBy("p")))
      .withColumn("c_t", sum("c_pt").over(Window.partitionBy("t")))
    // Σ(len−1) over all docs ≡ Σ c_pt, without touching the explosion
    val grandTotal = df.agg(sum(nBigrams.cast("long")).as("n_total"))
    // (1 − λ) is computed IN the plan (not pre-folded in Scala) so the
    // DuckDB oracle's literal `1 - λ` arithmetic matches bit-for-bit
    byDoc.join(bg, Seq("p", "t"))
      .crossJoin(broadcast(grandTotal))
      .withColumn("__pi",
        lit(lambda) * (col("c_pt").cast("double") / col("c_p")) +
          (lit(1.0) - lit(lambda)) * (col("c_t").cast("double") / col("n_total")))
      .groupBy("doc_id")
      .agg(sum("c_dpt").as("n_bigrams"),
        round(-sum(col("c_dpt") * log2(col("__pi"))) / sum("c_dpt"), 4).as("xent_bits"))
  }

  /** Common-vocabulary coverage — the rare-word-rate quality axis: per
    * document, the fraction of token occurrences drawn from the
    * corpus's top-`k` terms. Gibberish, OCR noise, and heavy
    * code/jargon score low; ordinary prose sits high. The inverse
    * (1 − coverage) is the "rare word density" signal.
    *
    * Plan: the exploded (doc, token) table is truncated ONCE (two
    * consumers: vocabulary election and the coverage join — the
    * single-parent rule). The vocabulary is a partial-aggregated term
    * count → one TakeOrdered(k) (count desc, term asc — deterministic
    * at the boundary) → broadcast back, so the coverage side is a
    * broadcast semi-probe, never a shuffle on the Zipf token key.
    * Output: (doc_id, n_tokens, n_in_vocab, coverage). */
  def vocabCoverage(df: DataFrame, id: Column, text: Column, k: Int = 500): DataFrame = {
    require(k > 0, s"vocabulary size must be positive, got $k")
    val toks = graft.operators.Lineage.truncate(
      df.select(id.as("doc_id"), TextFunctions.tokens(text).as("__t"))
        .select(col("doc_id"), explode(col("__t")).as("w"))
        .filter(length(col("w")) > 0))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w"))
      .limit(k)
      .select(col("w"), lit(true).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in"), 1L).otherwise(0L)).as("n_in_vocab"))
      .withColumn("coverage",
        round(col("n_in_vocab").cast("double") / col("n_tokens").cast("double"), 4))
  }

  /** Per-slice distribution drift of a bounded score column against
    * the whole corpus: Population Stability Index and chi-square over
    * fixed equal-width bins — the production data-drift monitor for a
    * continuously-ingested corpus (a source whose quality distribution
    * shifts shows a rising PSI long before mean-level signals move;
    * the standard reading: <0.1 stable, 0.1–0.25 drifting, >0.25
    * shifted).
    *
    * Bins are FIXED [lo, hi) equal-width (deterministic and
    * engine-mirrorable — quantile bins would need a sketch and a
    * second pass); out-of-range values clamp to the edge bins.
    * Laplace smoothing (`alpha` per bin) keeps PSI's logs finite
    * when a slice misses a bin, applied to BOTH sides so
    * PSI(slice = corpus) = 0 exactly; chi-square uses the unsmoothed
    * expectation (a slice identical to the corpus scores 0 on both).
    *
    * Plan: one scan → (slice, bin) partial-aggregating count; the
    * global per-bin distribution re-aggregates THAT key-cardinality
    * table (never the corpus) and broadcasts; no windows, no skew
    * surface. */
  def qualityDrift(df: DataFrame, slice: Column, value: Column,
                   nBins: Int = 10, lo: Double = 0.0, hi: Double = 1.0,
                   alpha: Double = 0.5): DataFrame =
    qualityDriftFromCells(driftCells(df, slice, value, nBins, lo, hi), nBins, alpha)

  /** The (slice, bin, c) cell table behind [[qualityDrift]] — an
    * ADDITIVE state (cells of a union = summed cells of the parts),
    * so per-slice/per-epoch cell tables maintain incrementally under
    * the C25/E14 discipline and the metrics recompute from
    * key-cardinality state, never the corpus
    * ([[qualityDriftFromCells]]). */
  def driftCells(df: DataFrame, slice: Column, value: Column,
                 nBins: Int = 10, lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(nBins >= 2 && hi > lo, s"need >= 2 bins over a real range, got $nBins over [$lo,$hi)")
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((value - lit(lo)) / lit((hi - lo) / nBins)).cast("int")))
    df.select(slice.as("slice"), bin.as("bin"))
      .groupBy("slice", "bin").agg(count(lit(1)).as("c"))
  }

  /** PSI/chi-square from a (slice, bin, c) cell table — duplicate
    * (slice, bin) rows (multi-epoch state) are re-summed first. */
  def qualityDriftFromCells(cellRows: DataFrame, nBins: Int,
                            alpha: Double = 0.5): DataFrame = {
    // cells has three plan consumers (slice totals, global bins, the
    // grid join) — truncate so the upstream (corpus scan in the batch
    // path, state read in the streaming path) executes ONCE (AQE
    // stage reuse does not reliably dedup multi-parent subtrees)
    val cells = graft.operators.Lineage.truncate(
      cellRows.groupBy("slice", "bin").agg(sum("c").as("c")))
    val sliceTotals = cells.groupBy("slice").agg(sum("c").as("n_s"))
    val globalBins = cells.groupBy("bin").agg(sum("c").as("c_g"))
    val grand = globalBins.agg(sum("c_g").as("n_g"))
    // dense (slice × bin) grid so missing bins contribute their
    // smoothed mass: cross the slice totals with the bin ids
    val grid = sliceTotals.crossJoin(broadcast(globalBins))
      .join(cells, Seq("slice", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(grand))
    val p = (col("c").cast("double") + alpha) /
      (col("n_s").cast("double") + alpha * nBins)
    val q = (col("c_g").cast("double") + alpha) /
      (col("n_g").cast("double") + alpha * nBins)
    // chi-square uses the UNsmoothed expectation (smoothing is PSI's
    // log guard): a zero-global bin contributes nothing (c is 0 too)
    val qe = col("c_g").cast("double") / col("n_g").cast("double")
    val e = col("n_s").cast("double") * qe
    grid
      .withColumn("__term", (p - q) * log(p / q))
      .withColumn("__chi", when(col("c_g") > 0,
        pow(col("c").cast("double") - e, 2) / e).otherwise(lit(0.0)))
      .groupBy("slice")
      .agg(max("n_s").as("n"),
        round(sum("__term"), 6).as("psi"),
        round(sum("__chi"), 4).as("chi2"))
  }

  /** Zipf rank–frequency fit over the corpus's top-`topK` terms: one
    * row (n_terms, slope, intercept, r2, head_share). Natural text
    * follows freq ∝ rank^s with s ≈ −1 at high R²; gibberish, OCR
    * noise, and template-expanded synthetic corpora bend the line —
    * a cheap whole-corpus health check next to the per-doc signals
    * (D35/D37/D49).
    *
    * slope/intercept/r2 are the least-squares fit of ln(freq) on
    * ln(rank), computed FROM PLAIN SUMS (n·Σxy−ΣxΣy over …) rather
    * than `regr_slope` so an engine mirror reproduces the arithmetic
    * exactly; `head_share` is the corpus token share the top-k head
    * covers (Zipf predicts ~H(k)/H(V); a head share near 1 means a
    * degenerate vocabulary). Plan: one explode → map-side-combined
    * term aggregate (the Zipf head is absorbed by combiners), a
    * driver-bounded top-k (TakeOrdered, never a full sort), ranks
    * from a ≤k-row single-partition window (bounded by construction),
    * an explode-free broadcast grand total, and one final aggregate. */
  def zipfFit(df: DataFrame, text: Column, topK: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK > 1, s"need at least 2 ranks to fit a line, got $topK")
    val top = df.select(explode(TextFunctions.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topK)
    val ranked = top.withColumn("r",
      row_number().over(Window.orderBy(col("c").desc, col("w"))))
    val grandTotal = df.agg(
      sum(size(TextFunctions.tokens(text)).cast("long")).as("n_total"))
    val pts = ranked.select(col("c"),
      log(col("r").cast("double")).as("x"), log(col("c").cast("double")).as("y"))
    pts.crossJoin(broadcast(grandTotal))
      .agg(count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("c").cast("double")).as("sc"), max("n_total").as("nt"))
      .select(col("n").cast("long").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("intercept"),
        round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"),
        round(col("sc") / col("nt").cast("double"), 6).as("head_share"))
  }

  /** Heaps-law vocabulary-growth fit — [[zipfFit]]'s temporal sibling:
    * V(N) ≈ K·N^β, the sublinear law for how many DISTINCT types a
    * corpus accumulates as tokens stream in (β ≈ 0.4–0.6 for natural
    * text; β drifting toward 1 screams boilerplate/ID-like tokens,
    * β collapsing toward 0 screams template spam — both are corpus-
    * health gates the Zipf head can't see).
    *
    * Distributed exactly against any corpus size: each token's FIRST
    * document is a partial-aggregating `min(order)` (the only corpus-
    * scale shuffle — duplicate tokens collapse map-side); per-doc
    * new-type and token counts then cumulate through ONE
    * [[graft.operators.Ranking.runningSums]] pass (both prefixes share
    * the range exchange), and the log-log least squares reduces to
    * plain sums (the d50 closed form, engine-mirrorable). Each doc
    * contributes one (ln N, ln V) point — the canonical Heaps
    * regression weighting. Docs with no tokens contribute no point;
    * `order` must be unique per doc (it is the arrival order). */
  def heapsFit(df: DataFrame, order: Column, text: Column): DataFrame = {
    val perDoc = df.select(order.as("__hp_o"),
        TextFunctions.tokens(text).as("__hp_t"))
      .select(col("__hp_o"),
        size(filter(col("__hp_t"), w => length(w) > 0)).cast("long").as("__hp_n"),
        col("__hp_t"))
    val firstSeen = perDoc
      .select(col("__hp_o"), explode(col("__hp_t")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(min(col("__hp_o")).as("__hp_first"))
      .groupBy(col("__hp_first").as("__hp_o")).agg(count(lit(1)).as("__hp_new"))
    val joined = perDoc.drop("__hp_t")
      .join(firstSeen, Seq("__hp_o"), "left")
      .select(col("__hp_o"), col("__hp_n"),
        coalesce(col("__hp_new"), lit(0L)).as("__hp_new"))
    val cum = graft.operators.Ranking.runningSums(joined,
      Seq(col("__hp_o").asc),
      Seq(col("__hp_n") -> "__hp_cn", col("__hp_new") -> "__hp_cv"))
    val pts = cum
      .filter(col("__hp_n") > 0 && col("__hp_cn") > 0 && col("__hp_cv") > 0)
      .select(log(col("__hp_cn").cast("double")).as("x"),
        log(col("__hp_cv").cast("double")).as("y"),
        col("__hp_cn"), col("__hp_cv"))
    pts.agg(count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        max(col("__hp_cn")).as("nt"), max(col("__hp_cv")).as("nv"))
      .select(col("n").cast("long").as("n_docs"),
        col("nt").as("total_tokens"), col("nv").as("vocab"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          nonzero(col("n") * col("sxx") - col("sx") * col("sx")), 6).as("beta"),
        round(exp((col("sy") * col("sxx") - col("sx") * col("sxy")) /
          nonzero(col("n") * col("sxx") - col("sx") * col("sx"))), 6).as("k"),
        // a CONSTANT vocabulary (every y equal) zeroes the y-variance
        // factor; under ANSI that division must yield null, not throw —
        // r² is undefined for a zero-variance response (a single point
        // likewise nulls beta/k through the zero x-variance)
        round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          nonzero((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** ANSI-safe denominator: 0 → null so the division yields null
    * instead of throwing DIVIDE_BY_ZERO. */
  private def nonzero(c: Column): Column =
    when(c === 0, lit(null)).otherwise(c)

  /** Term burstiness via the variance-to-mean ratio across documents
    * (Church & Gale 1995): for each term, VMR = Var(c_d)/E(c_d) over
    * ALL documents (zeros included — a term absent from a doc counts 0).
    * Poisson-scattered function words sit near 1; topical content words
    * "burst" (once a doc mentions them, it mentions them repeatedly)
    * and score ≫ 1 — the statistical stopword/content-word separator
    * that needs no stopword list, feeding D16-style term weighting and
    * boilerplate diagnostics.
    *
    * Zeros never materialize: with Σc and Σc² from the (doc, term)
    * table and N the doc count, Var = Σc²/N − (Σc/N)² — one explode,
    * one (doc, term) partial agg, one term-level partial agg, plus a
    * one-row broadcast N from an explode-free side scan. `minTotal`
    * prunes rare terms whose VMR is noise. */
  def burstiness(df: DataFrame, id: Column, text: Column,
                 minTotal: Long = 10L): DataFrame = {
    val dt = df.select(id.as("__d"), explode(TextFunctions.tokens(text)).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("__d", "token").agg(count(lit(1)).as("__c"))
    val n = df.agg(count(lit(1)).as("__n"))
    dt.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("__c")).as("total"),
        sum(col("__c") * col("__c")).as("__sq"))
      .filter(col("total") >= minTotal)
      .crossJoin(broadcast(n))
      .withColumn("__mu", col("total").cast("double") / col("__n"))
      .select(col("token"), col("df"), col("total"),
        ((col("__sq") / col("__n") - col("__mu") * col("__mu")) /
          nonzero(col("__mu"))).as("vmr"))
  }

  /** Log-odds-ratio vocabulary shift with an informative Dirichlet
    * prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words") — which
    * terms distinguish the target slice from the rest of the corpus.
    * Raw log-odds overweights rare words; the pooled-corpus prior
    * α_w = α₀·p̂_w shrinks them:
    *
    *   δ_w = ln((y_aw+α_w)/(n_a+α₀−y_aw−α_w)) − ln((y_bw+α_w)/(n_b+α₀−y_bw−α_w))
    *   z_w = δ_w / √(1/(y_aw+α_w) + 1/(y_bw+α_w))
    *
    * The principled replacement for eyeballing two KL tables (D26
    * scores sources against the corpus; this scores TERMS between two
    * slices with a significance scale).
    *
    * Scale shape: ONE corpus pass — a conditional (token × side)
    * aggregate (the d44 fused-slice discipline: the target is a row
    * predicate, not a second scan), map-side combine absorbing the
    * Zipf head; totals reduce the vocab-scale token table and ride a
    * one-row broadcast; everything after is a narrow map over \|V\|
    * rows. Zero-width slices yield null δ/z (no distribution), not an
    * error. */
  def logOddsShift(df: DataFrame, text: Column, isTarget: Column,
                   alpha0: Double = 200.0): DataFrame = {
    require(alpha0 > 0, s"alpha0 must be positive, got $alpha0")
    val tok = df.select(isTarget.as("__tgt"), explode(TextFunctions.tokens(text)).as("token"))
      .filter(length(col("token")) > 0)
    val counts = tok.groupBy("token").agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("y_a"),
      sum(when(!col("__tgt"), 1L).otherwise(0L)).as("y_b"))
    val tot = counts.agg(sum(col("y_a")).as("__na"), sum(col("y_b")).as("__nb"))
    counts.crossJoin(broadcast(tot))
      .withColumn("__aw",
        lit(alpha0) * (col("y_a") + col("y_b")) / (col("__na") + col("__nb")))
      .withColumn("delta",
        log((col("y_a") + col("__aw")) /
          nonzero(col("__na") + lit(alpha0) - col("y_a") - col("__aw"))) -
        log((col("y_b") + col("__aw")) /
          nonzero(col("__nb") + lit(alpha0) - col("y_b") - col("__aw"))))
      .withColumn("z", col("delta") /
        sqrt(lit(1.0) / (col("y_a") + col("__aw")) +
          lit(1.0) / (col("y_b") + col("__aw"))))
      .select(col("token"), col("y_a"), col("y_b"), col("delta"), col("z"))
  }
}
