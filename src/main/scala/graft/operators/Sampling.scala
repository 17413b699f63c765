package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selection changes
  * with partitioning, retries, and scale-ups — useless for reproducible
  * dataset curation. These operators hash a stable KEY instead: a row is
  * in or out of the sample forever, on any cluster layout, and an
  * external engine can re-derive the exact selection (the hash is
  * md5-based, not engine-specific). Narrow map, no shuffle, applied at
  * scan time — at 100 TB the filter reaches the parquet scan and
  * row-group statistics still prune.
  */
object Sampling {

  /** Parts-per-million resolution of the sampling hash. */
  /** Hash-bucket modulus: [[hashBucket]] values are uniform over
    * [0, M). Public so derived uniforms (e.g. DSIR's Gumbel noise) can
    * normalize by the same constant. */
  val M = 1000000L

  /** Stable per-key bucket in [0, 1e6): the first 15 hex chars of
    * md5(key ++ salt) parsed as a 60-bit integer, mod 1e6. Changing
    * `salt` draws an independent sample (e.g. train/validation splits
    * from the same corpus use different salts). */
  def hashBucket(key: Column, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10).cast("long"), lit(M))

  /** Keep ~`fraction` of rows, selected deterministically by `key`.
    * Rows with the same key are kept or dropped together — sampling by
    * a document id keeps documents whole; sampling by a user id keeps
    * whole user histories (no leakage between splits). */
  def hashSample(df: DataFrame, key: Column, fraction: Double, salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    // round, don't truncate: 0.3·1e6 is 299999.99999999994 in binary —
    // truncation would put the cutoff one ppm below what an external
    // system re-deriving the split would compute
    df.filter(hashBucket(key, salt) < math.round(fraction * M))
  }

  /** Stratified deterministic sampling: per-stratum fractions (e.g.
    * downsample boilerplate-heavy sources, keep all rare-language docs),
    * `default` for strata not in the map — the reference's
    * quality-tiering pattern generalized. One narrow pass. */
  def stratifiedHashSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Map[String, Double],
      default: Double,
      salt: String = ""): DataFrame = {
    fractions.values.foreach(f => require(f >= 0 && f <= 1, s"fraction out of [0,1]: $f"))
    require(default >= 0 && default <= 1, s"default fraction out of [0,1]: $default")
    val cut = fractions.foldRight(lit(math.round(default * M))) { case ((s, f), els) =>
      when(stratum === s, lit(math.round(f * M))).otherwise(els)
    }
    df.filter(hashBucket(key, salt) < cut)
  }

  /** EXACTLY min(k, |stratum|) rows per stratum, selected
    * deterministically: rank by the md5 hash bucket (key as tie-break)
    * within each stratum and keep the first k. Fractional sampling
    * ([[stratifiedHashSample]]) cannot promise a sample SIZE; held-out
    * eval sets and per-source audit samples need exactly-k semantics,
    * reproducible on any layout and re-derivable by an external engine.
    * Output keeps the rank as the reserved column `rn` (1-based) — a
    * stable position for downstream "first n of the sample" cuts.
    *
    * Scale: one shuffle on the stratum; the rank is a per-stratum
    * window (WindowGroupLimit pushes the k-filter below the sort at
    * the physical level). */
  def exactKPerStratum(
      df: DataFrame,
      key: Column,
      stratum: Column,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.operators.Relational.topKPerGroup(df,
      partitionBy = Seq(stratum), orderBy = Seq(hashBucket(key, salt), key), k = k)
  }

  /** Rebalance the corpus to a target stratum mix (dataset-mixing, the
    * downsampling half of DoReMi-style source reweighting): keep the
    * LARGEST deterministic subsample whose stratum shares match
    * `weights`, never upsampling. With per-stratum counts n_s and
    * relative weights w_s, the achievable total is T = min_s(n_s/w_s)
    * and each stratum keeps fraction f_s = w_s·T/n_s — the binding
    * (argmin) stratum keeps ALL its rows, every other stratum is
    * hash-downsampled to match. Strata not in `weights` (weight 0) are
    * dropped; weights are relative (they need not sum to 1).
    *
    * Scale: one count aggregate over the corpus (tiny result: one row
    * per stratum), the per-stratum cutoffs are computed inside the plan
    * (single-row cross join + broadcast fraction table — no counts ever
    * reach the driver), and the selection itself is [[hashBucket]] —
    * key-stable, layout-independent, re-derivable by an external
    * engine. Rows with the same key stay or go together across strata
    * boundaries only if the key is stratum-consistent (a document id
    * keyed sample assumes one stratum per document). */
  def rebalanceToMix(
      df: DataFrame,
      key: Column,
      stratum: Column,
      weights: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.values.foreach(w => require(w > 0, s"weights must be positive, got $w"))
    Seq("__stratum", "__w", "__n", "__T", "__cut").foreach(c =>
      require(!df.columns.contains(c), s"input already has reserved column $c"))
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF("__stratum", "__w")
    val counts = df.groupBy(stratum.as("__stratum")).agg(count(lit(1)).as("__n"))
    // inner join: weighted-but-absent strata cannot constrain T (their
    // target share is unsatisfiable at any T > 0); unweighted strata drop
    val joined = counts.join(broadcast(w), "__stratum")
    // T = min(n/w) via a global window over the joined table (one row
    // per WEIGHTED stratum) — an agg + crossJoin formulation would give
    // the counts aggregate two plan parents and scan the corpus twice
    val all = Window.partitionBy()
    val cuts = joined
      .withColumn("__T", min(col("__n").cast("double") / col("__w")).over(all))
      .select(col("__stratum"),
        round(col("__w") * col("__T") / col("__n") * lit(M)).cast("long").as("__cut"))
    df.join(broadcast(cuts), stratum === col("__stratum"))
      .filter(hashBucket(key, salt) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** Temperature-flattened mix (the (n_s/N)^α source-reweighting rule
    * behind multilingual/multi-source training mixes): target shares
    * p_s ∝ n_s^α with temperature α ∈ (0, 1], then the SAME
    * largest-subsample-never-upsampling semantics as [[rebalanceToMix]]
    * — T = min_s(n_s/p_s) and each stratum keeps f_s = p_s·T/n_s =
    * (min_t n_t^(1−α) / n_s^(1−α)). α = 1 keeps everything (identity
    * mix); α → 0 flattens toward uniform counts (every stratum cut to
    * the smallest's size); in between, heads downsample smoothly and
    * the SMALLEST stratum always keeps all its rows. Unlike
    * [[rebalanceToMix]] there is no external weights table — the
    * targets come from the observed counts, so the operator is one
    * count aggregate (one row per stratum), an in-plan pow/min over
    * that tiny table, and the [[hashBucket]] filter: key-stable,
    * layout-independent, externally re-derivable. */
  def temperatureMix(
      df: DataFrame,
      key: Column,
      stratum: Column,
      alpha: Double,
      salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    Seq("__stratum", "__p", "__n", "__T", "__cut").foreach(c =>
      require(!df.columns.contains(c), s"input already has reserved column $c"))
    val counts = df.groupBy(stratum.as("__stratum")).agg(count(lit(1)).as("__n"))
    val all = Window.partitionBy()
    // the N^α share normalizer cancels inside n/p and p·T/n — work with
    // unnormalized p_s = n_s^α throughout
    val cuts = counts
      .withColumn("__p", pow(col("__n").cast("double"), lit(alpha)))
      .withColumn("__T", min(col("__n").cast("double") / col("__p")).over(all))
      .select(col("__stratum"),
        round(col("__p") * col("__T") / col("__n") * lit(M)).cast("long").as("__cut"))
    df.join(broadcast(cuts), stratum === col("__stratum"))
      .filter(hashBucket(key, salt) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** Deterministic named-split assignment (train/val/test): the key's
    * [[hashBucket]] lands in consecutive cumulative-fraction intervals,
    * in `splits` order, with the LAST split absorbing the remainder (so
    * rounding never leaves a key unassigned). Fractions must sum to 1
    * (±1e-9). Same key ⇒ same split, on any layout, re-derivable
    * externally — and any rows sharing the key co-assign. */
  def assignSplit(key: Column, splits: Seq[(String, Double)], salt: String = ""): Column = {
    require(splits.size >= 1, "need at least one split")
    splits.foreach { case (_, f) => require(f >= 0 && f <= 1, s"fraction out of [0,1]: $f") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = hashBucket(key, salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(c => math.round(c * M))
    splits.init.zip(cum).foldRight(lit(splits.last._1)) { case (((name, _), cut), els) =>
      when(bucket < cut, lit(name)).otherwise(els)
    }
  }

  /** Leakage-safe train/val/test split for a text corpus: the split key
    * is the CONTENT fingerprint, so byte-identical documents (after
    * normalization) can never straddle splits — the standard eval-
    * hygiene failure when splitting by row id. For NEAR-dup safety,
    * assign on a dup-cluster label instead:
    * `df.withColumn("split", assignSplit(col("cluster_label"), splits))`
    * with labels from `Dedup.resolveClusters` (every member of a
    * near-dup cluster co-assigns). Adds a `split` column; one narrow
    * map, no shuffle. */
  def leakageSafeSplit(df: DataFrame, text: Column,
                       splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(!df.columns.contains("split"),
      "leakageSafeSplit adds column 'split'; rename the existing one")
    df.withColumn("split",
      assignSplit(graft.text.TextFunctions.contentFingerprint(text), splits, salt))
  }

  /** Token-budget quota per stratum — the "take the best B tokens from
    * each source" curation rule behind fixed-size training mixes (e.g.
    * a 50B-token target per language/domain): within every stratum,
    * rows are ranked best-first by `quality` (descending, `tieBreak`
    * ascending makes the order total ⇒ the selection deterministic) and
    * kept while the INCLUSIVE running sum of `cost` stays ≤ `budget` —
    * so a stratum never exceeds its budget, and the first row that
    * would cross is cut. Emits `cum_cost`, the running total, so
    * downstream packing can resume the count.
    *
    * One per-stratum running-sum window: a shuffle on the stratum key
    * plus a per-stratum sort — the same C5/top-k-per-group shape, fine
    * while strata are plentiful (sources/languages/domains). With FEW
    * giant strata at 100 TB, refine to the two-phase form: pre-bucket
    * `quality` (partial agg → tiny per-(stratum, bucket) totals table,
    * prefix-sum on the driver-scale table picks a quality threshold +
    * residual budget), then row-rank only the single boundary bucket —
    * same result, no full-stratum sort. */
  def tokenBudgetPerStratum(
      df: DataFrame,
      stratum: Column,
      cost: Column,
      quality: Column,
      tieBreak: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("cum_cost"),
      "tokenBudgetPerStratum adds column 'cum_cost'; rename the existing one")
    val w = Window.partitionBy(stratum).orderBy(quality.desc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_cost", sum(cost.cast("long")).over(w))
      .filter(col("cum_cost") <= budget)
  }

  /** Exactly-k WEIGHTED sample without replacement (Efraimidis-Spirakis
    * 2006, exponential-race form): each row draws a deterministic
    * md5-uniform u and races with key `-ln(u) / w`; the k smallest keys
    * are a without-replacement sample where inclusion tracks weight —
    * "sample 1M documents ∝ quality score" as one TakeOrdered. The same
    * trick D44's Gumbel top-k uses for importance resampling, exposed
    * as the general operator.
    *
    * Scale: a narrow map plus TakeOrderedAndProject — per-partition
    * k-heaps, the driver merges partitions × k rows, no global sort, no
    * shuffle of the corpus. Deterministic in (key, salt): re-runs and
    * audits reproduce the exact sample. Non-positive weights are
    * excluded (they can never win a race; documents to drop should be
    * filtered, not zero-weighted). */
  def weightedSampleK(
      df: DataFrame, key: Column, weight: Column, k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__race"),
      "weightedSampleK reserves column '__race'; rename the input column")
    val u = (hashBucket(key, salt).cast("double") + lit(0.5)) / lit(M.toDouble)
    df.filter(weight > 0)
      .withColumn("__race", -log(u) / weight)
      .orderBy(col("__race").asc, key.asc)
      .limit(k)
      .drop("__race")
  }

  /** Sort key for a deterministic per-epoch global reshuffle of
    * training data: md5 of (epoch ‖ id). Same (epoch, corpus) always
    * exports the same order on any cluster layout; different epochs
    * decorrelate completely (a fresh permutation per epoch — the
    * training-order requirement data loaders usually fake with seeded
    * RNG state that does NOT survive re-sharding). */
  def epochShuffleKey(id: Column, epoch: Long): Column =
    md5(concat(lit(s"$epoch:"), id.cast("string")))

  /** The corpus in epoch order: one range-partitioned distributed sort
    * on the hash key (Spark's standard sort — sampled range exchange +
    * per-partition sort, NO single-partition rank window; downstream
    * sequential readers consume partitions in order). Compose with
    * [[graft.operators.Packing.packSequences]] for epoch-stable packed
    * training shards. */
  def epochShuffle(df: DataFrame, id: Column, epoch: Long): DataFrame = {
    require(!df.columns.contains("__ek"),
      "epochShuffle reserves column '__ek'; rename the input column")
    df.withColumn("__ek", epochShuffleKey(id, epoch))
      .orderBy(col("__ek"))
      .drop("__ek")
  }
}
