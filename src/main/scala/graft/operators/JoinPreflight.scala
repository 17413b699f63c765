package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-join cardinality preflight: the exact output size and per-key
  * contribution profile of an inner equi-join WITHOUT running the join.
  *
  * The accidental-quadratic join is the classic cluster-killer — a
  * self-join on a Zipf key (events ⋈ events on user) quietly emits
  * Σ nₗ(k)·nᵣ(k) rows, and one bot user with 10⁷ events contributes
  * 10¹⁴ pairs before the first task finishes. Spark's CBO sees column
  * stats (NDV, histogram bounds) but not exact per-key products;
  * this operator computes them from two per-side key-count aggregates
  * (partial-aggregating shuffles whose OUTPUT is |distinct keys|, not
  * corpus rows) plus one counts-table join — metadata-scale cost, and
  * the answer is EXACT for inner equi-joins, not an estimate: run it
  * in a pipeline gate before the join it forecasts, and route hot keys
  * to the C13 salted path (or cap them upstream like A20) when
  * `max_key_pairs` says a plain hash join would melt.
  *
  * Null keys never match in an equi-join and are excluded (counted in
  * the summary as `n_null_left/right` so dropped volume stays visible).
  */
object JoinPreflight {

  /** (key, n_left, n_right, pairs) for every key present on BOTH
    * sides — `pairs` is that key's exact contribution to the inner
    * equi-join output. */
  def keyContributions(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    val l = left.filter(leftKey.isNotNull)
      .groupBy(leftKey.as("key")).agg(count(lit(1)).as("n_left"))
    val r = right.filter(rightKey.isNotNull)
      .groupBy(rightKey.as("key")).agg(count(lit(1)).as("n_right"))
    l.join(r, "key").withColumn("pairs", col("n_left") * col("n_right"))
  }

  /** The `topN` heaviest keys (ties broken by key) with each key's
    * share of the total join output — the worklist for salting/capping.
    * The total rides in via a one-row broadcast (scalar-carrier), never
    * a global window. */
  def hotKeys(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      topN: Int = 20): DataFrame = {
    require(topN > 0)
    val c = keyContributions(left, leftKey, right, rightKey)
    val total = c.agg(sum(col("pairs")).as("est_total_pairs"))
    c.orderBy(col("pairs").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(total))
      .withColumn("share", col("pairs") / col("est_total_pairs"))
  }

  /** One-row forecast: exact inner-join output rows, matched-key count,
    * the heaviest key's contribution, how many keys exceed
    * `hotThreshold` pairs, the max/mean skew ratio, and the null-key
    * volume an inner join will silently drop. */
  def summary(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      hotThreshold: Long = 1000000L): DataFrame = {
    val c = keyContributions(left, leftKey, right, rightKey)
    val nullL = left.filter(leftKey.isNull).agg(count(lit(1)).as("n_null_left"))
    val nullR = right.filter(rightKey.isNull).agg(count(lit(1)).as("n_null_right"))
    c.agg(
        coalesce(sum(col("pairs")), lit(0L)).as("est_rows"),
        count(lit(1)).as("n_matched_keys"),
        coalesce(max(col("pairs")), lit(0L)).as("max_key_pairs"),
        sum(when(col("pairs") >= hotThreshold, 1L).otherwise(0L)).cast("long")
          .as("n_hot_keys"),
        (max(col("pairs")) / avg(col("pairs"))).as("skew_ratio"))
      .crossJoin(broadcast(nullL))
      .crossJoin(broadcast(nullR))
  }

  /** SKETCH-scale forecast — C42's triage sibling when even the
    * per-key counts tables are too big to want: ONE aggregate per side
    * producing (row count, theta sketch of the key), kilobytes of state
    * regardless of key cardinality, then set-algebra estimates:
    *
    *   keys_match ≈ |θ_L ∩ θ_R|,
    *   est_pairs ≈ keys_match · (n_L/keys_L) · (n_R/keys_R)
    *
    * `est_pairs` assumes per-key multiplicities are roughly uniform and
    * independent of which keys match — a TRIAGE number ("is this join
    * ~n or ~n²?"), exact only in spirit; C42's [[keyContributions]] is
    * the exact instrument once triage says the join is worth auditing.
    * Sketches are deterministic (no RNG): exact below 2^lgK distinct
    * keys, ~1.6% RSE above at the default lgK=12 — with the standard
    * theta caveat that INTERSECTION error scales with the UNION size,
    * so a small overlap of two big key sets carries a large RELATIVE
    * error (|est − exact| ≲ 1.6% · |L ∪ R|, not · |L ∩ R|). */
  def sketchForecast(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      lgK: Int = graft.expressions.ThetaExpressions.DefaultLgK): DataFrame = {
    import graft.expressions.ThetaExpressions.{thetaSketchAgg, thetaEstimate}
    val l = left.filter(leftKey.isNotNull)
      .agg(count(lit(1)).as("n_left"), thetaSketchAgg(leftKey, lgK).as("__sl"))
    val r = right.filter(rightKey.isNotNull)
      .agg(count(lit(1)).as("n_right"), thetaSketchAgg(rightKey, lgK).as("__sr"))
    l.crossJoin(broadcast(r))
      .withColumn("keys_left_est",
        round(thetaEstimate("union", col("__sl"), col("__sl"), lgK)).cast("long"))
      .withColumn("keys_right_est",
        round(thetaEstimate("union", col("__sr"), col("__sr"), lgK)).cast("long"))
      .withColumn("keys_match_est",
        round(thetaEstimate("intersect", col("__sl"), col("__sr"), lgK)).cast("long"))
      .withColumn("est_pairs",
        col("keys_match_est") *
          (col("n_left") / col("keys_left_est")) * (col("n_right") / col("keys_right_est")))
      .drop("__sl", "__sr")
  }
}
