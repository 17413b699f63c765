package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for inner equi-join views — the
  * delta-rule algebra (Blakeley et al. 1986; DBSP/differential-dataflow
  * in its modern form): keep a materialized `A ⋈ B` current under
  * inserts/deletes WITHOUT re-joining the full tables,
  *
  * `Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB`
  *
  * with SIGNED multiplicities: a delta row carries `__mult` (+1 insert,
  * −1 delete; an update is delete+insert), products multiply signs, and
  * applying a delta is a multiset sum that drops rows reaching zero.
  * The three delta joins are keyed on the join key like the view itself
  * — their cost scales with |Δ| · matched rows, not |A| · |B|: a daily
  * 0.1% delta against a 100 TB view costs 0.1%-scale joins plus a
  * collapse on the touched rows. Pairs with A16 (upsert = the delta
  * FEED), C25 (aggregate-state IVM — this is its join sibling), and E9
  * (streaming CDC as the delta source).
  *
  * Contracts: join keys are same-named on both sides; non-key columns
  * are disjoint (the view's schema is the concatenation); deltas must
  * be consistent (deleting a row that is not in the view leaves a
  * negative multiplicity, surfaced by [[applyDelta]]'s `strict` mode
  * rather than silently clamped).
  */
object ViewMaintenance {

  private def withMult(df: DataFrame): DataFrame =
    if (df.columns.contains("__mult")) df else df.withColumn("__mult", lit(1L))

  private def multJoin(x: DataFrame, y: DataFrame, keys: Seq[String]): DataFrame =
    x.withColumnRenamed("__mult", "__ma")
      .join(y.withColumnRenamed("__mult", "__mb"), keys)
      .withColumn("__mult", col("__ma") * col("__mb"))
      .drop("__ma", "__mb")

  /** The signed delta of the view `A ⋈ B` (inner, on `keys`) given both
    * sides' old states and deltas. Any of the deltas may be empty.
    * Output schema = view schema + `__mult`. */
  def joinDelta(
      aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "join keys required")
    require(dA.columns.contains("__mult") && dB.columns.contains("__mult"),
      "deltas must carry __mult (+1 insert, -1 delete)")
    val aCols = aOld.columns.filterNot(keys.contains).toSet
    val bCols = bOld.columns.filterNot(keys.contains).toSet
    require((aCols intersect bCols).isEmpty,
      s"non-key columns must be disjoint, both sides have: ${aCols intersect bCols}")
    multJoin(dA, withMult(bOld), keys)
      .unionByName(multJoin(withMult(aOld), dB, keys))
      .unionByName(multJoin(dA, dB, keys))
  }

  /** Apply a signed delta to a materialized multiset view: group by the
    * full row, sum multiplicities, expand survivors. `strict = true`
    * (default) fails the job on a negative final multiplicity — a
    * delete that matched nothing, i.e. the delta feed and the view
    * disagree — instead of silently clamping the corruption away. */
  def applyDelta(view: DataFrame, delta: DataFrame, strict: Boolean = true): DataFrame = {
    val cols = view.columns.toSeq
    require(delta.columns.toSet == (cols :+ "__mult").toSet,
      s"delta schema must be view schema + __mult; got ${delta.columns.toSeq}")
    val collapsed = withMult(view).unionByName(delta)
      .groupBy(cols.map(col): _*)
      .agg(sum("__mult").as("__m"))
    val checked =
      if (strict)
        collapsed.withColumn("__m",
          when(col("__m") < 0, raise_error(concat(
            lit("IVM inconsistency: negative multiplicity for row key "),
            col(cols.head).cast("string")))).otherwise(col("__m")))
      else collapsed
    checked.filter(col("__m") > 0)
      .withColumn("__i", explode(sequence(lit(1L), col("__m"))))
      .drop("__m", "__i")
  }

  /** Convenience: the refreshed view in one call. */
  def refreshJoinView(
      view: DataFrame,
      aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame,
      keys: Seq[String]): DataFrame =
    applyDelta(view, joinDelta(aOld, dA, bOld, dB, keys))

  /** Maintain a GROUPED-AGGREGATE view (`count` + sums) under a signed
    * delta — the aggregate sibling of [[refreshJoinView]] and the
    * deletion-capable corner [[graft.operators.AggState]] leaves open
    * (C25 merges append-only partial states; this RETRACTS):
    * count' = count + Σ mult, sum' = sum + Σ mult·value, per key.
    * Groups reaching count 0 vanish; a negative count (a delete the
    * view never absorbed) fails loudly, as [[applyDelta]] does.
    *
    * Only works for aggregates with an inverse (count/sum/avg-as-
    * sum÷count); min/max/distinct need full per-group state under
    * deletes — keep those in C25's merge-only regime or recompute.
    * Cost: one |Δ|-scale partial aggregate + a keyed outer join touching
    * only the view rows whose keys appear in the delta (at 100 TB the
    * join is the view's own key partitioning; nothing rescans facts).
    *
    * `view` schema: keys ++ (`n` :: sums columns); `delta` schema:
    * keys ++ sums value columns ++ `__mult`. */
  def refreshAggView(
      view: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      strict: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "group keys required")
    require(delta.columns.contains("__mult"), "delta must carry __mult")
    require(view.columns.toSet == (keys ++ ("n" +: sums)).toSet,
      s"view schema must be keys + n + $sums; got ${view.columns.toSeq}")
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum("__mult").as("__dn"),
        sums.map(c => sum(col(c) * col("__mult")).as(s"__d_$c")): _*)
    val merged = view.join(dAgg, keys, "full_outer")
      .withColumn("__n2", coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
    val checked =
      if (strict)
        merged.withColumn("__n2",
          when(col("__n2") < 0, raise_error(concat(
            lit("IVM inconsistency: negative count for group "),
            col(keys.head).cast("string")))).otherwise(col("__n2")))
      else merged
    val sumCols = sums.map(c =>
      (coalesce(col(c), lit(0.0)) + coalesce(col(s"__d_$c"), lit(0.0))).as(c))
    checked.filter(col("__n2") > 0)
      .select((keys.map(col) :+ col("__n2").as("n")) ++ sumCols: _*)
  }
}
