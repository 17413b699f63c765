package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy risk audit for training/analytics corpora — the structural
  * counterpart to [[graft.text.Redact]]'s pattern-level PII scrubbing:
  * redaction removes identifiers INSIDE values, but a row whose
  * quasi-identifier COMBINATION (zip × age × segment) is near-unique
  * re-identifies its subject even with every direct identifier gone
  * (Sweeney's k-anonymity). The audit answers "how many rows are in
  * groups smaller than k" before a corpus ships.
  *
  * Scale: the whole audit is ONE partial-aggregating shuffle on the
  * quasi-identifier key (plus a distinct expansion when l-diversity is
  * requested) — the counts table is |distinct combinations|, corpus
  * rows never move twice. Row-level annotation adds one hash join of
  * the corpus against that (much smaller) counts table; never a window
  * over the quasi key (a dominant combination would be one unsplittable
  * task — the same Zipf discipline as A20's domain cap).
  */
object Privacy {

  private def grouped(df: DataFrame, quasi: Seq[Column], sensitive: Option[Column]): DataFrame = {
    require(quasi.nonEmpty, "at least one quasi-identifier column is required")
    val keys = quasi.zipWithIndex.map { case (c, i) => c.as(s"__q$i") }
    val base = sensitive match {
      case Some(sens) =>
        df.groupBy(keys: _*)
          .agg(count(lit(1)).as("group_size"),
            count_distinct(sens).as("l_diversity"))
      case None =>
        df.groupBy(keys: _*).agg(count(lit(1)).as("group_size"))
    }
    base
  }

  /** One-row corpus audit: total rows, distinct quasi-identifier
    * groups, the smallest group, groups/rows below `k`, and (when a
    * `sensitive` column is given) the minimum l-diversity — the
    * smallest number of distinct sensitive values inside any group
    * (a k-anonymous group with ONE sensitive value still leaks it;
    * Machanavajjhala's l-diversity). */
  def kAnonymityAudit(
      df: DataFrame,
      quasi: Seq[Column],
      k: Int,
      sensitive: Option[Column] = None): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val g = grouped(df, quasi, sensitive)
    val lMin =
      if (sensitive.isDefined) min(col("l_diversity")).cast("long")
      else lit(null).cast("long")
    g.agg(
      lit(k).as("k"),
      sum(col("group_size")).cast("long").as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("group_size")).as("min_group_size"),
      sum(when(col("group_size") < k, 1L).otherwise(0L)).cast("long").as("n_risky_groups"),
      sum(when(col("group_size") < k, col("group_size")).otherwise(0L)).cast("long")
        .as("n_rows_at_risk"),
      (sum(when(col("group_size") < k, col("group_size")).otherwise(0L)) /
        sum(col("group_size"))).as("risk_share"),
      lMin.as("min_l_diversity"))
  }

  /** The offending quasi-identifier combinations themselves (size < k),
    * smallest (most identifying) first — the worklist for generalizing
    * or suppressing before release. `topN` bounds the pull. */
  def riskyGroups(df: DataFrame, quasi: Seq[Column], k: Int, topN: Int = 100): DataFrame = {
    require(k >= 2 && topN > 0)
    val g = grouped(df, quasi, None)
    val keyCols = quasi.indices.map(i => col(s"__q$i"))
    g.filter(col("group_size") < k)
      .orderBy((col("group_size").asc +: keyCols.map(_.asc)): _*)
      .limit(topN)
  }

  /** Row-level annotation: every input row plus its quasi-group size
    * and an `at_risk` flag — the form a suppression/generalization pass
    * consumes. Null quasi values group together (SQL GROUP BY
    * semantics), so the join back is null-safe by construction. */
  def annotateKAnonymity(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame = {
    require(k >= 2)
    val g = grouped(df, quasi, None)
    val cond = quasi.zipWithIndex
      .map { case (c, i) => c <=> col(s"__q$i") }
      .reduce(_ && _)
    df.join(g, cond, "left")
      .drop(quasi.indices.map(i => s"__q$i"): _*)
      .withColumn("at_risk", col("group_size") < k)
  }
}
