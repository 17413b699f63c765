package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable keyed aggregate STATE — incremental view maintenance for
  * the distributive/algebraic aggregates: per key, row count plus
  * (non-null count, sum, min, max) for each value column, with mean
  * derived at read time from sum/count. The defining property, spec-
  * and oracle-proven: `state(a ∪ b) = merge(state(a), state(b))` —
  * so a 100 TB corpus aggregates as independent slice jobs (or daily
  * delta batches) whose small state tables merge exactly, and the
  * full input is never re-scanned. [[graft.text.CorpusProfile]]'s
  * mergeable-card discipline generalized to arbitrary keyed
  * aggregates on any table; the sketch-backed non-algebraic cousins
  * (distinct = HLL, quantiles = KLL) live in [[Sketches]] and compose
  * by joining on the same keys.
  *
  * Plan shape: building state is ONE partial-aggregating `groupBy` —
  * the shuffle carries a state row per (key, slice), not raw rows;
  * merging re-aggregates state tables whose size is the key
  * cardinality, independent of the data volume that produced them.
  * Nulls follow SQL aggregate semantics: sum/min/max ignore nulls,
  * `cnt_<c>` counts non-nulls (so merged means stay exact), an
  * all-null group carries null sum/min/max and cnt 0.
  */
object AggState {

  private def stateCols(valueCols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +: valueCols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"), sum(col(c)).as(s"sum_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }

  /** Aggregate state of `df` per `keys`. */
  def state(df: DataFrame, keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty, "need keys and value columns")
    val cs = stateCols(valueCols)
    df.groupBy(keys.map(col): _*).agg(cs.head, cs.tail: _*)
  }

  /** Exact merge of state tables built with the same keys/valueCols:
    * counts and sums add, mins/maxs fold. Associative + commutative,
    * so any merge tree (pairwise, daily rollups, fleet reduce) yields
    * the identical table. */
  def merge(states: Seq[DataFrame], keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    mergeRows(states.reduce(_ unionByName _), keys, valueCols)
  }

  /** [[merge]] over state rows already in ONE DataFrame — e.g. a
    * parquet state directory whose `batch=<epoch>` partitions each
    * hold one slice's state (the streaming maintenance layout). */
  def mergeRows(stateRows: DataFrame, keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val merged = sum("n_rows").as("n_rows") +: valueCols.flatMap { c =>
      Seq(sum(s"cnt_$c").as(s"cnt_$c"), sum(s"sum_$c").as(s"sum_$c"),
        min(s"min_$c").as(s"min_$c"), max(s"max_$c").as(s"max_$c"))
    }
    stateRows.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }

  /** Fold a new RAW batch into an existing state table: aggregate the
    * batch (one shuffle over batch rows only), then state-merge — the
    * persisted-state increment pattern (D21's discipline for
    * aggregates). */
  def applyDelta(state: DataFrame, rawBatch: DataFrame,
                 keys: Seq[String], valueCols: Seq[String]): DataFrame =
    merge(Seq(state, this.state(rawBatch, keys, valueCols)), keys, valueCols)

  /** Read-time finalization: the non-mergeable derived columns
    * (currently `avg_<c>` = sum/cnt, null on cnt 0). */
  def finalizeState(state: DataFrame, valueCols: Seq[String]): DataFrame =
    valueCols.foldLeft(state) { (df, c) =>
      df.withColumn(s"avg_$c",
        when(col(s"cnt_$c") > 0, col(s"sum_$c") / col(s"cnt_$c")))
    }
}
