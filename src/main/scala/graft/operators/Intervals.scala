package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval × interval overlap join on a uniform grid — the two-sided
  * sibling of C16's point-in-range binning join. A naive overlap join
  * (`ls < re AND rs < le` with no equi key) plans as a cartesian
  * product; tiling BOTH sides onto fixed-width cells turns it into an
  * equi-join on the cell id: two intervals can only overlap if they
  * share a cell, so the join touches `cells(l) × cells(r)` per cell —
  * local, key-hashed, AQE-splittable — instead of |L|·|R|.
  *
  * Exactly-once without a `distinct`: a pair sharing k cells would
  * surface k times, so each match is kept ONLY in the cell containing
  * `max(ls, rs)` (the first cell where both are live) — a scalar
  * predicate, no dedup shuffle. Intervals are half-open [s, e), s < e
  * (zero-length intervals overlap nothing, matching the sessionize /
  * tumbling-bucket contract).
  *
  * Scale: cells-per-interval = ⌈len/W⌉+1, so W is chosen near the
  * TYPICAL interval length (the C16 sizing rule) — the explode factor
  * stays O(1) while a cell's population stays bounded by concurrent
  * intervals. One giant interval fans out to many cells (rows, not
  * skew — each cell is its own key); one hot cell (a flash-crowd
  * instant) is a join-key hot spot that AQE skew-split handles.
  */
object Intervals {

  /** All (left, right) row pairs whose half-open intervals overlap.
    * Column sets of the two inputs must be disjoint; starts/ends are
    * epoch-scaled longs (microseconds, days — any unit, `cellWidth` in
    * the same unit). Output: left columns ++ right columns. */
  def intervalJoin(left: DataFrame, lStart: Column, lEnd: Column,
                   right: DataFrame, rStart: Column, rEnd: Column,
                   cellWidth: Long): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"input column sets must be disjoint, shared: $dup")
    def cells(s: Column, e: Column): Column =
      sequence(floor(s / cellWidth).cast("long"),
        floor((e - 1) / cellWidth).cast("long"))
    val l = left
      .filter(lStart.isNotNull && lEnd.isNotNull && lStart < lEnd)
      .withColumn("__ls", lStart.cast("long")).withColumn("__le", lEnd.cast("long"))
      .withColumn("__cell", explode(cells(col("__ls"), col("__le"))))
    val r = right
      .filter(rStart.isNotNull && rEnd.isNotNull && rStart < rEnd)
      .withColumn("__rs", rStart.cast("long")).withColumn("__re", rEnd.cast("long"))
      .withColumn("__cell", explode(cells(col("__rs"), col("__re"))))
    l.join(r,
        l("__cell") === r("__cell") &&
          col("__ls") < col("__re") && col("__rs") < col("__le") &&
          l("__cell") === floor(greatest(col("__ls"), col("__rs")) / cellWidth).cast("long"))
      .drop("__cell", "__ls", "__le", "__rs", "__re")
  }

  /** Allen's interval-algebra relation of [ls, le) vs [rs, re) — the 13
    * temporal relations collapsed to their standard names, left-hand
    * perspective ("during" = left inside right; inverses suffixed -inv).
    * Works on any pair; the overlapping subset produced by
    * [[intervalJoin]] can only be one of the 9 non-disjoint ones. */
  def allenRelation(ls: Column, le: Column, rs: Column, re: Column): Column =
    when(le < rs, "before")
      .when(le === rs, "meets")
      .when(ls > re, "after")
      .when(ls === re, "meets-inv")
      .when(ls === rs && le === re, "equal")
      .when(ls === rs && le < re, "starts")
      .when(ls === rs, "starts-inv")
      .when(le === re && ls > rs, "finishes")
      .when(le === re, "finishes-inv")
      .when(ls < rs && le > re, "contains")
      .when(ls > rs && le < re, "during")
      .when(ls < rs, "overlaps")
      .otherwise("overlaps-inv")
}
