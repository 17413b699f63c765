package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond plain select/join/agg: windowed top-k,
  * sessionization, time bucketing, pivot. All are expressed as logical
  * plans (window functions / pivot over groupBy) so Catalyst keeps
  * partial aggregation, AQE, and codegen.
  */
object Relational {

  /** Event-time → epoch microseconds, accepting BOTH timestamp flavors
    * (`TIMESTAMP` and `TIMESTAMP_NTZ`). `unix_micros` only accepts
    * session-TZ `TimestampType`, so an NTZ column (what parquet
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) scans produce) would fail
    * analysis with DATATYPE_MISMATCH; the cast reinterprets NTZ
    * wall-clock in the session TZ (UTC here — instant-preserving) and is
    * the identity on an already-LTZ column. Defense in depth behind
    * [[graft.Tables.events]]'s normalization: time operators stay correct
    * even on frames that bypassed the loader. */
  def epochMicros(ts: Column): Column =
    unix_micros(ts.cast(org.apache.spark.sql.types.TimestampType))

  /** Top-k rows per group via `row_number` (rank column kept as `rn` —
    * a RESERVED output name; inputs already containing it are rejected
    * rather than silently overwritten).
    * One shuffle on the partition keys; ranking is within-partition. */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    require(!df.columns.contains("rn"),
      "topKPerGroup reserves output column 'rn'; rename the input column")
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** Gap-based sessionization: a new session starts when the gap from the
    * previous event of the same entity exceeds `gapSeconds`.
    *
    * Classic lag + running-sum-of-boundaries formulation: exactly one
    * shuffle on `entity`; both window functions share that partitioning,
    * so the plan shape is identical at any scale. `orderTieBreak` must
    * make the per-entity ordering total (unique) for determinism.
    * Output columns `session_id` and `__us` (event-time micros, consumed
    * by [[sessionStats]]) are RESERVED; inputs already containing them
    * are rejected rather than silently overwritten.
    * Streaming equivalent: [[graft.streaming.StreamOps.sessionize]].
    */
  def sessionize(
      df: DataFrame,
      entity: Column,
      ts: Column,
      gapSeconds: Long,
      orderTieBreak: Seq[Column]): DataFrame = {
    Seq("session_id", "__us").foreach(c => require(!df.columns.contains(c),
      s"sessionize reserves output column '$c'; rename the input column"))
    val order = ts.asc +: orderTieBreak.map(_.asc)
    val w = Window.partitionBy(entity).orderBy(order: _*)
    val us = epochMicros(ts)
    val prevUs = lag(us, 1).over(w)
    val isNew = when(prevUs.isNull || (us - prevUs) > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__us", us)
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
  }

  /** Session-level rollup from [[sessionize]] output. */
  def sessionStats(sessions: DataFrame, entity: Column): DataFrame =
    sessions.groupBy(entity, col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("__us")) - min(col("__us"))) / lit(1000000L)).cast("long").as("duration_sec"))

  /** Tumbling event-time bucket aggregation — the batch mirror of a
    * Structured Streaming windowed aggregation (same `window()` grouping
    * works under `readStream`). Bucket start is formatted as a string so
    * results are engine-portable. */
  def timeBucketAgg(df: DataFrame, ts: Column, bucket: String, groupBy: Seq[Column], value: Column): DataFrame =
    df.groupBy(window(ts, bucket).getField("start").as("bucket_ts") +: groupBy: _*)
      .agg(count(lit(1)).as("n"), round(sum(value), 4).as("sum_value"))
      .withColumn("bucket_start", date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss"))
      .drop("bucket_ts")

  /** As-of join: attach to each left row the most recent right row (by
    * event time, at-or-before) with the same key — the canonical
    * point-in-time enrichment (latest price for a trade, last view
    * before a purchase) that plain SQL can only express as a range join.
    *
    * Spark has no native as-of join, and the naive formulation
    * (`l JOIN r ON key AND r.ts <= l.ts` + max-per-row) explodes to
    * O(|matches per key|²) rows before aggregating. This operator uses
    * the union trick instead: tag both sides, union them, and take a
    * running `last(value, ignoreNulls)` per key ordered by (ts, side) —
    * right rows sort before left rows at equal timestamps, so "at or
    * before" is exact. ONE shuffle on the key, zero row amplification,
    * identical plan shape at any scale.
    *
    * `rightVals` are the right-side columns to carry (emitted as
    * `asof_<name>`); right rows must be unique per (key, ts) —
    * pre-aggregate if not, or the carried value is ill-defined. The
    * carried columns travel as ONE struct, so the output is always a
    * consistent single right ROW — per-column running lasts would mix
    * values from different rows whenever a carried value is null.
    *
    * NULL keys follow equi-join semantics: null-key RIGHT rows are
    * dropped (they can match nothing), and null-key LEFT rows pass
    * through with null `asof_*` columns. Without the filter, window
    * partitioning would group both sides' null keys together and
    * "match" them — diverging from every SQL engine's ASOF JOIN.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    (Seq("__side", "__k", "__ts", "__r") ++ rightVals.map(c => s"asof_$c")).foreach(c =>
      require(!leftCols.contains(c), s"asOfJoin reserves column '$c'; rename the input column"))
    val rStructType = org.apache.spark.sql.types.StructType(rightVals.map(c => right.schema(c)))
    val l = left
      .withColumn("__side", lit(1))
      .select(col(key).as("__k") +: col(ts).as("__ts") +: col("__side") +:
        leftCols.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)
    val r = right
      .filter(col(key).isNotNull) // equi semantics: null keys match nothing
      .withColumn("__side", lit(0))
      .select(col(key).as("__k") +: col(ts).as("__ts") +: col("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy("__k").orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col("__last_r").getField(c).as(s"asof_$c")): _*)
  }

  /** Nearest-event join: attach to each left row the right row with the
    * same key whose event time is CLOSEST in either direction —
    * [[asOfJoin]]'s two-sided sibling (match a trade to the nearest
    * quote, an incident to the nearest deploy, a purchase to the
    * nearest error). Exact-distance ties prefer the earlier (backward)
    * match, so the at-or-before semantics of asOfJoin are a subset.
    *
    * Same union trick, ONE key shuffle, zero row amplification: both
    * candidate windows (trailing `last(right, ignoreNulls)` and leading
    * `first(right, ignoreNulls)`) share one partitioning AND one
    * ordering, so they evaluate in a single WindowExec with two frames.
    * The right rows' event time rides inside the carried struct
    * (`__rus`), which is what makes the closer-side election a pure
    * projection instead of a second pass.
    *
    * `maxGapSeconds` bounds |Δt| symmetrically: a candidate farther
    * than the gap is treated as absent (nearest_* null) — without it,
    * a years-stale match would silently "enrich" a row.
    *
    * Contracts shared with asOfJoin: right rows unique per (key, ts)
    * (pre-aggregate if not), null-key right rows match nothing,
    * null-key left rows pass through unmatched. Emits `nearest_<col>`
    * per carried column plus `nearest_dt_sec` (right − left, signed:
    * negative = the match precedes the row). */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightVals: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    (Seq("__side", "__k", "__ts", "__r", "__back", "__fwd", "nearest_dt_sec") ++
      rightVals.map(c => s"nearest_$c")).foreach(c =>
      require(!leftCols.contains(c), s"nearestJoin reserves column '$c'; rename the input column"))
    maxGapSeconds.foreach(g => require(g > 0, s"maxGapSeconds must be positive, got $g"))
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rus", org.apache.spark.sql.types.LongType)
        +: rightVals.map(c => right.schema(c)))
    val l = left
      .withColumn("__side", lit(1))
      .select(col(key).as("__k") +: col(ts).as("__ts") +: col("__side") +:
        leftCols.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)
    val r = right
      .filter(col(key).isNotNull)
      .withColumn("__side", lit(0))
      .select(col(key).as("__k") +: col(ts).as("__ts") +: col("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(epochMicros(col(ts)).as("__rus") +: rightVals.map(col): _*).as("__r"): _*)
    val order = Seq(col("__ts").asc, col("__side").asc)
    val wb = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val combined = l.unionByName(r)
      .select(col("*"),
        last(col("__r"), ignoreNulls = true).over(wb).as("__back"),
        first(col("__r"), ignoreNulls = true).over(wf).as("__fwd"))
      .filter(col("__side") === 1)
    val us = epochMicros(col("__ts"))
    val dtb = col("__back").getField("__rus") - us // <= 0
    val dtf = col("__fwd").getField("__rus") - us  // > 0
    val gapUs = maxGapSeconds.map(_ * 1000000L)
    val backOk = col("__back").isNotNull && gapUs.map(g => -dtb <= g).getOrElse(lit(true))
    val fwdOk = col("__fwd").isNotNull && gapUs.map(g => dtf <= g).getOrElse(lit(true))
    val useBack = backOk && (!fwdOk || (-dtb) <= dtf) // tie → backward
    val chosen = when(useBack, col("__back")).when(fwdOk, col("__fwd"))
    val dt = when(useBack, dtb).when(fwdOk, dtf)
    combined.select(leftCols.map(col) ++
      rightVals.map(c => chosen.getField(c).as(s"nearest_$c")) :+
      (dt / lit(1000000.0)).as("nearest_dt_sec"): _*)
  }

  /** Event-time moving aggregate per entity: count and average of
    * `value` over the trailing `windowSeconds` at each event (RANGE
    * frame over event-time micros, so simultaneous events share one
    * frame and the result is order-independent under timestamp ties).
    * One shuffle on the entity — the same plan shape as sessionize. */
  def movingAgg(
      df: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      windowSeconds: Long): DataFrame = {
    Seq("moving_n", "moving_avg").foreach(c => require(!df.columns.contains(c),
      s"movingAgg reserves output column '$c'; rename the input column"))
    val w = Window.partitionBy(entity).orderBy(epochMicros(ts))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    df.withColumn("moving_n", count(value).over(w))
      .withColumn("moving_avg", avg(value).over(w))
  }

  /** Range (interval-containment) join without a cartesian: match each
    * point row to every range row with `start <= point <= end`.
    *
    * A naive non-equi join degenerates to BroadcastNestedLoopJoin (or a
    * cartesian) — O(points × ranges). Binning makes it an EQUI-join:
    * each point keys by its `floor(point / binWidth)` bin, each range
    * explodes to the bins it covers, and the join on the bin key
    * shuffles both sides by bin — O(points + Σ range_span/binWidth)
    * rows, exact containment re-checked post-join. Each (point, range)
    * pair meets in exactly ONE bin (the point's), so no dedup pass is
    * needed. Pick `binWidth` near the typical range length: one or two
    * bins per range, a handful of candidate ranges per point.
    *
    * Ranges with `end < start` are dropped (they match nothing by
    * definition, and `sequence` would mis-generate descending bins).
    * Column `__bin` is RESERVED (consumed internally) — inputs already
    * containing it are rejected rather than silently overwritten;
    * point/range column names must not collide (standard join-input
    * contract). */
  def rangeJoin(
      points: DataFrame,
      ranges: DataFrame,
      point: Column,
      start: Column,
      end: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") && !ranges.columns.contains("__bin"),
      "rangeJoin reserves column '__bin'; rename the input column")
    val p = points.withColumn("__bin", floor(point / binWidth).cast("long"))
    val r = ranges.filter(end >= start)
      .withColumn("__bin",
        explode(sequence(floor(start / binWidth).cast("long"), floor(end / binWidth).cast("long"))))
    p.join(r, "__bin")
      .filter(point >= start && point <= end)
      .drop("__bin")
  }

  /** Interval-OVERLAP join without a cartesian: match every left
    * interval `[lStart, lEnd]` to every right interval `[rStart, rEnd]`
    * that overlaps it (`lStart <= rEnd && rStart <= lEnd`, closed ends).
    *
    * [[rangeJoin]]'s binning generalized to interval×interval: BOTH
    * sides explode to the bins they cover and meet on the bin equi-key,
    * so the shuffle is bin-keyed — O(Σ span/binWidth) exploded rows,
    * never |L|·|R|. An overlapping pair shares every bin of the
    * overlap region, so a naive bin join duplicates it; instead of a
    * `distinct` (a second full-width shuffle) each pair is kept only in
    * its CANONICAL bin — the bin of `greatest(lStart, rStart)`, the
    * overlap's left edge, which both sides always cover — making the
    * output exactly once per pair with zero dedup pass. Exact overlap
    * is re-checked post-join, so bin-edge coincidences cannot
    * over-match. Pick `binWidth` near the typical interval length;
    * degenerate inputs (`end < start`) are dropped as in [[rangeJoin]].
    * At 100 TB the bin key is near-uniform for near-uniform interval
    * layouts; a single giant interval (covering many bins) replicates
    * itself, not the other side — AQE skew-split absorbs a hot bin. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: Column, lEnd: Column,
      rStart: Column, rEnd: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "intervalJoin reserves column '__bin'; rename the input column")
    def explodeBins(df: DataFrame, s: Column, e: Column): DataFrame =
      df.filter(e >= s).withColumn("__bin",
        explode(sequence(floor(s / binWidth).cast("long"), floor(e / binWidth).cast("long"))))
    explodeBins(left, lStart, lEnd)
      .join(explodeBins(right, rStart, rEnd), "__bin")
      .filter(lStart <= rEnd && rStart <= lEnd &&
        col("__bin") === floor(greatest(lStart, rStart) / binWidth).cast("long"))
      .drop("__bin")
  }

  /** 2-D radius (spatial distance) join: every (left, right) pair with
    * euclidean distance ≤ `radius` — the proximity join (store ↔
    * customer, sensor ↔ asset, point-cloud neighbors) that naively is
    * a cartesian with a `sqrt` filter.
    *
    * Grid-cell binning makes it an equi-join: the plane is tiled into
    * `cellSize`-square cells; each LEFT point keys by its own cell,
    * each RIGHT point replicates to its 3×3 cell neighborhood, and the
    * join on the cell id shuffles both sides grid-locally. With
    * `cellSize ≥ radius` (enforced) any pair within `radius` differs by
    * at most one cell per axis, so the left point's own cell always
    * sees the right point's replica — each qualifying pair meets
    * EXACTLY once (the [[rangeJoin]] no-dedup discipline: the left side
    * never replicates) and the exact distance is re-checked post-join.
    * Right-side replication is a constant 9×; pick `cellSize` ≈ the
    * radius so candidate cells hold few strangers. Skewed hot cells
    * (urban cores) are AQE-splittable like any hot equi-key. */
  def radiusJoin2D(
      left: DataFrame, right: DataFrame,
      lx: Column, ly: Column,
      rx: Column, ry: Column,
      radius: Double, cellSize: Double): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(cellSize >= radius,
      s"cellSize ($cellSize) must be >= radius ($radius) for 3x3-neighborhood completeness")
    require(!left.columns.contains("__cell") && !right.columns.contains("__cell"),
      "radiusJoin2D reserves column '__cell'; rename the input column")
    def cellOf(x: Column, y: Column): Column =
      concat_ws(":", floor(x / cellSize).cast("long"), floor(y / cellSize).cast("long"))
    val l = left.withColumn("__cell", cellOf(lx, ly))
    val r = right.withColumn("__cell", explode(array((for {
      dx <- -1 to 1; dy <- -1 to 1
    } yield concat_ws(":",
        (floor(rx / cellSize) + dx).cast("long"),
        (floor(ry / cellSize) + dy).cast("long"))): _*)))
    l.join(r, "__cell")
      .filter((lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= radius * radius)
      .drop("__cell")
  }

  /** Wide→long reshape — pandas `melt` / ANSI `UNPIVOT`: each input row
    * becomes one row per entry of `values`, keyed by the `ids` columns
    * plus a `varName` label column. The inverse of the C7 pivot, and
    * the step every metrics sink ("one row per (entity, metric_name,
    * metric_value)") needs in front of it.
    *
    * Planned as Spark's native `Expand` (one Generate-like narrow map
    * emitting k rows per input row) — NO shuffle, NO join, pure row
    * amplification local to the scan partition, so it scales to any
    * corpus width×depth; the k× output volume is the semantics, not a
    * plan defect. Value columns are promoted to their least common type
    * by the engine (int + double → double); incompatible mixes fail at
    * analysis, not silently. `dropNulls = true` drops rows whose
    * measure is null (pandas-melt-with-dropna), applied AFTER the
    * reshape so a null in one measure never suppresses its siblings. */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
      varName: String = "variable", valueName: String = "value",
      dropNulls: Boolean = false): DataFrame = {
    require(values.nonEmpty, "melt needs at least one value column")
    require(!(ids ++ values).contains(varName) && !(ids ++ values).contains(valueName),
      s"melt output columns '$varName'/'$valueName' collide with an input column")
    val out = df.unpivot(ids.map(col).toArray, values.map(col).toArray,
      varName, valueName)
    if (dropNulls) out.filter(col(valueName).isNotNull) else out
  }

  /** Salted equi-join for skewed keys when the build side cannot
    * broadcast: each fact row gets a deterministic salt in [0, nSalts)
    * (hash of the whole row — no RNG, reproducible), the dim side
    * replicates ×nSalts, and the join keys on (key, salt) — a hot key's
    * rows spread over nSalts tasks instead of one straggler. Output is
    * exactly the plain join's.
    *
    * Use when AQE skew splitting does not apply (e.g. the skew is in a
    * subsequent aggregation, or a deterministic pre-planned layout is
    * required); cost is ×nSalts replication of the dim side. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves column '__salt'; rename the input column")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(nSalts.toLong)))
    val d = dim.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Pivot with an explicit value list. Passing `values` explicitly keeps
    * the plan single-pass at scale (no extra distinct-collect job) and
    * makes output columns deterministic. */
  def pivotAgg(df: DataFrame, groupBy: Column, pivotCol: String, values: Seq[String], measure: Column): DataFrame = {
    val pivoted = df.groupBy(groupBy).pivot(pivotCol, values).agg(sum(measure))
    values.foldLeft(pivoted)((d, v) => d.withColumn(v, round(coalesce(col(v), lit(0.0)), 4)))
  }

  /** Time-weighted average per entity (TWAP): each observation's value
    * holds until the entity's NEXT observation, so the average weights
    * by holding duration instead of observation count — the correct
    * summary for irregularly sampled series (prices, sensor states,
    * feature values), where a plain `avg` over-weights chatty periods.
    * The last observation has no duration and contributes only to
    * `n_obs`; single-observation entities get a null `twap`.
    *
    * One shuffle on the entity; `lead` + the final aggregate share the
    * partitioning (the C10/C14 window discipline). `tieBreak` makes
    * same-timestamp ordering deterministic (zero-duration rows drop out
    * of the sum either way, but the oracle needs a pinned order). */
  def timeWeightedAvg(
      df: DataFrame, entity: Column, ts: Column, value: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col("__e")).orderBy(col("__us") +: tieBreak.map(_.asc): _*)
    df.select(Seq(entity.as("__e"), epochMicros(ts).as("__us"), value.as("__v"))
        ++ tieBreak: _*)
      .withColumn("__dur", lead(col("__us"), 1).over(w) - col("__us"))
      .groupBy(col("__e").as("entity"))
      .agg(count(lit(1)).as("n_obs"),
        round(sum(col("__v") * col("__dur")) / sum(col("__dur")), 4).as("twap"))
  }

  /** Point-in-time (validity-interval) join: attach to each fact row the
    * dimension version whose `[valid_from, valid_to)` interval contains
    * the fact's timestamp — the fact-side consumer of an SCD2 dimension
    * ([[graft.etl.Scd]]): "what was this entity's state when the event
    * happened", not "what is it today".
    *
    * A direct non-equi join (`key = key AND valid_from <= ts AND
    * (valid_to IS NULL OR ts < valid_to)`) plans as a
    * BroadcastNestedLoopJoin once the dimension outgrows the broadcast
    * threshold — O(facts × versions). Instead this reuses [[asOfJoin]]'s
    * union+window machinery (one shuffle on the key, versions interleave
    * with facts inside each key's sorted partition), then invalidates
    * matches that fall AT or AFTER the matched version's `valid_to` —
    * which only happens when the dimension has holes (retired keys,
    * tombstoned intervals); in a gap-free SCD2 dimension the latest
    * version at-or-before `ts` is always the containing one.
    *
    * Boundary semantics match SQL `BETWEEN valid_from AND valid_to`
    * half-open: a fact exactly at `valid_from` matches the NEW version
    * (asOfJoin orders right rows before same-timestamp left rows); a
    * fact exactly at a closed `valid_to` does not match that version.
    * Facts before the key's first version, with no key match, or inside
    * a hole get null `pit_*` columns. Timestamp comparison goes through
    * [[epochMicros]], so NTZ and LTZ fact/dimension flavors mix freely.
    *
    * Output: every fact column, plus `pit_<attr>` for each `attrCols`.
    */
  def pointInTimeJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      factTs: String,
      attrCols: Seq[String],
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val factCols = facts.columns
    attrCols.map(c => s"pit_$c").foreach(c => require(!factCols.contains(c),
      s"pointInTimeJoin reserves output column '$c'; rename the fact column"))
    val carried = attrCols :+ validTo
    val right = dim.select(col(key) +: col(validFrom).as(factTs) +: carried.map(col): _*)
    val joined = asOfJoin(facts, right, key = key, ts = factTs, rightVals = carried)
    val inInterval = col(s"asof_$validTo").isNull ||
      epochMicros(col(factTs)) < epochMicros(col(s"asof_$validTo"))
    joined.select(factCols.map(col) ++
      attrCols.map(c => when(inInterval, col(s"asof_$c")).as(s"pit_$c")): _*)
  }
}
