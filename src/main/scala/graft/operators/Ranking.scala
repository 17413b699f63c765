package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global order statistics WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is the classic
  * scale trap: Spark plans it as a single-partition window, so one task
  * sorts the entire table — fine at sf0.01, dead at 100 TB. These
  * operators compute the same exact answer with the distributed
  * two-phase scheme (the reference's pandas-style global ranks re-done
  * Spark-first; reference origin: analytics/kpis.py rank tables):
  *
  *  1. `repartitionByRange(order)` + `sortWithinPartitions(order)` —
  *     one range shuffle; every partition holds a contiguous, sorted
  *     slice of the global order.
  *  2. `zipWithIndex` — Spark runs a lightweight count job over the
  *     sorted partitions (reusing the shuffle files — the map stage is
  *     not re-executed), broadcasts the per-partition offsets, and a
  *     narrow map assigns `offset + local index`. No partition ever
  *     materializes more than its slice.
  *
  * The tradeoff vs a window: one extra (cheap, shuffle-reusing) count
  * job and an RDD↔DataFrame boundary at the indexing map — the price of
  * exactness at scale. For percentile-grade answers where exact ranks
  * are not required, prefer `percentile_approx`/KLL (C8d) instead.
  */
object Ranking {

  /** Exact global 1-based rank over `order` (which must be a TOTAL order
    * — include a unique tie-break column — for the result to be
    * deterministic). Output column `as` is appended. Eagerly launches
    * the offset-count job (zipWithIndex semantics). */
  def globalRank(df: DataFrame, order: Seq[Column], as: String = "global_rank",
      numPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains(as),
      s"globalRank reserves output column '$as'; rename the input column")
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = df.schema.add(as, LongType, nullable = false)
    val rdd = ranged.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Exact SQL-standard `ntile(buckets)` over a global order, built on
    * [[globalRank]]: the first `total % buckets` buckets get
    * `total/buckets + 1` rows, the rest `total/buckets` — bit-identical
    * to the window function, without its single-partition sort.
    * Costs one extra `count()` over the input (cheap: count-only scan). */
  def ntileExact(df: DataFrame, order: Seq[Column], buckets: Int,
      as: String = "bucket"): DataFrame = {
    require(buckets > 0, "ntileExact needs buckets > 0")
    require(!df.columns.contains(as),
      s"ntileExact reserves output column '$as'; rename the input column")
    val total = df.count()
    val q = total / buckets
    val r = total % buckets
    val cut = r * (q + 1) // ranks 1..cut live in the (q+1)-sized buckets
    val ranked = globalRank(df, order, "__rank")
    val zeroBased =
      when(col("__rank") <= cut, floor((col("__rank") - 1) / lit(q + 1)))
        .otherwise(lit(r) + floor((col("__rank") - 1 - cut) / lit(math.max(q, 1L))))
    ranked.withColumn(as, (zeroBased + 1).cast("long")).drop("__rank")
  }

  /** Exact distributed RUNNING (prefix) aggregate over a global order —
    * cumulative sum/max/min without the single-partition window trap,
    * and without driver collects: the [[globalRank]] range shuffle
    * gives every partition a contiguous sorted slice; a per-slice
    * prefix window (partitioned by `spark_partition_id()` — parallel)
    * computes local prefixes; slice TOTALS (≤ numShufflePartitions
    * rows) get an exclusive prefix of their own through a bounded
    * global window (the liftTable benign class) and broadcast-join back
    * as per-slice offsets. The ranged subtree feeds both sides of the
    * plan through one ReusedExchange — the corpus is shuffled once.
    *
    * SQL window-frame semantics are preserved exactly: `inclusive =
    * false` is `ROWS UNBOUNDED PRECEDING AND 1 PRECEDING` (empty frame
    * → null), nulls in `value` are skipped by the aggregate. `order`
    * must be a total order (unique tie-break) for determinism; for
    * float sums at scale, pass a decimal-cast `value` — prefix sums
    * group additions differently than a sequential scan, decimals make
    * both exact.
    *
    * COMPOSITION HAZARD: never feed one runningAgg's output into a
    * second runningAgg in the same plan to accumulate a second column.
    * The nested shape defeats the range-exchange reuse this operator's
    * correctness rides on — the two branches then re-execute the range
    * partitioning with independently SAMPLED boundaries, and a
    * different row order upstream (any shuffle join) yields different
    * partition assignments between the branches, silently misaligning
    * slice offsets (measured: the KS-test CDF pair produced a
    * different, wrong D per action until it moved to [[runningSums]]).
    * For multiple prefix columns over one order, use [[runningSums]] —
    * one range exchange, all prefixes in the same window pass. */
  def runningAgg(df: DataFrame, order: Seq[Column], value: Column,
      agg: String = "sum", as: String = "running", inclusive: Boolean = true,
      numPartitions: Int = 0): DataFrame = {
    require(Seq("sum", "max", "min").contains(agg), s"unsupported running agg '$agg'")
    require(!df.columns.contains(as) && !df.columns.exists(_.startsWith("__rg_")),
      s"runningAgg reserves '$as' and '__rg_*' columns; rename the input column")
    val fn: Column => Column = agg match {
      case "sum" => sum; case "max" => max; case "min" => min
    }
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
      .withColumn("__rg_pid", spark_partition_id())
      .withColumn("__rg_v", value)
    val frameEnd = if (inclusive) Window.currentRow else -1L
    val w = Window.partitionBy(col("__rg_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = ranged.withColumn("__rg_local", fn(col("__rg_v")).over(w))
    // slice totals → exclusive prefix over ≤ n rows → per-slice offset
    val wOff = Window.orderBy(col("__rg_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__rg_pid"))
      .agg(fn(col("__rg_v")).as("__rg_t"))
      .withColumn("__rg_off", fn(col("__rg_t")).over(wOff))
      .select(col("__rg_pid"), col("__rg_off"))
    val combined = agg match {
      case "sum" =>
        when(col("__rg_local").isNull && col("__rg_off").isNull, lit(null))
          .otherwise(coalesce(col("__rg_local"), lit(0)) + coalesce(col("__rg_off"), lit(0)))
      case "max" => greatest(col("__rg_local"), col("__rg_off"))
      case "min" => least(col("__rg_local"), col("__rg_off"))
    }
    local.join(broadcast(offsets), Seq("__rg_pid"))
      .withColumn(as, combined)
      .drop("__rg_pid", "__rg_v", "__rg_local", "__rg_off")
  }

  /** Exact SQL `percent_rank()` and `cume_dist()` over a GLOBAL order
    * without the single-partition window — the relative-standing
    * counterparts of [[ntileExact]]: `percent_rank = (rank − 1)/(n − 1)`
    * with rank = the tie group's FIRST position (SQL rank()), and
    * `cume_dist = |rows ≤ key| / n` = the tie group's LAST position
    * over n. Ties are rows with EQUAL `key` (pass a struct for a
    * multi-column key — struct ordering is lexicographic); `tieBreak`
    * completes the total order [[globalRank]] needs without affecting
    * either statistic. One range-shuffled rank pass, one key-level
    * min/max aggregate joined back on the key (partial-aggregating;
    * heavy tie groups combine map-side), one count job. SQL edge
    * semantics preserved: n = 1 → percent_rank 0, cume_dist 1. */
  def percentRanks(df: DataFrame, key: Column, tieBreak: Seq[Column],
      prCol: String = "percent_rank", cdCol: String = "cume_dist"): DataFrame = {
    require(!df.columns.contains(prCol) && !df.columns.contains(cdCol) &&
      !df.columns.exists(_.startsWith("__pr_")),
      s"percentRanks reserves '$prCol', '$cdCol' and '__pr_*'; rename the input column")
    val n = df.count()
    val ranked = globalRank(df.withColumn("__pr_k", key),
      col("__pr_k").asc +: tieBreak, "__pr_rn")
    val bounds = ranked.groupBy(col("__pr_k"))
      .agg(min(col("__pr_rn")).as("__pr_lo"), max(col("__pr_rn")).as("__pr_hi"))
    ranked.join(bounds, Seq("__pr_k"))
      .withColumn(prCol,
        if (n <= 1L) lit(0.0)
        else (col("__pr_lo") - 1).cast("double") / lit((n - 1).toDouble))
      .withColumn(cdCol, col("__pr_hi").cast("double") / lit(n.toDouble))
      .drop("__pr_k", "__pr_rn", "__pr_lo", "__pr_hi")
  }

  /** [[runningAgg]] for SEVERAL summed columns over ONE shared order —
    * the safe form of the nested composition the runningAgg scaladoc
    * forbids: one range exchange, one per-slice window pass computing
    * every local prefix, one bounded offset window over slice totals
    * (all columns in the same ≤-numPartitions-row table), one broadcast
    * join back. `values` maps each summed column to its output name;
    * inclusive SQL frame semantics, null-skipping, and the decimal
    * float-exactness caveat all match [[runningAgg]]. */
  def runningSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)], inclusive: Boolean = true,
      numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "runningSums needs at least one value column")
    val names = values.map(_._2)
    require(names.distinct.size == names.size, s"duplicate output names in $names")
    require(names.forall(n => !df.columns.contains(n)) &&
      !df.columns.exists(_.startsWith("__rg_")),
      s"runningSums reserves ${names.mkString(", ")} and '__rg_*'; rename the input column")
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val vals = values.zipWithIndex.map { case ((c, as), i) => (s"__rg_v$i", c, as) }
    val ranged = vals.foldLeft(
        df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
          .withColumn("__rg_pid", spark_partition_id())) {
      case (acc, (tmp, c, _)) => acc.withColumn(tmp, c)
    }
    val frameEnd = if (inclusive) Window.currentRow else -1L
    val w = Window.partitionBy(col("__rg_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    val local = vals.foldLeft(ranged) { case (acc, (tmp, _, _)) =>
      acc.withColumn(s"${tmp}_l", sum(col(tmp)).over(w))
    }
    val wOff = Window.orderBy(col("__rg_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vals.foldLeft(
        ranged.groupBy(col("__rg_pid"))
          .agg(sum(col(vals.head._1)).as(s"${vals.head._1}_t"),
            vals.tail.map(v => sum(col(v._1)).as(s"${v._1}_t")): _*)) {
      case (acc, (tmp, _, _)) =>
        acc.withColumn(s"${tmp}_o", sum(col(s"${tmp}_t")).over(wOff))
    }.select(col("__rg_pid") +: vals.map(v => col(s"${v._1}_o")): _*)
    val joined = local.join(broadcast(offsets), Seq("__rg_pid"))
    val withOut = vals.foldLeft(joined) { case (acc, (tmp, _, as)) =>
      acc.withColumn(as,
        when(col(s"${tmp}_l").isNull && col(s"${tmp}_o").isNull, lit(null))
          .otherwise(coalesce(col(s"${tmp}_l"), lit(0)) +
            coalesce(col(s"${tmp}_o"), lit(0))))
    }
    withOut.drop("__rg_pid")
      .drop(vals.flatMap(v => Seq(v._1, s"${v._1}_l", s"${v._1}_o")): _*)
  }

  /** 2D Pareto frontier (skyline), both dimensions MAXIMIZED: the rows
    * no other row dominates (≥ in both dims, > in at least one). The
    * classic sweep, distributed: reduce to one max-y candidate per
    * distinct x (partial-aggregating shuffle), take the EXCLUSIVE
    * running max of y in descending-x order ([[runningAgg]] — no
    * single-partition window), keep candidates strictly above it, and
    * semi-join the frontier back to the input (equal points are all
    * non-dominated and all kept). Null coordinates cannot be ordered
    * and are excluded. Worst case (anti-correlated dims) the frontier
    * IS the data — output stays distributed end to end, nothing ever
    * funnels through one task. Minimize a dimension by passing its
    * negation. */
  def skyline2D(df: DataFrame, x: Column, y: Column): DataFrame = {
    val red = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(x.as("__sk_x")).agg(max(y).as("__sk_y"))
    val swept = runningAgg(red, Seq(col("__sk_x").desc), col("__sk_y"),
      agg = "max", as = "__sk_prev", inclusive = false)
    val frontier = swept
      .filter(col("__sk_prev").isNull || col("__sk_y") > col("__sk_prev"))
      .select(col("__sk_x"), col("__sk_y"))
    df.join(frontier, x === col("__sk_x") && y === col("__sk_y"), "left_semi")
  }

  /** Decile-style lift table: bucket rows by `order` into `buckets` exact
    * ntiles, then per bucket report count, total `value`, share of the
    * grand total, and cumulative share. The final window runs over at
    * most `buckets` rows — a single-partition window there is free at
    * any scale (the heavy ranking already happened distributed). */
  def liftTable(df: DataFrame, value: Column, order: Seq[Column], buckets: Int,
      as: String = "bucket"): DataFrame = {
    val tiled = ntileExact(df, order, buckets, as)
    val per = tiled.groupBy(col(as))
      .agg(count(lit(1)).as("n"), sum(value).as("__total"))
    // grand total via a broadcast one-row aggregate, cumulative via the
    // ONE remaining global window — which is bounded at ≤ `buckets`
    // rows by construction (PlanLint's GLOBAL_WINDOW rule flags it; it
    // is the documented benign instance, the heavy ranking already
    // happened distributed in ntileExact)
    val grand = per.agg(sum(col("__total")).as("__grand"))
    val cum = Window.orderBy(col(as))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.crossJoin(broadcast(grand))
      .withColumn("__cum", sum(col("__total")).over(cum))
      .select(col(as), col("n"), round(col("__total"), 4).as("total"),
        round(col("__total") / col("__grand"), 4).as("share"),
        round(col("__cum") / col("__grand"), 4).as("cum_share"))
  }

  /** Exact weighted quantiles over a global order: for each requested
    * probability `p`, the smallest value whose INCLUSIVE cumulative
    * weight reaches `p · totalWeight` (the weighted lower quantile —
    * with unit weights and p=0.5 this is the classic lower median, and
    * `percentile_disc` semantics in general). The workhorse for
    * token-weighted corpus statistics ("the document length below which
    * half the TOKENS live" — very different from the unweighted median
    * when length and weight correlate).
    *
    * Distributed exactly, never a single-partition sort: values reduce
    * to per-distinct-value weight totals (one partial-aggregating
    * shuffle absorbs duplicate values map-side), [[runningAgg]] turns
    * them into inclusive cumulative weights with its range-sliced
    * prefix scheme, and the ≤|ps|-row probability table plus the
    * one-row grand total broadcast against the cumulative table — the
    * final per-p `min` is a partial aggregate. Rows with null value,
    * null weight, or weight ≤ 0 are excluded (a non-positive weight has
    * no place on a CDF). For float weights at extreme scale pass a
    * decimal-cast `weight` (the [[runningAgg]] float-prefix caveat). */
  def weightedQuantiles(df: DataFrame, value: Column, weight: Column,
      ps: Seq[Double], as: String = "quantile"): DataFrame = {
    require(ps.nonEmpty, "weightedQuantiles needs at least one probability")
    require(ps.forall(p => p > 0.0 && p <= 1.0),
      s"probabilities must lie in (0, 1], got $ps")
    require(ps.distinct.size == ps.size, s"duplicate probabilities in $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.filter(value.isNotNull && weight.isNotNull && weight > 0)
      .groupBy(value.as("__wq_v")).agg(sum(weight).as("__wq_w"))
    val cum = runningAgg(g, Seq(col("__wq_v").asc), col("__wq_w"),
      agg = "sum", as = "__wq_cw")
    val grand = g.agg(sum(col("__wq_w")).as("__wq_tw"))
    val pTab = ps.toDF("p")
    cum.crossJoin(broadcast(grand)).crossJoin(broadcast(pTab))
      .filter(col("__wq_cw") >= col("p") * col("__wq_tw"))
      .groupBy(col("p")).agg(min(col("__wq_v")).as(as))
  }

  /** ABC / Pareto classification: rank keys by their value total
    * descending, accumulate the share of the grand total, and bucket
    * into A (cum share ≤ `aCut`), B (≤ `bCut`), C (rest) — the 80/20
    * inventory-and-revenue triage. Cumulation is [[runningAgg]]'s
    * range-sliced distributed prefix (NO single-partition window over
    * the key table — at 10^9 customers that window is the whole
    * point of failure), grand total a one-row broadcast. Ties in the
    * total break by key for a deterministic, SQL-mirrorable order. For
    * exact cumulative shares at scale pass a decimal-cast `value`
    * (the [[runningAgg]] float-prefix caveat). */
  def abcClassification(df: DataFrame, key: Column, value: Column,
      aCut: Double = 0.80, bCut: Double = 0.95): DataFrame = {
    require(aCut > 0 && aCut < bCut && bCut < 1.0,
      s"need 0 < aCut < bCut < 1, got aCut=$aCut bCut=$bCut")
    val totals = df.groupBy(key.as("key")).agg(sum(value).as("total"))
    val grand = totals.agg(sum(col("total")).as("__grand"))
    runningAgg(totals, Seq(col("total").desc, col("key").asc), col("total"))
      .crossJoin(broadcast(grand))
      .withColumn("cum_share", col("running") / col("__grand"))
      .select(col("key"), col("total"), col("cum_share"),
        when(col("cum_share") <= aCut, "A")
          .when(col("cum_share") <= bCut, "B")
          .otherwise("C").as("abc_class"))
  }
}
