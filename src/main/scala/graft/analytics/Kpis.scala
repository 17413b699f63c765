package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer KPI operators.
  *
  * Generalizes the reference's analytics stage (analytics/kpis.py) from
  * movie-specific queries to reusable operators over arbitrary tables.
  */
object Kpis {

  /** Generic top-N ranking by a metric (reference: kpis.py:67-99
    * `rank_movies(metric, order, top_n, filter)` — instantiated 10× for
    * highest/lowest revenue, budget, profit, roi, votes, rating,
    * popularity).
    *
    * `tieBreak` makes the result deterministic under ties. Scale:
    * `orderBy(...).limit(n)` compiles to `TakeOrderedAndProject` —
    * per-partition top-n + single small reduce, no global sort shuffle.
    */
  /** RFM segmentation: per customer, exact `buckets`-tile scores on
    * Recency (last order date — later is better), Frequency (order
    * count), and Monetary (total spend), each 1..buckets with
    * `buckets` = best. All three tilings ride
    * [[graft.operators.Ranking.ntileExact]], so no single-partition
    * window appears at any scale (three range-shuffle rank passes over
    * the customer-grain aggregate — already thousands of times smaller
    * than the order table). Ties break on the customer key; the output
    * carries (customer, last_order, frequency, monetary, r_score,
    * f_score, m_score). */
  def rfm(orders: DataFrame, customer: Column, orderDate: Column,
      amount: Column, buckets: Int = 5): DataFrame = {
    import graft.operators.Ranking
    val per = orders.groupBy(customer.as("customer"))
      .agg(max(orderDate).as("last_order"), count(lit(1)).as("frequency"),
        sum(amount).as("monetary"))
    val r = Ranking.ntileExact(per,
      Seq(col("last_order").asc, col("customer").asc), buckets, "r_score")
    val f = Ranking.ntileExact(r,
      Seq(col("frequency").asc, col("customer").asc), buckets, "f_score")
    Ranking.ntileExact(f,
      Seq(col("monetary").asc, col("customer").asc), buckets, "m_score")
  }

  def rankTopN(
      df: DataFrame,
      metric: Column,
      descending: Boolean = true,
      n: Int = 10,
      filter: Option[Column] = None,
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val base = filter.fold(df)(df.filter)
    val key = if (descending) metric.desc else metric.asc
    base.orderBy(key +: tieBreak.map(_.asc): _*).limit(n)
  }

  /** Conditional-ratio ranking (reference: kpis.py:57-64,90-91 — ROI
    * computed only where `budget >= 10`, then ranked). The ratio is only
    * defined where `denomOk`; other rows are excluded before ranking. */
  def rankByRatio(
      df: DataFrame,
      numer: Column,
      denom: Column,
      denomOk: Column,
      as: String,
      n: Int,
      tieBreak: Seq[Column]): DataFrame =
    rankTopN(df.filter(denomOk).withColumn(as, numer / denom),
      col(as), descending = true, n = n, tieBreak = tieBreak)

  /** Multi-predicate contains-search with ordering (reference:
    * kpis.py:102-131 — `col.contains(x) & col2.contains(y)` search with
    * sort). Predicates AND together; always give an `orderBy` with a
    * unique trailing key for determinism. */
  def search(df: DataFrame, predicates: Seq[Column], orderBy: Seq[Column], limit: Int): DataFrame =
    df.filter(predicates.reduce(_ && _)).orderBy(orderBy: _*).limit(limit)

  /** Grouped flag statistics: mean + median per boolean segment
    * (reference: kpis.py:134-152 franchise-vs-standalone stats).
    *
    * Exact `median` matches the oracle; at 100 TB swap `exact=false`
    * for `percentile_approx` (single-pass mergeable sketch, no sort).
    * When `accuracy` exceeds the group size the sketch is exact and
    * returns the element at rank ceil(p·n); production runs use a
    * smaller accuracy to bound sketch memory (error ≤ n/accuracy ranks).
    */
  def groupFlagStats(df: DataFrame, flag: Column, value: Column, exact: Boolean = true,
                     accuracy: Int = 10000): DataFrame = {
    val med = if (exact) median(value) else percentile_approx(value, lit(0.5), lit(accuracy))
    df.groupBy(flag.as("flag"))
      .agg(count(lit(1)).as("n"),
        round(avg(value), 4).as("mean_value"),
        round(med, 4).as("median_value"))
  }

  /** Top-groups aggregation (reference: kpis.py:155-200 — top franchises
    * / directors by revenue with count/sum/avg, ordered, rounded).
    * Hash aggregate with map-side partial aggregation; the final
    * `orderBy(...).limit` is a TakeOrderedAndProject over group rows. */
  def topGroups(
      df: DataFrame,
      groupCol: Column,
      measure: Column,
      n: Int,
      countAs: String = "n",
      sumAs: String = "sum_value",
      avgAs: String = "avg_value"): DataFrame =
    df.groupBy(groupCol)
      .agg(count(lit(1)).as(countAs),
        round(sum(measure), 4).as(sumAs),
        round(avg(measure), 4).as(avgAs))
      .orderBy(col(sumAs).desc, groupCol.asc)
      .limit(n)

  /** Explode-and-aggregate: delimited string → tokens → per-token stats
    * (reference: visualization/visualize.py:79-105 — pipe-joined genres
    * exploded to per-genre aggregates). The delimiter is a LITERAL
    * string (regex-quoted before `split`), so "|" splits on pipes — the
    * reference's genre separator — rather than on every character.
    * Output column `token` is reserved; input columns of that name are
    * rejected rather than silently overwritten. */
  def explodeAgg(
      df: DataFrame,
      listCol: Column,
      delimiter: String,
      measure: Column,
      n: Int): DataFrame = {
    require(!df.columns.contains("token"),
      "explodeAgg reserves output column 'token'; rename the input column")
    df.withColumn("token", explode(split(listCol, java.util.regex.Pattern.quote(delimiter))))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n"), round(avg(measure), 4).as("avg_value"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(n)
  }

  /** Keep the top `fraction` of rows per group by `score` — quantile
    * quality filtering (keep the best 20% of documents per source, the
    * curation step above row-level thresholds: per-group cutoffs adapt
    * to each group's score distribution).
    *
    * `percent_rank` is (rank−1)/(n−1) over the group, so the filter is a
    * single window pass — one shuffle on the group key, no global sort.
    * `tieBreak` must complete a total order for determinism; a group
    * with one row is always kept (rank 0). */
  def topFractionPerGroup(
      df: DataFrame,
      group: Column,
      score: Column,
      fraction: Double,
      tieBreak: Seq[Column]): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    require(!df.columns.contains("__pr"),
      "topFractionPerGroup reserves column '__pr'; rename the input column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(score.desc +: tieBreak.map(_.asc): _*)
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") <= fraction)
      .drop("__pr")
  }

  /** Equi-depth histogram — `buckets` quantile bins with per-bucket
    * count and actual value min/max. Exact quantiles need a global
    * order; the scalable decomposition is two-level: ONE shuffle bins
    * rows onto a fixed fine grid of `cells` micro-cells over
    * [lo, hi) (partial-agg count/min/max per cell — bounded output by
    * construction), then the cumulative window and bucket mapping run
    * over ≤ `cells` ROWS, not the corpus (the single-partition window
    * is deliberate and bounded — this is the approx-quantile
    * decomposition with a deterministic, engine-mirrorable grid
    * instead of an opaque sketch). Bucket boundaries quantize to grid
    * cells: error ≤ one cell's population, shrinking as `cells` grows.
    * `lo`/`hi` come from table stats (min/max outside the range clamp
    * into the edge cells, so no row is lost). Bucket j holds cells
    * whose inclusive cumulative count first reaches (j−1)/k < cum/N ≤
    * j/k: `bucket = least(ceil(cum·k/N), k)`. */
  def equiDepthHistogram(df: DataFrame, value: Column, buckets: Int,
                         lo: Double, hi: Double, cells: Int = 1024): DataFrame = {
    require(buckets >= 1, s"need >=1 bucket, got $buckets")
    require(cells >= buckets, s"grid cells ($cells) must be >= buckets ($buckets)")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    import org.apache.spark.sql.expressions.Window
    val cellW = (hi - lo) / cells
    val cell = greatest(least(floor((value - lo) / cellW), lit(cells - 1)), lit(0)).cast("long")
    val perCell = df.select(cell.as("__cell"), value.cast("double").as("__v"))
      .groupBy("__cell")
      .agg(count(lit(1)).as("__n"), min("__v").as("__lo"), max("__v").as("__hi"))
    val w = Window.orderBy("__cell").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    perCell
      .withColumn("__cum", sum("__n").over(w))
      // NOT "__N": Spark's resolver is case-insensitive, so "__N" would
      // capture the final agg's sum("__n") silently
      .withColumn("__tot", sum("__n").over(all))
      .withColumn("bucket",
        least(ceil(col("__cum").cast("double") * buckets / col("__tot")), lit(buckets)).cast("long"))
      .groupBy("bucket")
      .agg(sum("__n").as("n"), round(min("__lo"), 4).as("lo"), round(max("__hi"), 4).as("hi"))
  }

  /** Rolling active users — DAU plus the trailing-`windowDays` distinct
    * actives (WAU/MAU for 7/30) and the DAU/active stickiness ratio,
    * per report day. The scalable decomposition: distinct (day, user)
    * pairs FIRST (partial-agg dedup — collapses the raw event volume
    * before any window logic), then each pair fans out to the ≤
    * `windowDays` report days it supports (bounded row amplification,
    * a `sequence`+`explode` narrow map — no range self-join, no
    * per-user window sort), then ONE distinct-count aggregate per
    * report day. Report days run to max(day)+windowDays−1: trailing
    * windows still count users whose activity lies within range.
    * For 100-TB event logs where even (day, user) is huge, swap the
    * exact distinct for C8c's mergeable HLL sketch table per day and
    * union window sketches instead. */
  def rollingActiveUsers(df: DataFrame, ts: Column, user: Column,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val daily = df.select(to_date(ts).as("__day"), user.as("__u")).distinct()
    daily
      .select(col("__u"), col("__day"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__o"))
      .withColumn("day", date_add(col("__day"), col("__o")))
      .groupBy("day")
      .agg(
        count_distinct(when(col("__o") === 0, col("__u"))).as("dau"),
        count_distinct(col("__u")).as("n_active"))
      .withColumn("stickiness", round(col("dau").cast("double") / col("n_active"), 4))
  }

  /** Per-period aggregation on a date part (reference: visualize.py year
    * extraction + per-year stats). */
  def perPeriod(df: DataFrame, period: Column, measure: Column): DataFrame =
    df.groupBy(period.as("period"))
      .agg(count(lit(1)).as("n"),
        round(sum(measure), 4).as("sum_value"),
        round(avg(measure), 4).as("avg_value"))
      .orderBy(col("period").asc)
}
