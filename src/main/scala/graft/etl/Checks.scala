package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ pattern): a set
  * of table-level checks computed in ONE aggregation pass and reported
  * as a tall (check, column, metric, threshold, passed) table — the
  * audit artifact a Medallion pipeline writes next to each Silver/Gold
  * partition (the reference validates per-record on ingest,
  * `fetch_movies.py:67-105`; this is the table-level complement).
  *
  * Scale: every metric is an aggregate expression over the same scan —
  * null fractions, conformity rates, and min/max are plain partial
  * aggregates; [[Check.Unique]] uses `count(distinct)`, which Spark
  * plans via expand (rows × #distinct-aggs before partial aggregation —
  * still one scan, the standard exact-uniqueness cost; use
  * [[Check.ApproxUnique]] to keep the pass expansion-free at a
  * corpus scale where ±2% error is acceptable).
  */
object Checks {

  sealed trait Check {
    def column: String
    /** Human-readable check id, e.g. `not_null(o_custkey)`. */
    def label: String
    /** Aggregate metric expression (a fraction or a count). */
    private[etl] def metric: Column
    /** Threshold the metric is compared against. */
    def threshold: Double
    /** True = pass when metric <= threshold; false = pass when >=. */
    private[etl] def atMost: Boolean
  }

  /** Null fraction of `column` must be <= `maxNullFrac`. */
  final case class NotNull(column: String, maxNullFrac: Double = 0.0) extends Check {
    val label = s"not_null($column)"
    private[etl] def metric =
      coalesce(avg(when(col(column).isNull, 1.0).otherwise(0.0)), lit(0.0))
    def threshold = maxNullFrac
    private[etl] def atMost = true
  }

  /** Duplicate fraction 1 − distinct/total of `column` must be <=
    * `maxDupFrac` (0 = strictly unique). Exact; costs an expand. */
  final case class Unique(column: String, maxDupFrac: Double = 0.0) extends Check {
    val label = s"unique($column)"
    private[etl] def metric =
      when(count(col(column)) > 0,
        lit(1.0) - countDistinct(col(column)).cast("double") / count(col(column)))
        .otherwise(lit(0.0))
    def threshold = maxDupFrac
    private[etl] def atMost = true
  }

  /** Approximate duplicate fraction via HLL++ — expansion-free single
    * pass; rsd is the sketch's relative standard deviation. */
  final case class ApproxUnique(column: String, maxDupFrac: Double, rsd: Double = 0.02) extends Check {
    val label = s"approx_unique($column)"
    private[etl] def metric =
      when(count(col(column)) > 0,
        lit(1.0) - approx_count_distinct(col(column), rsd).cast("double") / count(col(column)))
        .otherwise(lit(0.0))
    def threshold = maxDupFrac
    private[etl] def atMost = true
  }

  /** Fraction of non-null values OUTSIDE [lo, hi] must be <= `maxViolFrac`. */
  final case class InRange(column: String, lo: Double, hi: Double,
                           maxViolFrac: Double = 0.0) extends Check {
    val label = s"in_range($column)"
    private[etl] def metric =
      // avg skips nulls, so the denominator is the non-null count
      coalesce(avg(when(col(column).isNotNull,
        when(col(column).cast("double") < lo || col(column).cast("double") > hi, 1.0)
          .otherwise(0.0))), lit(0.0))
    def threshold = maxViolFrac
    private[etl] def atMost = true
  }

  /** Fraction of non-null values not in `allowed` must be <= `maxViolFrac`. */
  final case class InSet(column: String, allowed: Seq[String],
                         maxViolFrac: Double = 0.0) extends Check {
    val label = s"in_set($column)"
    private[etl] def metric =
      coalesce(avg(when(col(column).isNotNull,
        when(col(column).cast("string").isin(allowed: _*), 0.0).otherwise(1.0))), lit(0.0))
    def threshold = maxViolFrac
    private[etl] def atMost = true
  }

  /** Fraction of non-null values fully matching `regex` must be >=
    * `minMatchFrac`. */
  final case class MatchesRegex(column: String, regex: String,
                                minMatchFrac: Double = 1.0) extends Check {
    val label = s"matches_regex($column)"
    private[etl] def metric =
      coalesce(avg(when(col(column).isNotNull,
        when(regexp_like(col(column).cast("string"), lit(regex)), 1.0)
          .otherwise(0.0))), lit(0.0))
    def threshold = minMatchFrac
    private[etl] def atMost = false
  }

  /** Row count must be within [minRows, maxRows]. Reported as the raw
    * count with passed = count ∈ range (threshold column holds minRows;
    * the range is in the label). */
  final case class RowCountBetween(minRows: Long, maxRows: Long) extends Check {
    val column = "*"
    val label = s"row_count_between($minRows,$maxRows)"
    private[etl] def metric = count(lit(1)).cast("double")
    def threshold = minRows.toDouble
    private[etl] def atMost = true // unused; RowCountBetween overrides passed below
  }

  /** Run every check in ONE aggregation over `df`. Returns one row per
    * check: (check, column, metric, threshold, passed), metric rounded
    * to 6 dp. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val metricCols = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val m = round(col(s"__m$i"), 6)
      val passed = c match {
        case RowCountBetween(lo, hi) => col(s"__m$i") >= lo && col(s"__m$i") <= hi
        case _ if c.atMost           => col(s"__m$i") <= c.threshold
        case _                       => col(s"__m$i") >= c.threshold
      }
      struct(lit(c.label).as("check"), lit(c.column).as("column"),
        m.as("metric"), lit(c.threshold).as("threshold"), passed.as("passed"))
    }
    one.select(explode(array(rows: _*)).as("__c")).select(col("__c.*"))
  }
}
