package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic score calibration — turn a raw model/heuristic score into
  * an empirical probability that is MONOTONE in the score (a higher
  * quality score must never mean a lower pass rate), the standard
  * post-hoc calibrator for quality-classifier gates (D32's output, C4
  * filters) ahead of thresholding.
  *
  * Classic PAV is a sequential pool-adjacent-violators loop. Here the
  * fit uses the equivalent MINIMAX identity
  * iso(i) = max_{j≤i} min_{k≥i} avg(y over bins j..k) (Ayer et al.
  * 1955) — a closed form over the BINNED table, so the whole fit is
  * declarative and engine-mirrorable: ONE corpus pass bins scores onto
  * a fixed grid (C15b's two-level discipline — the corpus shuffle is
  * the binning aggregate), then prefix sums, the j≤k pair table
  * (nBins² ≤ 4096 rows), a per-j suffix running-min and a per-i max —
  * all windows over BOUNDED bin-scale tables (the b14 benign class),
  * nothing corpus-sized ever sorts. Binning bounds PAV's resolution at
  * one grid cell, exactly the C15b trade.
  *
  * Output: one row per non-empty bin — `bin`, `n`, `raw_rate`,
  * `calibrated` (non-decreasing in `bin` by construction). Scores
  * outside [0, 1] are excluded (calibrate a normalized score). */
object Calibration {

  def isotonicCalibration(df: DataFrame, score: Column, label: Column,
                          nBins: Int = 32): DataFrame = {
    require(nBins >= 2 && nBins <= 4096, s"nBins must be in [2,4096], got $nBins")
    val s = df
      .select(score.cast("double").as("__s"), label.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull &&
        col("__s") >= 0 && col("__s") <= 1)
      .select(least(floor(col("__s") * nBins), lit(nBins - 1)).cast("int").as("__b"),
        col("__y"))
    val bins = s.groupBy("__b").agg(count(lit(1)).as("n"), sum(col("__y")).as("__sy"))
    val w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = bins
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__cs", sum(col("__sy")).over(w))
    val p = c.as("j").join(c.as("k"), col("j.__b") <= col("k.__b"))
      .select(col("j.__b").as("__j"), col("k.__b").as("__k"),
        ((col("k.__cs") - col("j.__cs") + col("j.__sy")) * lit(1.0) /
          (col("k.__cn") - col("j.__cn") + col("j.n"))).as("__a"))
    val wm = Window.partitionBy("__j").orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iso = p.withColumn("__mn", min(col("__a")).over(wm))
      .groupBy(col("__k").as("__b")).agg(max(col("__mn")).as("calibrated"))
    bins.join(iso, "__b")
      .select(col("__b").as("bin"), col("n"),
        (col("__sy") * lit(1.0) / col("n")).as("raw_rate"), col("calibrated"))
  }
}
