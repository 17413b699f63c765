package graft.operators

import graft.{PlanShapes, SparkSpec}
import java.sql.Date
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("gapFillLocf densifies per-key spans and carries last observation forward") {
    val df = Seq(
      ("a", d("2024-01-01"), Some(10.0), Some(1L)),
      ("a", d("2024-01-04"), Some(40.0), Some(4L)),
      ("a", d("2024-01-06"), None, Some(6L)), // observed row with a NULL value
      ("b", d("2024-02-01"), Some(7.0), Some(70L))
    ).toDF("k", "day", "v", "n")
    val got = TimeSeries.gapFillLocf(df, Seq("k"), "day", Seq("v", "n"))
      .orderBy("k", "day").collect()
    assert(got.length === 6 + 1) // a spans 6 days, b spans 1
    val a = got.filter(_.getString(0) == "a")
    assert(a.map(_.getDate(1).toString) === (1 to 6).map(i => f"2024-01-0$i%d"))
    // filled_v: observed 10, carried 10,10, observed 40, carried 40, then
    // the day-6 row is OBSERVED but null-valued — LOCF still carries 40
    assert(a.map(_.getDouble(4)) === Seq(10.0, 10.0, 10.0, 40.0, 40.0, 40.0))
    assert(a.map(_.getLong(5)) === Seq(1L, 1L, 1L, 4L, 4L, 6L))
    // is_gap marks spine-added rows only — NOT the null-valued observed row
    assert(a.map(_.getBoolean(6)) === Seq(false, true, true, false, true, false))
    // original columns ride through untouched (nulls on gap rows)
    assert(a.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      === Seq(Some(10.0), None, None, Some(40.0), None, None))
  }

  test("keys are isolated and single-day keys survive") {
    val df = Seq(("a", d("2024-01-01"), 1.0), ("b", d("2024-03-05"), 2.0))
      .toDF("k", "day", "v")
    val got = TimeSeries.gapFillLocf(df, Seq("k"), "day", Seq("v"))
    assert(got.count() === 2)
    assert(got.filter(col("is_gap")).count() === 0)
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(String, Date, Double)].toDF("k", "day", "v")
    assert(TimeSeries.gapFillLocf(df, Seq("k"), "day", Seq("v")).count() === 0)
  }

  test("exactly two WindowExec (lead + shared fill) regardless of fill-column count") {
    val df = Seq(("a", d("2024-01-01"), 1.0, 2.0), ("a", d("2024-01-05"), 3.0, 4.0))
      .toDF("k", "day", "v1", "v2")
    val out = TimeSeries.gapFillLocf(df, Seq("k"), "day", Seq("v1", "v2"))
    assert(PlanShapes.windowCount(out) === 2)
  }

  test("contract-violating duplicate (key,date) stays bounded (no descending sequence)") {
    val df = Seq(("a", d("2024-01-01"), 1.0), ("a", d("2024-01-01"), 2.0),
      ("a", d("2024-01-03"), 3.0)).toDF("k", "day", "v")
    val got = TimeSeries.gapFillLocf(df, Seq("k"), "day", Seq("v"))
    // 2 dup rows + 1 gap day + final day = 4; no blow-up, no negative spans
    assert(got.count() === 4)
  }

  test("reserved output columns are rejected") {
    val df = Seq(("a", d("2024-01-01"), 1.0)).toDF("k", "day", "filled_v")
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillLocf(df.withColumnRenamed("filled_v", "v")
        .withColumn("is_gap", lit(false)), Seq("k"), "day", Seq("v"))
    }
  }

  test("ohlcBars: open/close by event order, high/low/volume/vwap per bucket") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // day 1, key A — deliberately out of arrival order
      ("A", ts("2024-01-01 12:00:00"), 30.0, 3L),
      ("A", ts("2024-01-01 09:00:00"), 10.0, 1L),
      ("A", ts("2024-01-01 18:00:00"), 20.0, 4L),
      ("A", ts("2024-01-01 09:00:00"), 50.0, 2L), // same ts as open → tie by id
      // day 2, key A
      ("A", ts("2024-01-02 10:00:00"), 7.0, 5L),
      // day 1, key B
      ("B", ts("2024-01-01 01:00:00"), 4.0, 6L),
      ("B", ts("2024-01-01 23:00:00"), 2.0, 7L))
      .toDF("k", "ts", "v", "id")
    val got = TimeSeries.ohlcBars(rows, Seq(col("k")), col("ts"), col("v"),
        bucket = "1 day", tieBreak = Seq(col("id")))
      .orderBy("k", "bucket_start")
      .select("k", "open", "high", "low", "close", "volume", "vwap")
      .as[(String, Double, Double, Double, Double, Long, Double)].collect().toList
    assert(got == List(
      ("A", 10.0, 50.0, 10.0, 20.0, 4L, 27.5), // open = id-1 at the tied 09:00
      ("A", 7.0, 7.0, 7.0, 7.0, 1L, 7.0),
      ("B", 4.0, 4.0, 2.0, 2.0, 2L, 3.0)))
  }

  test("ohlcBars: weighted vwap, and zero total weight yields null not error") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(("A", ts("2024-01-01 09:00:00"), 10.0, 3.0),
      ("A", ts("2024-01-01 10:00:00"), 20.0, 1.0),
      ("Z", ts("2024-01-01 09:00:00"), 5.0, 0.0))
      .toDF("k", "ts", "v", "w")
    val got = TimeSeries.ohlcBars(rows, Seq(col("k")), col("ts"), col("v"),
        bucket = "1 day", weight = col("w"))
      .select("k", "vwap").as[(String, Option[Double])].collect().toMap
    assert(got("A").contains(12.5)) // (10·3 + 20·1) / 4
    assert(got("Z").isEmpty)
  }
}
