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

  test("acf: hand-computed lag-1 on 1..5, sign flip on alternating series") {
    // x = 1..5: μ=3, σ²_pop=2, Σ(x_t−3)(x_{t−1}−3) = 2+0+0+2 = 4 → ρ̂(1)=0.4
    val ramp = (1 to 5).map(i => ("r", i.toLong, i.toDouble))
    // x alternates ±1: ρ̂(1) = −(n−1)/n = −0.8 for n=5
    val alt = (1 to 5).map(i => ("a", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val df = (ramp ++ alt).toDF("k", "i", "x")
    val got = TimeSeries.acf(df, col("k"), col("i"), col("x"), maxLag = 2)
      .select("key", "lag", "acf").as[(String, Int, Double)].collect()
      .map { case (k, l, v) => (k, l) -> v }.toMap
    assert(math.abs(got(("r", 1)) - 0.4) < 1e-12)
    assert(math.abs(got(("a", 1)) + 0.8) < 1e-12)
    // alternating at lag 2 (μ=−0.2): (0.64+1.44+0.64)/(5·0.96) = 2.72/4.8
    assert(math.abs(got(("a", 2)) - 2.72 / 4.8) < 1e-12)
  }

  test("acf: matches brute force on a pseudo-random gapped series; constant series null") {
    val xs = (1 to 40).filter(_ % 7 != 0) // gaps at multiples of 7
      .map(i => ("s", i.toLong, ((i * 37) % 11).toDouble))
    val df = (xs ++ Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0)))
      .toDF("k", "i", "x")
    val got = TimeSeries.acf(df, col("k"), col("i"), col("x"), maxLag = 3)
      .select("key", "lag", "acf").as[(String, Int, Option[Double])].collect()
      .map { case (k, l, v) => (k, l) -> v }.toMap
    val m = xs.map(_._3).sum / xs.size
    val den = xs.map(t => (t._3 - m) * (t._3 - m)).sum // n·σ²_pop = Σ(x−μ)²
    val byIdx = xs.map(t => t._2 -> t._3).toMap
    for (l <- 1 to 3) {
      val num = xs.flatMap(t => byIdx.get(t._2 - l).map(p => (t._3 - m) * (p - m))).sum
      assert(math.abs(got(("s", l)).get - num / den) < 1e-12, s"lag $l")
    }
    for (l <- 1 to 2) assert(got(("c", l)).isEmpty) // zero variance → null
  }

  test("holtSmooth: hand-computed level/trend/sse on a 4-point series, out of order") {
    // α=0.5, β=0.4, x = [3,5,4,8]: seed l₂=5, b₂=2, sse=0;
    // t=3: prev=7, l=5.5, b=0.4·0.5+0.6·2=1.4, sse=9;
    // t=4: prev=6.9, l=7.45, b=0.4·1.95+0.6·1.4=1.62, sse=10.21
    val df = Seq(("s", 4L, 8.0), ("s", 1L, 3.0), ("s", 3L, 4.0), ("s", 2L, 5.0))
      .toDF("k", "i", "x")
    val r = TimeSeries.holtSmooth(df, col("k"), col("i"), col("x"),
      alpha = 0.5, beta = 0.4, horizon = 2).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("level") - 7.45) < 1e-12)
    assert(math.abs(r.getAs[Double]("trend") - 1.62) < 1e-12)
    assert(math.abs(r.getAs[Double]("forecast") - (7.45 + 2 * 1.62)) < 1e-12)
    assert(math.abs(r.getAs[Double]("sse") - 10.21) < 1e-12)
  }

  test("holtSmooth: 2-point series is the seed itself; 1-point emits nothing") {
    val df = Seq(("two", 1L, 10.0), ("two", 2L, 13.0), ("one", 1L, 7.0))
      .toDF("k", "i", "x")
    val rows = TimeSeries.holtSmooth(df, col("k"), col("i"), col("x"),
      alpha = 0.3, beta = 0.7, horizon = 3).collect()
    assert(rows.length === 1 && rows.head.getAs[String]("key") === "two")
    assert(rows.head.getAs[Double]("level") === 13.0)
    assert(rows.head.getAs[Double]("trend") === 3.0)
    assert(rows.head.getAs[Double]("forecast") === 13.0 + 3 * 3.0)
    assert(rows.head.getAs[Double]("sse") === 0.0)
  }

  test("theilSen: outlier-robust slope — one wild point out of five leaves y=x") {
    val clean = Seq(("s", 1L, 1.0), ("s", 2L, 2.0), ("s", 3L, 3.0),
      ("s", 4L, 4.0), ("s", 5L, 100.0)).toDF("k", "i", "x")
    val r = TimeSeries.theilSen(clean, col("k"), col("i"), col("x")).head()
    assert(r.getAs[Long]("n") === 5L && r.getAs[Long]("n_pairs") === 10L)
    // 6 of 10 pairwise slopes are exactly 1; median of 10 = mean of 5th/6th = 1
    assert(math.abs(r.getAs[Double]("slope") - 1.0) < 1e-12)
    // residuals [0,0,0,0,95] → median 0
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-12)
  }

  test("mannKendall: hand S/var/z on a monotone series; ties corrected; flat series null") {
    // strictly increasing 5 points: S = C(5,2) = 10, no ties →
    // var = 5·4·15/18 = 50/3, z = (10−1)/√(50/3)
    val up = (1L to 5L).map(i => ("s", i, i.toDouble)).toDF("k", "i", "x")
    val r = TimeSeries.mannKendall(up, col("k"), col("i"), col("x")).head()
    assert(r.getAs[Long]("s_stat") === 10L && r.getAs[Long]("n") === 5L)
    val zWant = 9.0 / math.sqrt(50.0 / 3)
    assert(math.abs(r.getAs[Double]("z") - zWant) < 1e-12)
    // decreasing mirrors the sign
    val dn = (1L to 5L).map(i => ("s", i, -i.toDouble)).toDF("k", "i", "x")
    val r2 = TimeSeries.mannKendall(dn, col("k"), col("i"), col("x")).head()
    assert(r2.getAs[Long]("s_stat") === -10L)
    assert(math.abs(r2.getAs[Double]("z") + zWant) < 1e-12)
    assert(math.abs(r2.getAs[Double]("p_approx") - r.getAs[Double]("p_approx")) < 1e-12)
    // ties: x = [1,1,2]: S = 0+1+1 = 2; tie group t=2 →
    // var = (3·2·11 − 2·1·9)/18 = 48/18; z = 1/√(48/18)
    val t = Seq(("s", 1L, 1.0), ("s", 2L, 1.0), ("s", 3L, 2.0)).toDF("k", "i", "x")
    val r3 = TimeSeries.mannKendall(t, col("k"), col("i"), col("x")).head()
    assert(r3.getAs[Long]("s_stat") === 2L)
    assert(math.abs(r3.getAs[Double]("z") - 1.0 / math.sqrt(48.0 / 18)) < 1e-12)
    // all-tied series: S = 0 and var = 0 → null z/p
    val flat = Seq(("s", 1L, 4.0), ("s", 2L, 4.0), ("s", 3L, 4.0)).toDF("k", "i", "x")
    val r4 = TimeSeries.mannKendall(flat, col("k"), col("i"), col("x")).head()
    assert(r4.getAs[Long]("s_stat") === 0L)
    assert(r4.isNullAt(r4.fieldIndex("z")) && r4.isNullAt(r4.fieldIndex("p_approx")))
  }

  test("seasonalDecompose: exact recovery of a planted trend + seasonal pattern (odd period)") {
    // x_t = t + pat[t mod 3], pat = (2, −1, −1) sums to 0 → the 3-MA
    // recovers trend = t exactly, seasonal = pat, residual = 0
    val pat = Map(0L -> 2.0, 1L -> -1.0, 2L -> -1.0)
    val df = (1L to 9L).map(t => ("s", t, t.toDouble + pat(t % 3))).toDF("k", "i", "x")
    val rows = TimeSeries.seasonalDecompose(df, col("k"), col("i"), col("x"), period = 3)
      .orderBy("idx").collect()
    assert(rows.length === 9)
    for (r <- rows) {
      val t = r.getAs[Long]("idx")
      assert(math.abs(r.getAs[Double]("seasonal") - pat(t % 3)) < 1e-12, s"seasonal t=$t")
      if (t == 1 || t == 9) { // no full window at the edges
        assert(r.isNullAt(r.fieldIndex("trend")) && r.isNullAt(r.fieldIndex("resid")))
      } else {
        assert(math.abs(r.getAs[Double]("trend") - t.toDouble) < 1e-12, s"trend t=$t")
        assert(math.abs(r.getAs[Double]("resid")) < 1e-12, s"resid t=$t")
      }
    }
  }

  test("seasonalDecompose: even period uses the 2×MA; keys isolated") {
    // x = 10 + (−1)^t: both half-offset 2-averages are 10 → trend 10,
    // seasonal ±1, residual 0
    val df = ((1L to 8L).map(t => ("a", t, 10.0 + (if (t % 2 == 0) 1.0 else -1.0))) ++
      Seq(("b", 1L, 5.0), ("b", 2L, 5.0))).toDF("k", "i", "x")
    val rows = TimeSeries.seasonalDecompose(df, col("k"), col("i"), col("x"), period = 2)
      .filter(col("key") === "a").orderBy("idx").collect()
    for (r <- rows) {
      val t = r.getAs[Long]("idx")
      assert(math.abs(r.getAs[Double]("seasonal") -
        (if (t % 2 == 0) 1.0 else -1.0)) < 1e-12)
      if (t >= 2 && t <= 7) {
        assert(math.abs(r.getAs[Double]("trend") - 10.0) < 1e-12, s"trend t=$t")
        assert(math.abs(r.getAs[Double]("resid")) < 1e-12)
      } else assert(r.isNullAt(r.fieldIndex("trend")))
    }
    // key b never mixes into a's profile: its rows exist independently
    val b = TimeSeries.seasonalDecompose(df, col("k"), col("i"), col("x"), period = 2)
      .filter(col("key") === "b").collect()
    assert(b.length === 2 && b.forall(_.isNullAt(b.head.fieldIndex("trend"))))
  }

  test("seasonalDecompose: decomposition identity x = trend + seasonal + resid where defined") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 40L).map(t => ("s", t, rnd.nextDouble() * 10)).toDF("k", "i", "x")
    val rows = TimeSeries.seasonalDecompose(df, col("k"), col("i"), col("x"), period = 7)
      .filter(col("trend").isNotNull).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("x") - (r.getAs[Double]("trend") +
        r.getAs[Double]("seasonal") + r.getAs[Double]("resid"))) < 1e-12)
    // the seasonal profile sums to ~0 over one period
    val prof = TimeSeries.seasonalDecompose(df, col("k"), col("i"), col("x"), period = 7)
      .select("season", "seasonal").distinct().collect()
    assert(math.abs(prof.map(_.getAs[Double]("seasonal")).sum) < 1e-9)
  }

  test("theilSen: even-count interpolated medians, key isolation, <2 points dropped") {
    // key "e": slopes sorted [0,1,1,1,1.5,2] → (1+1)/2; residuals
    // sorted [0,0,0,1] → (0+0)/2
    val df = Seq(("e", 0L, 0.0), ("e", 1L, 1.0), ("e", 2L, 3.0), ("e", 3L, 3.0),
      ("solo", 9L, 42.0)).toDF("k", "i", "x")
    val rows = TimeSeries.theilSen(df, col("k"), col("i"), col("x")).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("key") === "e" && r.getAs[Long]("n_pairs") === 6L)
    assert(math.abs(r.getAs[Double]("slope") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-12)
  }
}
