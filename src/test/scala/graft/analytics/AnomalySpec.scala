package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  test("rollingZScore gates warm-up, scores against the strictly trailing window") {
    // entity 1: values 10,10,10,14 with lookback 3 — only the 4th row has
    // a full window; baseline (10,10,10) has sd 0 → z null, not anomalous
    val flat = (1 to 3).map(i => (1L, ts(i), 10.0, i.toLong)) :+ ((1L, ts(4), 14.0, 4L))
    val out = Anomaly.rollingZScore(flat.toDF("e", "ts", "v", "id"),
        col("e"), col("ts"), col("v"), lookback = 3, zThreshold = 2.0,
        tieBreak = Seq(col("id")))
      .select("id", "evaluated", "z", "is_anomaly")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.get(2)), r.getBoolean(3)))).toMap
    (1L to 3L).foreach { i =>
      assert(out(i) == ((false, None, false)), s"row $i is warm-up")
    }
    assert(out(4L) == ((true, None, false)), "zero-variance baseline → null z, not anomalous")
  }

  test("rollingZScore flags a spike and excludes it from its own baseline") {
    // baseline 1,2,3 (mean 2, sd 1); spike 12 → z = 10; following row 2
    // is scored against (2,3,12): mean 17/3, sd ~5.5 → |z| < 2
    val vals = Seq(1.0, 2.0, 3.0, 12.0, 2.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (1L, ts(i), v, i.toLong) }
    val out = Anomaly.rollingZScore(rows.toDF("e", "ts", "v", "id"),
        col("e"), col("ts"), col("v"), lookback = 3, zThreshold = 2.0,
        tieBreak = Seq(col("id")))
      .select("id", "z", "is_anomaly")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2)))).toMap
    assert(out(3L)._1.exists(z => math.abs(z - 10.0) < 1e-9))
    assert(out(3L)._2, "the spike must be flagged")
    assert(!out(4L)._2, "post-spike normal value is inside the (contaminated) baseline spread")
  }

  test("rollingZScore partitions by entity — histories never mix") {
    val rows = (0 until 4).map(i => (1L, ts(i), 100.0 + i, i.toLong)) ++
      (0 until 4).map(i => (2L, ts(i), 0.1 * i, (10 + i).toLong))
    val out = Anomaly.rollingZScore(rows.toDF("e", "ts", "v", "id"),
        col("e"), col("ts"), col("v"), lookback = 3, zThreshold = 3.0,
        tieBreak = Seq(col("id")))
    assert(out.filter(col("is_anomaly")).count() == 0,
      "smooth per-entity series must not alarm even though the entities' scales differ 1000×")
    assert(out.filter(col("evaluated")).count() == 2, "one full-window row per entity")
  }

  test("rollingZScore rejects reserved columns and tiny lookback") {
    val df = Seq((1L, ts(0), 1.0, true)).toDF("e", "ts", "v", "evaluated")
    intercept[IllegalArgumentException] {
      Anomaly.rollingZScore(df, col("e"), col("ts"), col("v"), 3, 2.0)
    }
    intercept[IllegalArgumentException] {
      Anomaly.rollingZScore(Seq((1L, ts(0), 1.0)).toDF("e", "ts", "v"),
        col("e"), col("ts"), col("v"), 1, 2.0)
    }
  }

  test("cusum: level shift fires both sides at hand-computed indices, with resets") {
    // 10 points at 0 then 10 at 5: μ=2.5, σ=2.5 → z = ∓1. With k=0.25,
    // h=2.5 each side accumulates 0.75/step: down alarms at idx 3 and 7
    // (reset between), up alarms at idx 13 and 17.
    val xs = (0 until 10).map(i => ("s", i.toLong, 0.0)) ++
      (10 until 20).map(i => ("s", i.toLong, 5.0))
    val got = Anomaly.cusum(xs.toDF("k", "i", "x"), col("k"), col("i"), col("x"),
        slack = 0.25, threshold = 2.5)
      .select("key", "idx", "direction").as[(String, Long, String)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    assert(got === Seq(("s", 3L, "down"), ("s", 7L, "down"),
      ("s", 13L, "up"), ("s", 17L, "up")))
  }

  test("cusum matches an independent fold on a pseudo-random multi-key input; flat series silent") {
    val data = (for (k <- Seq("a", "b"); i <- 1 to 60)
      yield (k, i.toLong, ((i * (if (k == "a") 37 else 53)) % 17).toDouble +
        (if (i > 40) 6.0 else 0.0))) ++ (1 to 10).map(i => ("flat", i.toLong, 2.0))
    val got = Anomaly.cusum(data.toDF("k", "i", "x"), col("k"), col("i"), col("x"),
        slack = 0.5, threshold = 3.0)
      .select("key", "idx", "direction").as[(String, Long, String)].collect().toSet
    val want = data.groupBy(_._1).flatMap { case (k, pts) =>
      val xs = pts.sortBy(_._2)
      val mu = xs.map(_._3).sum / xs.size
      val sd = math.sqrt(xs.map(p => (p._3 - mu) * (p._3 - mu)).sum / xs.size)
      if (sd == 0) Nil else {
        var sp = 0.0; var sn = 0.0
        xs.flatMap { case (_, i, x) =>
          val z = (x - mu) / sd
          sp = math.max(0, sp + z - 0.5); sn = math.max(0, sn - z - 0.5)
          val hits = (if (sp > 3.0) Seq((k, i, "up")) else Nil) ++
            (if (sn > 3.0) Seq((k, i, "down")) else Nil)
          if (sp > 3.0) sp = 0; if (sn > 3.0) sn = 0
          hits
        }
      }
    }.toSet
    assert(want.nonEmpty, "fixture should fire at least one alarm")
    assert(got === want)
  }
}
