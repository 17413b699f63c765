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
}
