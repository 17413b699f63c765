package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class ZScoreAlertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, t: String, v: Double) = StreamOps.ScoreEvent(u, ts(t), v)

  test("zScoreAlerts: spike alerts once baseline is full; warm-up and flat series stay silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.ScoreEvent]
    val alerts = StreamOps.zScoreAlerts(spark, input.toDS(), watermark = "10 minutes",
      lookback = 3, zThreshold = 2.0)
    val q = alerts.writeStream.format("memory").queryName("zalerts").outputMode("append").start()
    try {
      // warm-up: 3 baseline values (1, 2, 3), then a spike
      input.addData(
        ev(1L, "2024-01-01 10:00:00", 1.0),
        ev(1L, "2024-01-01 10:01:00", 2.0),
        ev(1L, "2024-01-01 10:02:00", 3.0))
      q.processAllAvailable()
      assert(spark.table("zalerts").count() == 0, "warm-up must not alert")
      input.addData(ev(1L, "2024-01-01 10:03:00", 12.0))
      q.processAllAvailable()
      val got = spark.table("zalerts").select("user_id", "value", "z")
        .as[(Long, Double, Double)].collect()
      assert(got.length == 1)
      assert(got.head._1 == 1L && got.head._2 == 12.0)
      assert(math.abs(got.head._3 - 10.0) < 1e-9, "baseline mean 2 sd 1 → z = 10")
    } finally q.stop()
  }

  test("zScoreAlerts: zero-variance baseline never alerts; state is per entity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.ScoreEvent]
    val alerts = StreamOps.zScoreAlerts(spark, input.toDS(), watermark = "10 minutes",
      lookback = 2, zThreshold = 2.0)
    val q = alerts.writeStream.format("memory").queryName("zalerts2").outputMode("append").start()
    try {
      input.addData(
        // entity 1: flat baseline then jump → sd 0 → silent by the gate
        ev(1L, "2024-01-01 10:00:00", 5.0), ev(1L, "2024-01-01 10:01:00", 5.0),
        // entity 2: baseline (0, 10)
        ev(2L, "2024-01-01 10:00:00", 0.0), ev(2L, "2024-01-01 10:01:00", 10.0))
      q.processAllAvailable()
      input.addData(
        ev(1L, "2024-01-01 10:02:00", 500.0),
        // entity 2: mean 5, sd ~7.07 → z ≈ 2.12 > 2
        ev(2L, "2024-01-01 10:02:00", 20.0))
      q.processAllAvailable()
      val got = spark.table("zalerts2").select("user_id").as[Long].collect().toSeq
      assert(got == Seq(2L),
        "only entity 2 alerts: entity 1's zero-variance baseline is unevaluable")
    } finally q.stop()
  }

  test("zScoreAlerts: state folds across micro-batches in event-time order within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.ScoreEvent]
    val alerts = StreamOps.zScoreAlerts(spark, input.toDS(), watermark = "10 minutes",
      lookback = 3, zThreshold = 2.0)
    val q = alerts.writeStream.format("memory").queryName("zalerts3").outputMode("append").start()
    try {
      // same four events as the spike test, but delivered out of order
      // inside one batch — the in-batch event-time sort restores the
      // baseline-then-spike sequence
      input.addData(
        ev(1L, "2024-01-01 10:03:00", 12.0),
        ev(1L, "2024-01-01 10:00:00", 1.0),
        ev(1L, "2024-01-01 10:02:00", 3.0),
        ev(1L, "2024-01-01 10:01:00", 2.0))
      q.processAllAvailable()
      val got = spark.table("zalerts3").select("value", "z").as[(Double, Double)].collect()
      assert(got.toSeq == Seq((12.0, 10.0)))
    } finally q.stop()
  }
}
