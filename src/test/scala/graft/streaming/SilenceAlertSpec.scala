package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SilenceAlertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, t: String) = StreamOps.ScoreEvent(u, ts(t), 1.0)

  test("entity that goes silent alerts once; the live entity driving the watermark does not") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.ScoreEvent]
    val alerts = StreamOps.silenceAlerts(spark, input.toDS(),
      watermark = "0 seconds", gapSeconds = 60)
    val q = alerts.writeStream.format("memory").queryName("silence1")
      .outputMode("append").start()
    try {
      input.addData(ev(1L, "2024-01-01 10:00:00"), ev(2L, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      assert(spark.table("silence1").count() === 0)
      // entity 2 keeps beating; watermark advances past 1's deadline (10:01:00)
      input.addData(ev(2L, "2024-01-01 10:00:30"))
      q.processAllAvailable()
      input.addData(ev(2L, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      // timers fire on the batch AFTER the watermark update
      input.addData(ev(2L, "2024-01-01 10:02:10"))
      q.processAllAvailable()
      val got = spark.table("silence1")
        .select("user_id", "last_seen", "gap_sec")
        .as[(Long, Timestamp, Long)].collect()
      assert(got.toSeq === Seq((1L, ts("2024-01-01 10:00:00"), 60L)),
        s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("each fresh event re-arms the timer; reappearance starts a new episode that can re-alert") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.ScoreEvent]
    val alerts = StreamOps.silenceAlerts(spark, input.toDS(),
      watermark = "0 seconds", gapSeconds = 60)
    val q = alerts.writeStream.format("memory").queryName("silence2")
      .outputMode("append").start()
    try {
      // entity 1 beats at 10:00:00 and 10:00:50 — the second beat re-arms
      input.addData(ev(1L, "2024-01-01 10:00:00"), ev(9L, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      input.addData(ev(1L, "2024-01-01 10:00:50"), ev(9L, "2024-01-01 10:01:10"))
      q.processAllAvailable()
      // watermark 10:01:10 < 10:00:50+60s: no alert yet for 1
      input.addData(ev(9L, "2024-01-01 10:01:30"))
      q.processAllAvailable()
      assert(spark.table("silence2").count() === 0, "re-armed timer must not fire early")
      // push watermark past 10:01:50 → episode 1 alert for entity 1
      input.addData(ev(9L, "2024-01-01 10:02:30"))
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:02:40"))
      q.processAllAvailable()
      val ep1 = spark.table("silence2").select("user_id", "last_seen")
        .as[(Long, Timestamp)].collect().toSeq
      assert(ep1 === Seq((1L, ts("2024-01-01 10:00:50"))), s"got $ep1")
      // entity 1 reappears, then goes silent again → second alert
      input.addData(ev(1L, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:05:10"))
      q.processAllAvailable()
      val ep2 = spark.table("silence2").select("user_id", "last_seen")
        .as[(Long, Timestamp)].collect().toSeq.sortBy(_._2.getTime)
      assert(ep2 === Seq((1L, ts("2024-01-01 10:00:50")), (1L, ts("2024-01-01 10:03:00"))),
        s"got $ep2")
    } finally q.stop()
  }
}
