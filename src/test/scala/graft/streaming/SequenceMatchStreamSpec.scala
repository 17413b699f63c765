package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SequenceMatchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(u: Long, t: String, et: String) = StreamOps.TypedEvent(u, ts(t), et)
  private val syms = Map("signup" -> "s", "view" -> "v", "click" -> "c", "purchase" -> "p")

  test("funnel spanning micro-batches completes once the watermark graduates it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.TypedEvent]
    val out = StreamOps.sequenceMatches(spark, input.toDS(),
      watermark = "0 seconds", symbols = syms, pattern = "s[vc]*p")
    val q = out.writeStream.format("memory").queryName("cep1")
      .outputMode("append").start()
    try {
      // first half of the funnel; watermark still at the batch max, so
      // the purchase half is yet to come
      input.addData(ev(1L, "2024-01-01 10:00:00", "signup"),
        ev(1L, "2024-01-01 10:00:10", "view"))
      q.processAllAvailable()
      input.addData(ev(1L, "2024-01-01 10:00:20", "click"),
        ev(1L, "2024-01-01 10:00:30", "purchase"))
      q.processAllAvailable()
      // graduation needs the watermark to PASS the purchase ts, and
      // timers fire on the batch after the watermark update
      input.addData(ev(9L, "2024-01-01 10:01:00", "view"))
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:01:10", "view"))
      q.processAllAvailable()
      val got = spark.table("cep1")
        .select("user_id", "n_new_matches", "matched_through")
        .as[(Long, Long, Timestamp)].collect().toSeq
      assert(got === Seq((1L, 1L, ts("2024-01-01 10:00:30"))), s"got $got")
    } finally q.stop()
  }

  test("late-but-within-watermark event lands in true event-time position") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.TypedEvent]
    val out = StreamOps.sequenceMatches(spark, input.toDS(),
      watermark = "1 minute", symbols = syms, pattern = "sp")
    val q = out.writeStream.format("memory").queryName("cep2")
      .outputMode("append").start()
    try {
      // purchase arrives FIRST (stream disorder); signup arrives later
      // with an EARLIER timestamp, inside the 1-minute tolerance
      input.addData(ev(1L, "2024-01-01 10:00:30", "purchase"))
      q.processAllAvailable()
      input.addData(ev(1L, "2024-01-01 10:00:10", "signup"))
      q.processAllAvailable()
      // advance the watermark past 10:00:30 (+1 min tolerance), then
      // one more batch so the graduation timer fires
      input.addData(ev(9L, "2024-01-01 10:02:00", "view"))
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:02:10", "view"))
      q.processAllAvailable()
      val got = spark.table("cep2")
        .select("user_id", "n_new_matches").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 1L)),
        s"reordered signup must precede the purchase in event time; got $got")
    } finally q.stop()
  }

  test("non-overlapping counting across batches; unmatched tail is bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.TypedEvent]
    val out = StreamOps.sequenceMatches(spark, input.toDS(),
      watermark = "0 seconds", symbols = syms, pattern = "sp", maxTail = 4)
    val q = out.writeStream.format("memory").queryName("cep3")
      .outputMode("append").start()
    try {
      // s p s p → two matches; then a long run of views (tail pressure)
      input.addData(ev(1L, "2024-01-01 10:00:00", "signup"),
        ev(1L, "2024-01-01 10:00:01", "purchase"),
        ev(1L, "2024-01-01 10:00:02", "signup"),
        ev(1L, "2024-01-01 10:00:03", "purchase"))
      q.processAllAvailable()
      input.addData((1 to 10).map(i => ev(1L, f"2024-01-01 10:01:$i%02d", "view")): _*)
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:05:00", "view"))
      q.processAllAvailable()
      input.addData(ev(9L, "2024-01-01 10:05:10", "view"))
      q.processAllAvailable()
      val got = spark.table("cep3")
        .select("user_id", "n_new_matches").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("contracts are enforced") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.TypedEvent]
    intercept[IllegalArgumentException] {
      StreamOps.sequenceMatches(spark, input.toDS(), "0 seconds", Map("a" -> "_"), "x")
    }
    intercept[IllegalArgumentException] {
      StreamOps.sequenceMatches(spark, input.toDS(), "0 seconds", syms, "sp", maxTail = 1)
    }
  }
}
