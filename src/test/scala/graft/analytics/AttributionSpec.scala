package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def run(events: Seq[(Long, Timestamp, String, Long, Double)], lookbackSec: Long = 3600) =
    Attribution.positionBased(
      events.toDF("user", "ts", "etype", "event_id", "value"),
      entity = col("user"), ts = col("ts"), eventType = col("etype"),
      convId = col("event_id"), value = col("value"),
      touchTypes = Seq("view", "click"), convType = "purchase",
      lookbackSeconds = lookbackSec)

  test("U-shaped weights: 40/20/40 across 3 touches, halves for 2, full for 1") {
    val events = Seq(
      (1L, ts(0), "view", 1L, 0.0),
      (1L, ts(1), "click", 2L, 0.0),
      (1L, ts(2), "view", 3L, 0.0),
      (1L, ts(3), "purchase", 4L, 100.0),
      (2L, ts(0), "click", 5L, 0.0),
      (2L, ts(1), "view", 6L, 0.0),
      (2L, ts(2), "purchase", 7L, 10.0),
      (3L, ts(0), "view", 8L, 0.0),
      (3L, ts(1), "purchase", 9L, 50.0))
    // conv 4: touches view(0) click(1) view(2) → weights 0.4 / 0.2 / 0.4
    val conv4 = run(events).filter(col("conv_id") === 4L)
      .orderBy("weight").select("channel", "weight").as[(String, Double)].collect()
    assert(conv4.toSeq == Seq(("click", 0.2), ("view", 0.4), ("view", 0.4)))
    // conv 7: two touches → 0.5 each
    val conv7 = run(events).filter(col("conv_id") === 7L)
      .select("channel", "weight").as[(String, Double)].collect().toSeq.sorted
    assert(conv7 == Seq(("click", 0.5), ("view", 0.5)))
    // conv 9: single touch → 1.0
    val conv9 = run(events).filter(col("conv_id") === 9L)
      .select("channel", "weight", "attributed").as[(String, Double, Double)].collect()
    assert(conv9.toSeq == Seq(("view", 1.0, 50.0)))
  }

  test("lookback window excludes stale and simultaneous touches; direct fallback") {
    val events = Seq(
      (1L, ts(0), "view", 1L, 0.0),      // 120 min before conv → outside 1h lookback
      (1L, ts(120), "purchase", 2L, 30.0),
      (2L, ts(5), "view", 3L, 0.0),
      (2L, ts(5), "purchase", 4L, 20.0)) // touch exactly AT conv ts → excluded
    val got = run(events).select("conv_id", "channel", "weight", "attributed")
      .as[(Long, String, Double, Double)].collect().toSet
    assert(got == Set((2L, "direct", 1.0, 30.0), (4L, "direct", 1.0, 20.0)))
  }

  test("attributed revenue mass equals total conversion value") {
    val events = Seq(
      (1L, ts(0), "view", 1L, 0.0), (1L, ts(1), "click", 2L, 0.0),
      (1L, ts(2), "view", 3L, 0.0), (1L, ts(3), "click", 4L, 0.0),
      (1L, ts(4), "purchase", 5L, 77.0),
      (2L, ts(0), "purchase", 6L, 23.0))
    val total = run(events).agg(sum("attributed")).head().getDouble(0)
    assert(math.abs(total - 100.0) < 1e-9)
    val summary = Attribution.channelSummary(run(events))
    assert(summary.agg(sum("revenue")).head().getDouble(0) == 100.0)
  }
}
