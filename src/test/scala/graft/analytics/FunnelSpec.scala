package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // u1 completes the funnel in order
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    // u2 clicks BEFORE viewing — click must not count
    (2L, ts("2024-01-01 09:00:00"), "click"),
    (2L, ts("2024-01-01 10:00:00"), "view"),
    // u3 views then clicks, never purchases
    (3L, ts("2024-01-01 08:00:00"), "view"),
    (3L, ts("2024-01-01 08:30:00"), "click"),
    // u4 purchases without clicking — only step 1 counts
    (4L, ts("2024-01-01 07:00:00"), "view"),
    (4L, ts("2024-01-01 07:30:00"), "purchase"))
    .toDF("user_id", "ts", "event_type")

  test("funnel counts ordered completions only") {
    val out = Funnel.funnel(events, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy("step_index")
      .select("step", "n_users", "conversion")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("view", 4L, 1.0),      // all four viewed
      ("click", 2L, 0.5),     // u1, u3 (u2's click was pre-view)
      ("purchase", 1L, 0.25)))// u1 only (u4 skipped click)
  }

  test("maxSpan bounds the whole funnel from step 1") {
    val out = Funnel.funnel(events, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click"), maxSpanSeconds = Some(600))
      .orderBy("step_index").select("n_users").as[Long].collect().toSeq
    // u1 clicks at +5min (in), u3 at +30min (out)
    assert(out == Seq(4L, 1L))
  }

  test("stepTimes: one row per step-1 user, nulls from the first missed step on") {
    val got = Funnel.stepTimes(events, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy("user")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
    assert(got.toSeq === Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:05:00")),
        Some(ts("2024-01-01 10:10:00"))),
      (2L, Some(ts("2024-01-01 10:00:00")), None, None), // pre-view click excluded
      (3L, Some(ts("2024-01-01 08:00:00")), Some(ts("2024-01-01 08:30:00")), None),
      (4L, Some(ts("2024-01-01 07:00:00")), None, None))) // skipped click gates purchase
  }

  test("stepTimes: a user who never does step 1 has no row") {
    val only2 = Seq((7L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    assert(Funnel.stepTimes(only2, col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click")).count() === 0)
  }

  test("a user repeating steps counts once, earliest valid times used") {
    val rep = Seq(
      (9L, ts("2024-01-01 10:00:00"), "view"),
      (9L, ts("2024-01-01 11:00:00"), "view"),
      (9L, ts("2024-01-01 10:30:00"), "click"),
      (9L, ts("2024-01-01 10:45:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(rep, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click"))
      .orderBy("step_index").select("n_users").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L))
  }
}
