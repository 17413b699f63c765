package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention builds the triangle with exact counts and rates") {
    // week of 2024-01-01 (Mon) and following weeks
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // u1 cohort w0
      (1L, ts("2024-01-08 10:00:00")), // u1 active w1
      (1L, ts("2024-01-15 10:00:00")), // u1 active w2
      (2L, ts("2024-01-02 10:00:00")), // u2 cohort w0
      (2L, ts("2024-01-03 11:00:00")), // same week — must not double-count
      (3L, ts("2024-01-08 09:00:00")), // u3 cohort w1
      (3L, ts("2024-01-22 09:00:00"))) // u3 active w3 (offset 2)
      .toDF("user_id", "ts")
    val out = Retention.cohortRetention(events, col("user_id"), col("ts"))
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"), col("retention"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L, 1.0),   // u1, u2
      ("2024-01-01", 1L, 1L, 0.5),   // u1
      ("2024-01-01", 2L, 1L, 0.5),   // u1
      ("2024-01-08", 0L, 1L, 1.0),   // u3
      ("2024-01-08", 2L, 1L, 1.0)))  // u3, sparse offsets skip empty weeks
  }
}
