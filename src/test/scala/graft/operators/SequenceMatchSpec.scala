package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class SequenceMatchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val syms = Map("signup" -> "s", "view" -> "v", "click" -> "c", "purchase" -> "p")

  test("orders by (ts, tieBreak), symbolizes, and counts non-overlapping matches") {
    // user 1: s v c p s p  (two funnel completions); rows arrive shuffled
    val rows = Seq(
      (1L, 5L, ts(50), "signup"), (1L, 1L, ts(10), "signup"), (1L, 2L, ts(20), "view"),
      (1L, 6L, ts(60), "purchase"), (1L, 3L, ts(30), "click"), (1L, 4L, ts(40), "purchase"),
      // user 2: v v — no funnel
      (2L, 7L, ts(10), "view"), (2L, 8L, ts(20), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = SequenceMatch.matchPattern(rows, col("user_id"), col("ts"), col("event_type"),
        syms, "s[vc]*p", tieBreak = Seq(col("event_id")), entityName = "user_id")
      .orderBy("user_id")
      .select("user_id", "seq", "n_matches", "first_match")
      .as[(Long, String, Int, String)].collect().toList
    assert(got == List((1L, "svcpsp", 2, "svcp"), (2L, "vv", 0, "")))
  }

  test("same-timestamp events break ties by tieBreak deterministically") {
    val rows = Seq((1L, 2L, ts(10), "purchase"), (1L, 1L, ts(10), "signup"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val seq = SequenceMatch.matchPattern(rows, col("user_id"), col("ts"), col("event_type"),
        syms, "sp", tieBreak = Seq(col("event_id")))
      .select("seq").as[String].head()
    assert(seq == "sp")
  }

  test("unmapped event types become '_' and break adjacency instead of vanishing") {
    val rows = Seq((1L, 1L, ts(10), "signup"), (1L, 2L, ts(20), "error"),
        (1L, 3L, ts(30), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = SequenceMatch.matchPattern(rows, col("user_id"), col("ts"), col("event_type"),
        syms, "sp", tieBreak = Seq(col("event_id")))
      .select("seq", "n_matches").as[(String, Int)].head()
    assert(r == ("s_p", 0), "the unmodeled event must break the adjacent match")
  }

  test("symbol-map contracts are enforced") {
    val df = Seq((1L, ts(1), "a")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] { // reserved placeholder
      SequenceMatch.matchPattern(df, col("user_id"), col("ts"), col("event_type"),
        Map("a" -> "_"), "x")
    }
    intercept[IllegalArgumentException] { // multi-char symbol
      SequenceMatch.matchPattern(df, col("user_id"), col("ts"), col("event_type"),
        Map("a" -> "ab"), "x")
    }
    intercept[IllegalArgumentException] { // ambiguous shared symbol
      SequenceMatch.matchPattern(df, col("user_id"), col("ts"), col("event_type"),
        Map("a" -> "x", "b" -> "x"), "x")
    }
    intercept[IllegalArgumentException] { // empty map
      SequenceMatch.matchPattern(df, col("user_id"), col("ts"), col("event_type"),
        Map.empty, "x")
    }
  }
}
