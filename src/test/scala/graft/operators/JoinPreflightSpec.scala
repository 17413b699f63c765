package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinPreflightSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (Some(1L), "a"), (Some(1L), "b"), (Some(1L), "c"), // hot key: 3 rows
    (Some(2L), "d"),
    (Some(3L), "e"), (Some(3L), "f"),
    (None, "g")).toDF("k", "payload")

  private def right = Seq(
    (Some(1L), 10), (Some(1L), 11), (Some(1L), 12), (Some(1L), 13), // hot key: 4 rows
    (Some(2L), 20),
    (Some(4L), 40), // unmatched
    (None, 99)).toDF("k", "v")

  test("summary forecasts the join size EXACTLY and profiles skew") {
    val out = JoinPreflight.summary(left, col("k"), right, col("k"), hotThreshold = 10)
      .collect().head
    val actual = left.filter(col("k").isNotNull)
      .join(right, Seq("k"), "inner").count()
    assert(out.getAs[Long]("est_rows") == actual, "forecast must equal the real join size")
    assert(out.getAs[Long]("est_rows") == 13, "1→3·4=12, 2→1·1=1, 3/4 unmatched")
    assert(out.getAs[Long]("n_matched_keys") == 2)
    assert(out.getAs[Long]("max_key_pairs") == 12)
    assert(out.getAs[Long]("n_hot_keys") == 1, "only key 1 crosses threshold 10")
    assert(math.abs(out.getAs[Double]("skew_ratio") - 12.0 / 6.5) < 1e-12)
    assert(out.getAs[Long]("n_null_left") == 1 && out.getAs[Long]("n_null_right") == 1,
      "dropped null-key volume must stay visible")
  }

  test("hotKeys ranks by contribution with exact shares") {
    val out = JoinPreflight.hotKeys(left, col("k"), right, col("k"), topN = 1)
      .collect().head
    assert(out.getAs[Long]("key") == 1L)
    assert(out.getAs[Long]("n_left") == 3 && out.getAs[Long]("n_right") == 4)
    assert(out.getAs[Long]("pairs") == 12)
    assert(out.getAs[Long]("est_total_pairs") == 13)
    assert(math.abs(out.getAs[Double]("share") - 12.0 / 13.0) < 1e-12)
  }

  test("empty intersection forecasts zero, not an error") {
    val l = Seq((1L, "x")).toDF("k", "p")
    val r = Seq((2L, "y")).toDF("k", "v")
    val out = JoinPreflight.summary(l, col("k"), r, col("k")).collect().head
    assert(out.getAs[Long]("est_rows") == 0 && out.getAs[Long]("n_matched_keys") == 0)
    assert(out.getAs[Long]("max_key_pairs") == 0)
    assert(out.isNullAt(out.fieldIndex("skew_ratio")))
  }

  test("sketchForecast is exact below 2^lgK keys and matches the uniform-pairs formula") {
    // keys 1..20 on the left with 3 rows each, keys 11..30 on the right
    // with 2 rows each — overlap 11..20, uniform multiplicities so the
    // independence estimate is exact: 10 * 3 * 2 = 60 pairs
    val l = (1L to 20L).flatMap(k => Seq.fill(3)((k, "x"))).toDF("k", "p")
    val r = (11L to 30L).flatMap(k => Seq.fill(2)((k, "y"))).toDF("k", "v")
    val out = JoinPreflight.sketchForecast(l, col("k"), r, col("k")).collect().head
    assert(out.getAs[Long]("n_left") == 60 && out.getAs[Long]("n_right") == 40)
    assert(out.getAs[Long]("keys_left_est") == 20)
    assert(out.getAs[Long]("keys_right_est") == 20)
    assert(out.getAs[Long]("keys_match_est") == 10)
    assert(math.abs(out.getAs[Double]("est_pairs") - 60.0) < 1e-9)
    // exact cross-check against the full instrument
    val exact = JoinPreflight.summary(l, col("k"), r, col("k"))
      .collect().head.getAs[Long]("est_rows")
    assert(exact == 60L)
  }

  test("sketchForecast ignores null keys on both sides") {
    val l = Seq((Some(1L), "a"), (None, "b"), (Some(1L), "c"))
      .toDF("k", "p")
    val r = Seq((Some(1L), "y"), (None, "z")).toDF("k", "v")
    val out = JoinPreflight.sketchForecast(l, col("k"), r, col("k")).collect().head
    assert(out.getAs[Long]("n_left") == 2 && out.getAs[Long]("n_right") == 1)
    assert(out.getAs[Long]("keys_match_est") == 1)
    assert(math.abs(out.getAs[Double]("est_pairs") - 2.0) < 1e-9)
  }
}
