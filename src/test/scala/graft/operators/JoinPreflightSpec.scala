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
}
