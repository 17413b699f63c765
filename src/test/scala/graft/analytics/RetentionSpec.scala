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

  /** Reference sBG survival/churn series in plain Scala. */
  private def sbg(a: Double, b: Double, tMax: Int): (Seq[Double], Seq[Double]) = {
    val p = scala.collection.mutable.ArrayBuffer[Double]()
    val s = scala.collection.mutable.ArrayBuffer[Double]()
    var (pp, ss) = (0.0, 1.0)
    for (i <- 1 to tMax) {
      pp = if (i == 1) a / (a + b) else pp * (b + i - 2) / (a + b + i - 1)
      ss = ss * (b + i - 1) / (a + b + i - 1)
      p += pp; s += ss
    }
    (p.toSeq, s.toSeq)
  }

  test("sbgProjection: exact recovery of generating parameters from a model curve") {
    // curve generated from sBG(α=2, β=3): the grid contains the truth,
    // and Gibbs' inequality makes it the unique grid argmax
    val (_, s) = sbg(2.0, 3.0, 6)
    val curve = ((0, 1000.0) +: (1 to 6).map(i => (i, 1000.0 * s(i - 1)))).toDF("t", "n")
    val rows = Retention.sbgProjection(curve, col("t"), col("n"), horizon = 12)
      .orderBy("t").collect()
    assert(rows.length === 13)
    assert(math.abs(rows.head.getAs[Double]("alpha") - 2.0) < 1e-9)
    assert(math.abs(rows.head.getAs[Double]("beta") - 3.0) < 1e-9)
    // projection equals the closed recurrences, INCLUDING beyond T
    val (_, s12) = sbg(2.0, 3.0, 12)
    for (r <- rows; t = r.getAs[Int]("t"); if t >= 1)
      assert(math.abs(r.getAs[Double]("projected") - s12(t - 1)) < 1e-12, s"t=$t")
    // observed matches the curve through T and is null beyond
    assert(rows.head.getAs[Double]("observed") === 1.0)
    assert(math.abs(rows(6).getAs[Double]("observed") - s(5)) < 1e-12)
    assert(rows(7).isNullAt(rows(7).fieldIndex("observed")))
    assert(rows.head.getAs[Double]("projected") === 1.0)
  }

  test("sbgProjection: the fitted curve flattens (beta-heterogeneity), geometric does not") {
    // real-world-shaped curve: steep early drop, long flat tail
    val curve = Seq((0, 100.0), (1, 60.0), (2, 47.0), (3, 40.0), (4, 36.0))
      .toDF("t", "n")
    val rows = Retention.sbgProjection(curve, col("t"), col("n"), horizon = 24)
      .orderBy("t").collect()
    val proj = rows.map(r => r.getAs[Int]("t") -> r.getAs[Double]("projected")).toMap
    // monotone non-increasing, and the marginal churn RATE falls with t
    assert((1 to 24).forall(t => proj(t) <= proj(t - 1) + 1e-12))
    val rate4 = 1 - proj(4) / proj(3)
    val rate24 = 1 - proj(24) / proj(23)
    assert(rate24 < rate4, "sBG survivor selection must flatten the tail")
    // the fit tracks the observed points reasonably (within 3 pts)
    for ((t, n) <- Seq(1 -> 0.60, 2 -> 0.47, 3 -> 0.40, 4 -> 0.36))
      assert(math.abs(proj(t) - n) < 0.03, s"t=$t proj=${proj(t)}")
  }

  test("sbgProjection: a gapped curve fails loud, never misindexes") {
    // t=2 missing (an all-inactive week): the positional fold would
    // silently misalign every churn step — the contiguity guard fires
    val gapped = Seq((0, 100.0), (1, 60.0), (3, 40.0), (4, 36.0)).toDF("t", "n")
    val ex = intercept[Exception] {
      Retention.sbgProjection(gapped, col("t"), col("n"), horizon = 6).collect()
    }
    assert(ex.getMessage.contains("contiguous"), ex.getMessage)
    // a curve not starting at 0 fails the same way
    val shifted = Seq((1, 100.0), (2, 60.0), (3, 40.0)).toDF("t", "n")
    val ex2 = intercept[Exception] {
      Retention.sbgProjection(shifted, col("t"), col("n"), horizon = 6).collect()
    }
    assert(ex2.getMessage.contains("contiguous"), ex2.getMessage)
    // a duplicate offset exactly compensating a gap (k == maxT + 1,
    // first == 0) must ALSO fail — distinctness is checked explicitly
    val dupGap = Seq((0, 100.0), (1, 60.0), (1, 58.0), (3, 40.0)).toDF("t", "n")
    val ex3 = intercept[Exception] {
      Retention.sbgProjection(dupGap, col("t"), col("n"), horizon = 6).collect()
    }
    assert(ex3.getMessage.contains("contiguous"), ex3.getMessage)
    // an EMPTY curve must fail with the same contract message — under
    // ANSI a bare element_at(arr, 1) would die with an opaque
    // INVALID_ARRAY_INDEX error before the guard could speak
    val empty = Seq.empty[(Int, Double)].toDF("t", "n")
    val ex4 = intercept[Exception] {
      Retention.sbgProjection(empty, col("t"), col("n"), horizon = 6).collect()
    }
    assert(ex4.getMessage.contains("contiguous"), ex4.getMessage)
  }
}
