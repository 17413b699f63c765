package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KpisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val movies = Seq(
    ("a", 100.0, 10.0, 7.1), ("b", 100.0, 50.0, 8.0),
    ("c", 300.0, 5.0, 6.0), ("d", 50.0, 20.0, 9.9))
    .toDF("title", "revenue", "budget", "rating")

  test("rankTopN orders by metric with deterministic tie-break") {
    val top = Kpis.rankTopN(movies, col("revenue"), descending = true, n = 2,
      tieBreak = Seq(col("title"))).select("title").as[String].collect()
    assert(top.toSeq == Seq("c", "a")) // a before b on the 100.0 tie
  }

  test("rankTopN ascending with filter (lowest-budget style)") {
    val low = Kpis.rankTopN(movies, col("budget"), descending = false, n = 1,
      filter = Some(col("revenue") >= 100), tieBreak = Seq(col("title")))
    assert(low.select("title").as[String].head() == "c")
  }

  test("rankByRatio only ranks rows where denominator qualifies") {
    val roi = Kpis.rankByRatio(movies, col("revenue"), col("budget"),
      denomOk = col("budget") >= 10, as = "roi", n = 10, tieBreak = Seq(col("title")))
    val titles = roi.select("title").as[String].collect().toSet
    assert(!titles.contains("c")) // budget 5 excluded
    assert(roi.select("title").as[String].head() == "a") // 100/10 = 10 highest
  }

  test("search ANDs predicates") {
    val hits = Kpis.search(movies,
      Seq(col("title").isin("a", "b", "c"), col("rating") >= 7),
      Seq(col("title").asc), 10)
    assert(hits.select("title").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("groupFlagStats computes exact median per segment") {
    val df = Seq((true, 1.0), (true, 3.0), (false, 10.0), (false, 20.0), (false, 90.0))
      .toDF("f", "v")
    val out = Kpis.groupFlagStats(df, col("f"), col("v")).orderBy("flag")
      .select("median_value").as[Double].collect()
    assert(out.toSeq == Seq(20.0, 2.0)) // false first, even-count interpolates
  }

  test("topGroups orders by sum desc with name tie-break") {
    val df = Seq(("x", 5.0), ("x", 5.0), ("y", 10.0), ("z", 1.0)).toDF("g", "v")
    val out = Kpis.topGroups(df, col("g"), col("v"), n = 2)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "y")) // 10.0 tie → x < y
    assert(rows.head.getLong(1) == 2L)
  }

  test("explodeAgg splits on a LITERAL delimiter (pipe is not a regex), drops empties") {
    val df = Seq(("Action|Drama", 10.0), ("Drama", 20.0), ("|", 1.0)).toDF("genres", "score")
    val out = Kpis.explodeAgg(df, col("genres"), "|", col("score"), 10)
    val drama = out.filter(col("token") === "Drama").head()
    assert(drama.getLong(1) == 2L && drama.getDouble(2) == 15.0)
    assert(out.filter(col("token") === "").count() == 0)
  }

  test("topFractionPerGroup keeps the best fraction per group, cutoffs independent") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.5), ("a", 3L, 0.1), ("a", 4L, 0.7), ("a", 5L, 0.3),
      ("b", 6L, 0.2), ("b", 7L, 0.1)).toDF("g", "id", "q")
    val kept = Kpis.topFractionPerGroup(df, col("g"), col("q"), 0.25, Seq(col("id")))
      .select("id").as[Long].collect().toSet
    // group a (n=5): percent_rank <= 0.25 keeps ranks 1-2 (pr 0, 0.25);
    // group b (n=2): keeps rank 1 only — its cutoff adapts to b's scores
    assert(kept == Set(1L, 4L, 6L))
  }

  test("equiDepthHistogram: uniform data splits into equal-depth buckets with true min/max") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Kpis.equiDepthHistogram(df, col("v"), buckets = 4, lo = 0.0, hi = 100.0, cells = 100)
      .orderBy("bucket")
      .select("bucket", "n", "lo", "hi").as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._2) == Seq(25L, 25L, 25L, 25L))
    assert(out.head._3 == 1.0 && out.last._4 == 100.0)
    // buckets tile the data: each bucket's hi < next bucket's lo
    out.sliding(2).foreach { case Seq(a, b) => assert(a._4 < b._3) case _ => }
  }

  test("equiDepthHistogram: out-of-range values clamp into edge cells; skew collapses buckets") {
    val df = (Seq(-50.0, 500.0) ++ Seq.fill(98)(10.0)).toDF("v")
    val out = Kpis.equiDepthHistogram(df, col("v"), buckets = 4, lo = 0.0, hi = 100.0, cells = 100)
      .orderBy("bucket")
      .select("bucket", "n", "lo", "hi").as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._2).sum == 100L, "clamping must lose no row")
    assert(out.head._3 == -50.0 && out.last._4 == 500.0)
    // 98% identical values: one cell's population can't split across
    // buckets, so the mass lands in a single bucket
    val big = out.filter(_._2 >= 98L)
    assert(big.size == 1, s"expected one dominant bucket, got $out")
  }

  test("rollingActiveUsers: trailing windows count distinct users; duplicate events collapse") {
    def t(d: String) = java.sql.Timestamp.valueOf(s"2024-01-0$d 10:00:00")
    val ev = Seq(
      (t("1"), "A"), (t("1"), "A"), (t("1"), "B"),  // A's dup event must not double-count
      (t("2"), "A"),
      (t("9"), "C")
    ).toDF("ts", "user_id")
    val out = Kpis.rollingActiveUsers(ev, col("ts"), col("user_id"), windowDays = 3)
      .orderBy("day")
      .select(col("day").cast("string"), col("dau"), col("n_active"), col("stickiness"))
      .as[(String, Long, Long, Double)].collect().toSeq
    val byDay = out.map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(byDay("2024-01-01") == ((2L, 2L, 1.0)))
    assert(byDay("2024-01-02") == ((1L, 2L, 0.5)))   // window covers day1+day2
    assert(byDay("2024-01-03") == ((0L, 2L, 0.0)))   // nobody active, window still holds A,B
    assert(byDay("2024-01-04") == ((0L, 1L, 0.0)))   // only day2's A remains
    assert(!byDay.contains("2024-01-05"), "empty windows produce no row")
    assert(byDay("2024-01-09") == ((1L, 1L, 1.0)))
    assert(out.size == 7, s"got $out")               // days 1-4 and 9-11
  }

  test("rfm: the dominant customer scores top tile on all three axes") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // customer 9: latest order, most orders, most spend; customer 1: worst
    val orders = Seq(
      (1L, d("2024-01-01"), 10.0),
      (2L, d("2024-02-01"), 20.0), (2L, d("2024-02-02"), 20.0),
      (3L, d("2024-03-01"), 30.0), (3L, d("2024-03-02"), 30.0), (3L, d("2024-03-03"), 30.0),
      (9L, d("2024-04-01"), 99.0), (9L, d("2024-04-02"), 99.0),
      (9L, d("2024-04-03"), 99.0), (9L, d("2024-04-04"), 99.0))
      .toDF("cust", "odate", "amt")
    val got = Kpis.rfm(orders, col("cust"), col("odate"), col("amt"), buckets = 4)
      .orderBy("customer")
      .select("customer", "r_score", "f_score", "m_score")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1L, 1L), (2L, 2L, 2L, 2L), (3L, 3L, 3L, 3L),
      (9L, 4L, 4L, 4L)))
  }

  test("equiDepthHistogram rejects bad grids") {
    val df = Seq(1.0).toDF("v")
    assertThrows[IllegalArgumentException] {
      Kpis.equiDepthHistogram(df, col("v"), buckets = 10, lo = 0.0, hi = 1.0, cells = 5)
    }
    assertThrows[IllegalArgumentException] {
      Kpis.equiDepthHistogram(df, col("v"), buckets = 2, lo = 1.0, hi = 1.0)
    }
  }

  test("explodeAgg rejects inputs that already have a 'token' column") {
    val df = Seq(("a|b", "x")).toDF("genres", "token")
    assertThrows[IllegalArgumentException] {
      Kpis.explodeAgg(df, col("genres"), "|", lit(1.0), 10)
    }
  }
}
