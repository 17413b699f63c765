package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // (user, variant, event_type, value)
  private def events(rows: (Long, String, String, Double)*) =
    rows.toDF("u", "v", "et", "value")

  test("variantSummary counts entities once regardless of event volume") {
    // user 1 (A) converts twice; user 2 (A) never; user 3 (B) once
    val df = events(
      (1L, "A", "buy", 5.0), (1L, "A", "buy", 7.0), (1L, "A", "view", 0.0),
      (2L, "A", "view", 0.0),
      (3L, "B", "buy", 2.0))
    val out = Experiment.variantSummary(df, col("u"), col("v"),
        col("et") === "buy", col("value"))
      .orderBy("variant").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    val a = out(0)
    assert(a.getLong(1) == 2 && a.getLong(2) == 1, "2 exposed, 1 converted — not 2")
    assert(math.abs(a.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(a.getDouble(4) - 12.0) < 1e-12, "both converting events' values sum")
    val b = out(1)
    assert(b.getLong(1) == 1 && b.getLong(2) == 1 && math.abs(b.getDouble(4) - 2.0) < 1e-12)
  }

  test("abTest computes the pooled two-proportion z and SRM by hand") {
    // A: 4 users, 1 converts (p=0.25); B: 4 users, 3 convert (p=0.75)
    val rows = (1L to 4L).map(u => (u, "A", if (u == 1) "buy" else "view", 1.0)) ++
      (5L to 8L).map(u => (u, "B", if (u < 8) "buy" else "view", 1.0))
    val out = Experiment.abTest(events(rows: _*), col("u"), col("v"),
      col("et") === "buy", col("value")).collect().head
    assert(out.getAs[String]("variant_a") == "A" && out.getAs[String]("variant_b") == "B")
    assert(out.getAs[Long]("n_a") == 4 && out.getAs[Long]("n_b") == 4)
    assert(out.getAs[Long]("conv_a") == 1 && out.getAs[Long]("conv_b") == 3)
    // p_pool = 0.5; se = sqrt(0.5*0.5*(1/4+1/4)) = sqrt(0.125)
    val z = out.getAs[Double]("z_score")
    assert(math.abs(z - 0.5 / math.sqrt(0.125)) < 1e-12)
    assert(math.abs(out.getAs[Double]("lift_pct") - 200.0) < 1e-9)
    assert(out.getAs[Double]("srm_chi2") == 0.0)
  }

  test("abTest zero-conversion experiment yields null z and lift, not a divide error") {
    val rows = Seq((1L, "A", "view", 0.0), (2L, "B", "view", 0.0))
    val out = Experiment.abTest(events(rows: _*), col("u"), col("v"),
      col("et") === "buy", col("value")).collect().head
    assert(out.isNullAt(out.fieldIndex("z_score")), "se = 0 → null, never DIVIDE_BY_ZERO")
    assert(out.isNullAt(out.fieldIndex("lift_pct")), "rate_a = 0 → null lift")
  }

  test("abTest flags a sample-ratio mismatch") {
    // 9 vs 1 split where 5/5 was expected: chi2 = (9-1)^2/10 = 6.4 > 3.84
    val rows = (1L to 9L).map(u => (u, "A", "view", 0.0)) :+ ((10L, "B", "view", 0.0))
    val out = Experiment.abTest(events(rows: _*), col("u"), col("v"),
      col("et") === "buy", col("value")).collect().head
    assert(math.abs(out.getAs[Double]("srm_chi2") - 6.4) < 1e-12)
  }

  test("assignVariant is deterministic, salted, and covers all arms") {
    val ids = (1L to 2000L).toDF("id")
    val assigned = ids.select(col("id"),
      Experiment.assignVariant(col("id"), "exp1").as("v1"),
      Experiment.assignVariant(col("id"), "exp1").as("v1b"),
      Experiment.assignVariant(col("id"), "exp2").as("v2"),
      Experiment.assignVariant(col("id"), "exp3", n = 3).as("v3"))
    assert(assigned.filter(col("v1") =!= col("v1b")).count() == 0, "same salt → same split")
    assert(assigned.filter(col("v1") =!= col("v2")).count() > 0, "salt changes the split")
    val arms1 = assigned.select("v1").distinct().as[String].collect().toSet
    assert(arms1 == Set("A", "B"))
    val arms3 = assigned.select("v3").distinct().as[String].collect().toSet
    assert(arms3 == Set("A", "B", "C"))
    // hash split is near-balanced: a real SRM would show here
    val nA = assigned.filter(col("v1") === "A").count()
    assert(math.abs(nA - 1000L) < 150, s"md5 split badly unbalanced: $nA/2000")
  }

  test("cuped: θ=1 on a perfectly predictive covariate; effect preserved exactly") {
    // y = x + 1·(arm B); x balanced across arms → θ = cov/var = 1,
    // adjusted metric collapses to a constant per arm, Δ preserved
    val rows = (1 to 4).map(i => (s"a$i", "A", i.toDouble, i.toDouble)) ++
      (1 to 4).map(i => (s"b$i", "B", i.toDouble + 1, i.toDouble))
    val r = Experiment.cuped(rows.toDF("e", "v", "y", "x"),
      col("e"), col("v"), col("y"), col("x")).head()
    assert(math.abs(r.getAs[Double]("theta") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_adj_a") - 2.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_adj_b") - 3.5) < 1e-12)
    // the adjusted effect equals the raw effect (balanced covariate)
    assert(math.abs((r.getAs[Double]("mean_adj_b") - r.getAs[Double]("mean_adj_a")) -
      (r.getAs[Double]("mean_b") - r.getAs[Double]("mean_a"))) < 1e-12)
    // all variance explained
    assert(math.abs(r.getAs[Double]("var_reduction") - 1.0) < 1e-12)
  }

  test("cuped: noisy covariate still sharpens the readout; z_adj beats z_raw") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 400).map { i =>
      val arm = if (i % 2 == 0) "A" else "B"
      val x = rnd.nextDouble() * 100           // pre-period activity
      val effect = if (arm == "B") 2.0 else 0.0
      (s"u$i", arm, x + rnd.nextDouble() * 5 + effect, x)
    }
    val r = Experiment.cuped(rows.toDF("e", "v", "y", "x"),
      col("e"), col("v"), col("y"), col("x")).head()
    assert(r.getAs[Double]("var_reduction") > 0.9) // x explains most of y
    assert(math.abs(r.getAs[Double]("z_adj")) > math.abs(r.getAs[Double]("z_raw")),
      s"adjusted ${r.getAs[Double]("z_adj")} must beat raw ${r.getAs[Double]("z_raw")}")
  }

  test("cuped: zero-variance covariate degrades to the unadjusted test, never nulls") {
    val rows = Seq(("a", "A", 1.0, 7.0), ("b", "A", 2.0, 7.0),
      ("c", "B", 3.0, 7.0), ("d", "B", 5.0, 7.0))
    val r = Experiment.cuped(rows.toDF("e", "v", "y", "x"),
      col("e"), col("v"), col("y"), col("x")).head()
    assert(r.getAs[Double]("theta") === 0.0)
    assert(r.getAs[Double]("mean_adj_a") === r.getAs[Double]("mean_a"))
    assert(math.abs(r.getAs[Double]("var_reduction")) < 1e-12)
    assert(r.getAs[Double]("z_adj") === r.getAs[Double]("z_raw"))
  }

  test("cuped: events collapse to the entity grain first (whales count once)") {
    // entity "a" has 3 events; its metric is the SUM, one exposure
    val rows = Seq(("a", "A", 1.0, 1.0), ("a", "A", 1.0, 1.0), ("a", "A", 1.0, 1.0),
      ("b", "A", 1.0, 1.0), ("c", "B", 4.0, 1.0), ("d", "B", 2.0, 1.0))
    val r = Experiment.cuped(rows.toDF("e", "v", "y", "x"),
      col("e"), col("v"), col("y"), col("x")).head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(math.abs(r.getAs[Double]("mean_a") - 2.0) < 1e-12) // (3 + 1)/2
  }

  test("cuped: an entity observed under multiple variants fails loud") {
    // entity "a" logged under both arms = broken assignment; silently
    // coercing it into arm B (max) would bias the readout
    val rows = Seq(("a", "A", 1.0, 1.0), ("a", "B", 2.0, 1.0),
      ("b", "A", 1.0, 1.0), ("c", "B", 4.0, 1.0))
    val ex = intercept[Exception] {
      Experiment.cuped(rows.toDF("e", "v", "y", "x"),
        col("e"), col("v"), col("y"), col("x")).collect()
    }
    assert(ex.getMessage.contains("multiple variants"), ex.getMessage)
  }

  test("cuped: a three-arm experiment fails loud, never collapses to the extremes") {
    val rows = Seq(("a", "A", 1.0, 1.0), ("b", "B", 2.0, 1.0),
      ("c", "C", 3.0, 1.0), ("d", "A", 1.5, 1.0))
    val ex = intercept[Exception] {
      Experiment.cuped(rows.toDF("e", "v", "y", "x"),
        col("e"), col("v"), col("y"), col("x")).collect()
    }
    assert(ex.getMessage.contains("exactly two variants"), ex.getMessage)
  }
}
