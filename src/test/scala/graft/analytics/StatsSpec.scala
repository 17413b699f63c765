package graft.analytics

import graft.{PlanShapes, SparkSpec}
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("correlationMatrix: exact values on hand-computable data") {
    // y = 2x (corr 1), z = -x (corr -1); cov_samp(x, 2x) = 2*var_samp(x)
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0))
      .toDF("x", "y", "z").withColumn("g", lit("a"))
    val r = Stats.correlationMatrix(df, Seq(col("g")), Seq("x", "y", "z")).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("corr_x_y") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_x_z") + 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_y_z") + 1.0) < 1e-12)
    val varX = Seq(1.0, 2.0, 3.0, 4.0).map(v => (v - 2.5) * (v - 2.5)).sum / 3
    assert(math.abs(r.getAs[Double]("cov_x_y") - 2 * varX) < 1e-12)
  }

  test("groups are independent; constant columns yield null corr") {
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0), ("b", 1.0, 1.0), ("b", 2.0, 2.0))
      .toDF("g", "x", "y")
    val rows = Stats.correlationMatrix(df, Seq(col("g")), Seq("x", "y"))
      .orderBy("g").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("corr_x_y"))) // zero variance in y
    assert(math.abs(rows(1).getAs[Double]("corr_x_y") - 1.0) < 1e-12)
  }

  test("all pairs ride ONE aggregate: single shuffle, no extra scans") {
    val df = spark.range(100).select(
      (col("id") % 7).as("g"), col("id").cast("double").as("a"),
      (col("id") * 2).cast("double").as("b"), (col("id") % 13).cast("double").as("c"))
    val shape = PlanShapes.executedShape(
      Stats.correlationMatrix(df, Seq(col("g")), Seq("a", "b", "c")))
    assert(shape.shuffles === 1, s"expected one group-key shuffle, got $shape")
  }

  test("ksTest: D matches the brute-force CDF gap; identical samples give p=1") {
    val a = Seq(1.0, 1.0, 2.0, 3.0, 5.0, 8.0).toDF("v")
    val b = Seq(1.0, 2.0, 2.0, 4.0, 4.0, 9.0, 9.0).toDF("v")
    val row = Stats.ksTest(a, b, col("v")).head()
    assert(row.getAs[Long]("n_a") == 6L && row.getAs[Long]("n_b") == 7L)
    // brute force over the union support
    val av = Seq(1.0, 1.0, 2.0, 3.0, 5.0, 8.0)
    val bv = Seq(1.0, 2.0, 2.0, 4.0, 4.0, 9.0, 9.0)
    val dWant = (av ++ bv).distinct.map { x =>
      math.abs(av.count(_ <= x).toDouble / av.size - bv.count(_ <= x).toDouble / bv.size)
    }.max
    assert(math.abs(row.getAs[Double]("d_stat") - dWant) < 1e-12)
    // p replicated with the same NR correction + 100-term series
    val ne = 6.0 * 7 / 13
    val lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * dWant
    val pWant = math.min(1.0, math.max(0.0, 2.0 * (1 to 100).map(k =>
      (if (k % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * k * k * lam * lam)).sum))
    assert(math.abs(row.getAs[Double]("p_value") - pWant) < 1e-12)
    // identical samples: D = 0, and the small-λ guard makes p exactly 1
    val same = Stats.ksTest(a, a, col("v")).head()
    assert(same.getAs[Double]("d_stat") == 0.0 && same.getAs[Double]("p_value") == 1.0)
    // disjoint supports: D = 1, p ~ 0
    val disj = Stats.ksTest(Seq(1.0, 2.0).toDF("v"), Seq(9.0, 10.0, 11.0).toDF("v"),
      col("v")).head()
    assert(disj.getAs[Double]("d_stat") == 1.0)
    assert(disj.getAs[Double]("p_value") < 0.2)
  }

  test("ksTest: nulls excluded, empty side yields null D and p") {
    val a = Seq(Some(1.0), None, Some(2.0)).toDF("v")
    val empty = Seq.empty[Option[Double]].toDF("v")
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    val r = Stats.ksTest(a, a, col("v")).head()
    assert(r.getAs[Long]("n_a") == 2L, "nulls must not count")
    for (other <- Seq(empty, allNull)) {
      val e = Stats.ksTest(a, other, col("v")).head()
      assert(e.isNullAt(e.fieldIndex("d_stat")) && e.isNullAt(e.fieldIndex("p_value")))
    }
  }

  test("gini: perfect equality 0, single holder (n-1)/n, hand value, tie-invariance") {
    import spark.implicits._
    def g(vals: Seq[Double]): Double =
      Stats.gini(vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id"),
        col("v"), Seq(col("id"))).collect().head.getAs[Double]("gini")
    assert(math.abs(g(Seq(5.0, 5.0, 5.0, 5.0))) < 1e-12)
    assert(math.abs(g(Seq(0.0, 0.0, 0.0, 8.0)) - 0.75) < 1e-12)
    assert(math.abs(g(Seq(1.0, 2.0, 3.0, 4.0)) - 0.25) < 1e-12)
    // tied values: rank assignment among ties cannot move the statistic
    assert(math.abs(g(Seq(2.0, 2.0, 6.0)) - g(Seq(2.0, 6.0, 2.0))) < 1e-12)
  }

  test("gini rejects negative values loudly") {
    import spark.implicits._
    val df = Seq((1.0, 1L), (-2.0, 2L)).toDF("v", "id")
    intercept[Exception] {
      Stats.gini(df, col("v"), Seq(col("id"))).collect()
    }
  }

  test("cramersV: perfect association is 1, independence is 0") {
    val perfect = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))).toDF("a", "b")
    val p = Stats.cramersV(perfect, col("a"), col("b"))
      .select("n", "chi2", "cramers_v").as[(Long, Double, Double)].head()
    assert(p._1 == 20L && math.abs(p._2 - 20.0) < 1e-9 && math.abs(p._3 - 1.0) < 1e-9)

    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val i = Stats.cramersV(indep, col("a"), col("b"))
      .select("chi2", "cramers_v").as[(Double, Double)].head()
    assert(math.abs(i._1) < 1e-9 && math.abs(i._2) < 1e-9)
  }

  test("cramersV: empty cells contribute their expected count via the closed form") {
    // cells (A,1)=10, (A,2)=10, (B,1)=10, (B,2) EMPTY
    // e = 13.33/6.67/6.67/3.33 → χ² = 4.1667 + 3.3333 = 7.5, V = √(7.5/30) = 0.5
    val df = (Seq.fill(10)(("A", 1)) ++ Seq.fill(10)(("A", 2)) ++ Seq.fill(10)(("B", 1)))
      .toDF("a", "b")
    val r = Stats.cramersV(df, col("a"), col("b"))
      .select("n", "r", "c", "chi2", "cramers_v")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 == 30L && r._2 == 2L && r._3 == 2L)
    assert(math.abs(r._4 - 7.5) < 1e-9, s"chi2=${r._4}")
    assert(math.abs(r._5 - 0.5) < 1e-9)
  }

  test("cramersV: a single-level column yields null V, not a division error") {
    val df = Seq(("only", "p"), ("only", "q")).toDF("a", "b")
    val r = Stats.cramersV(df, col("a"), col("b"))
      .select("cramers_v").as[Option[Double]].head()
    assert(r.isEmpty)
  }

  test("mannWhitney: hand-computed U and tie-corrected z; side swap complements U and negates z") {
    // a=[1,2,2,5], b=[2,3,4]: ranks 1,(3,3),(3),5,6,7 → ΣR_a=14, U_a=4
    // ties: one group of 3 → Σ(t³−t)=24; var = 1·(8 − 24/42) = 52/7
    val a = Seq(1.0, 2.0, 2.0, 5.0).toDF("value")
    val b = Seq(2.0, 3.0, 4.0).toDF("value")
    val r = Stats.mannWhitney(a, b, col("value"))
      .select("n_a", "n_b", "u_a", "z").as[(Long, Long, Double, Double)].head()
    assert(r._1 === 4L && r._2 === 3L)
    assert(math.abs(r._3 - 4.0) < 1e-12)
    val wantZ = (4.0 - 6.0) / math.sqrt(52.0 / 7)
    assert(math.abs(r._4 - wantZ) < 1e-12)
    val sw = Stats.mannWhitney(b, a, col("value"))
      .select("u_a", "z").as[(Double, Double)].head()
    assert(math.abs(sw._1 - (12.0 - 4.0)) < 1e-12) // U_a + U_b = n_a·n_b
    assert(math.abs(sw._2 + wantZ) < 1e-12)
  }

  test("mannWhitney: identical constant samples give null z; nulls excluded") {
    val a = Seq(Some(5.0), Some(5.0), None).toDF("value")
    val b = Seq(5.0, 5.0).toDF("value")
    val r = Stats.mannWhitney(a, b, col("value"))
      .select("n_a", "z").as[(Long, Option[Double])].head()
    assert(r._1 === 2L) // null excluded
    assert(r._2.isEmpty) // zero variance (all tied) → null, not an error
  }

  test("benford: digit counts, shares and chi2 on hand data; sub-1 excluded; power-of-ten safe") {
    val df = Seq(1.0, 19.0, 23.0, 2.5, 0.3, 345.0, 1000.0, 999.9999).toDF("v")
    // digits of floor(v>=1): 1,1,2,2,3,1,9 → 1:3, 2:2, 3:1, 9:1, n=7
    val got = Stats.benford(df, col("v")).orderBy("digit")
      .select("digit", "n", "obs_share", "exp_share", "chi2")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((1, 3L), (2, 2L), (3, 1L), (9, 1L)))
    val obs = Map(1 -> 3.0 / 7, 2 -> 2.0 / 7, 3 -> 1.0 / 7, 9 -> 1.0 / 7)
    def expd(d: Int) = math.log10(1.0 + 1.0 / d)
    got.foreach { r =>
      assert(math.abs(r._3 - obs(r._1)) < 1e-12)
      assert(math.abs(r._4 - expd(r._1)) < 1e-12)
    }
    val chi2 = 7 * obs.map { case (d, o) => math.pow(o - expd(d), 2) / expd(d) }.sum
    assert(math.abs(got.head._5 - chi2) < 1e-9)
  }

  test("mutualInformation: perfect association ln2/NMI 1, independence 0, hand value") {
    val perfect = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2)).toDF("a", "b")
    val p = Stats.mutualInformation(perfect, col("a"), col("b"))
      .select("n", "mi", "nmi").as[(Long, Double, Double)].head()
    assert(p._1 === 4L)
    assert(math.abs(p._2 - math.log(2)) < 1e-12)
    assert(math.abs(p._3 - 1.0) < 1e-12)

    val indep = Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2)).toDF("a", "b")
    val i = Stats.mutualInformation(indep, col("a"), col("b"))
      .select("mi", "nmi").as[(Double, Double)].head()
    assert(math.abs(i._1) < 1e-12 && math.abs(i._2) < 1e-12)

    // cells (A,1)=2, (A,2)=2, (B,1)=4 — margins 4/4 and 6/2, n=8
    val hand = (Seq.fill(2)(("A", 1)) ++ Seq.fill(2)(("A", 2)) ++ Seq.fill(4)(("B", 1)))
      .toDF("a", "b")
    val h = Stats.mutualInformation(hand, col("a"), col("b"))
      .select("mi").as[Double].head()
    val want = 0.25 * math.log(2.0 / 3) + 0.25 * math.log(2.0) + 0.5 * math.log(4.0 / 3)
    assert(math.abs(h - want) < 1e-12)
  }

  test("mutualInformation: single-level column gives MI 0 and null NMI") {
    val df = Seq(("only", 1), ("only", 2)).toDF("a", "b")
    val r = Stats.mutualInformation(df, col("a"), col("b"))
      .select("mi", "nmi").as[(Double, Option[Double])].head()
    assert(math.abs(r._1) < 1e-12)
    assert(r._2.isEmpty)
  }

  // Independent mirror of poissonBootstrapCI's deterministic draw:
  // md5(id:salt:⌊r/2⌋) → hex chars [1+15(r%2), +15) → 60-bit int % 1e6 →
  // half-bucket-centered uniform → Poisson(1) inverse CDF.
  private def poisWeight(id: String, r: Int, salt: String = "bs"): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:$salt:${r / 2}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.slice(15 * (r % 2), 15 * (r % 2) + 15)
    val u = (java.lang.Long.parseLong(hex, 16) % 1000000L + 0.5) / 1000000.0
    val cdf = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167588507119, 0.9999824406472794)
    val k = cdf.indexWhere(u < _)
    (if (k < 0) 8 else k).toDouble
  }

  test("poissonBootstrapCI: replicate means and CI match a by-hand recompute") {
    val data = (1 to 30).map(i => ("g", i.toDouble, i.toLong))
    val df = data.toDF("grp", "v", "id")
    val r = Stats.poissonBootstrapCI(df, Seq("grp"), col("v"), col("id"),
      replicates = 12, alpha = 0.1).head()
    // by hand: 12 replicate weighted means, sorted; lo = elem max(1,⌊0.05·12⌋)=1,
    // hi = elem min(12,⌈0.95·12⌉)=12 (1-indexed)
    val means = (0 until 12).flatMap { rep =>
      val ws = data.map { case (_, v, id) => (poisWeight(id.toString, rep), v) }
      val sn = ws.map(_._1).sum
      if (sn == 0) None else Some(ws.map { case (w, v) => w * v }.sum / sn)
    }.sorted
    assert(r.getAs[Long]("n") === 30L)
    assert(math.abs(r.getAs[Double]("mean") - 15.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_lo") - means.head) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_hi") - means.last) < 1e-9)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
  }

  test("poissonBootstrapCI: constant values collapse the CI onto the mean; groups independent") {
    val df = (Seq.fill(20)(("a", 7.0)) ++ (1 to 20).map(i => ("b", i.toDouble)))
      .zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }.toDF("grp", "v", "id")
    val rows = Stats.poissonBootstrapCI(df, Seq("grp"), col("v"), col("id"))
      .orderBy("grp").collect()
    assert(rows(0).getAs[Double]("ci_lo") === 7.0)
    assert(rows(0).getAs[Double]("ci_hi") === 7.0)
    assert(rows(0).getAs[Double]("mean") === 7.0)
    val b = rows(1)
    assert(b.getAs[Double]("ci_lo") < b.getAs[Double]("ci_hi"))
    assert(b.getAs[Double]("ci_lo") <= b.getAs[Double]("mean") + 1e-9)
    assert(b.getAs[Double]("mean") <= b.getAs[Double]("ci_hi") + 1e-9)
  }

  test("poissonBootstrapCI: no window anywhere; replicate agg partial-aggregates") {
    val df = spark.range(200).select((col("id") % 5).cast("string").as("grp"),
      col("id").cast("double").as("v"), col("id").as("rid"))
    val shape = PlanShapes.executedShape(
      Stats.poissonBootstrapCI(df, Seq("grp"), col("v"), col("rid"), replicates = 8))
    assert(shape.windows === 0, s"bootstrap must not window over data: $shape")
  }

  test("ksTestGroupedVsRest: a two-group battery reproduces ksTest on either side") {
    val av = Seq(1.0, 1.0, 2.0, 3.0, 5.0, 8.0)
    val bv = Seq(1.0, 2.0, 2.0, 4.0, 4.0, 9.0, 9.0)
    val pooled = (av.map(("a", _)) ++ bv.map(("b", _))).toDF("g", "v")
    val want = Stats.ksTest(av.toDF("v"), bv.toDF("v"), col("v")).head()
    val got = Stats.ksTestGroupedVsRest(pooled, col("g"), col("v"))
      .orderBy("key").collect()
    assert(got.length === 2)
    for (r <- got) { // group-vs-rest is symmetric in a 2-group corpus
      assert(math.abs(r.getAs[Double]("d_stat") - want.getAs[Double]("d_stat")) < 1e-12)
      assert(math.abs(r.getAs[Double]("p_value") - want.getAs[Double]("p_value")) < 1e-12)
    }
    assert(got(0).getAs[Long]("n_group") === 6L && got(0).getAs[Long]("n_rest") === 7L)
    assert(got(1).getAs[Long]("n_group") === 7L && got(1).getAs[Long]("n_rest") === 6L)
  }

  test("ksTestGroupedVsRest: 3-group brute force; single-group corpus yields nulls") {
    val data = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 2.0, "b" -> 2.0, "b" -> 7.0,
      "c" -> 1.0, "c" -> 7.0, "c" -> 7.0, "c" -> 9.0)
    val got = Stats.ksTestGroupedVsRest(data.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("d_stat")).toMap
    val support = data.map(_._2).distinct
    for (g <- Seq("a", "b", "c")) {
      val mine = data.filter(_._1 == g).map(_._2)
      val rest = data.filter(_._1 != g).map(_._2)
      val want = support.map(x => math.abs(
        mine.count(_ <= x).toDouble / mine.size -
          rest.count(_ <= x).toDouble / rest.size)).max
      assert(math.abs(got(g) - want) < 1e-12, s"group $g")
    }
    val solo = Stats.ksTestGroupedVsRest(
      Seq("only" -> 1.0, "only" -> 2.0).toDF("g", "v"), col("g"), col("v")).head()
    assert(solo.getAs[Long]("n_rest") === 0L)
    assert(solo.isNullAt(solo.fieldIndex("d_stat")))
    assert(solo.isNullAt(solo.fieldIndex("p_value")))
  }

  test("bhFdr: hand-computed step-up rejections and q-values") {
    // m=5, α=0.25: thresholds αk/m = .05 .10 .15 .20 .25 → k*=4 (p₄=0.2
    // qualifies, p₅=0.5 does not); q = suffix-min of p·m/k =
    // [.05 .05 .05 .25 .5]
    val df = Seq(("h1", 0.01), ("h2", 0.02), ("h3", 0.03), ("h4", 0.2),
      ("h5", 0.5), ("hx", Double.NaN)).toDF("h", "p")
      .withColumn("p", when(col("h") === "hx", lit(null)).otherwise(col("p")))
    val got = Stats.bhFdr(df, col("p"), Seq(col("h")), alpha = 0.25)
      .orderBy("p_rank").collect()
    assert(got.length === 5) // null p is not a hypothesis
    assert(got.map(_.getAs[String]("h")).toSeq === Seq("h1", "h2", "h3", "h4", "h5"))
    assert(got.map(_.getAs[Boolean]("rejected")).toSeq ===
      Seq(true, true, true, true, false))
    val q = got.map(_.getAs[Double]("q_value"))
    assert(q.zip(Seq(0.05, 0.05, 0.05, 0.25, 0.5)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("bhFdr: a tie group qualifies as a block and shares one q") {
    // p = [.04, .04], α=.05: k=1 fails (.04 > .025), k=2 passes → BOTH
    // rejected by step-up; q = min over the suffix = .04 for both
    val df = Seq(("a", 0.04), ("b", 0.04)).toDF("h", "p")
    val got = Stats.bhFdr(df, col("p"), Seq(col("h")), alpha = 0.05).collect()
    assert(got.forall(_.getAs[Boolean]("rejected")))
    assert(got.forall(r => math.abs(r.getAs[Double]("q_value") - 0.04) < 1e-12))
    // nothing qualifies → nothing rejected, q intact
    val none = Stats.bhFdr(df, col("p"), Seq(col("h")), alpha = 0.01).collect()
    assert(none.forall(!_.getAs[Boolean]("rejected")))
  }

  test("welchTTest: hand values, sign symmetry, degenerate guards") {
    // a = {1,2,3} (mean 2, var 1), b = {4,6} (mean 5, var 2):
    // se² = 1/3 + 1 = 4/3, t = −3/√(4/3); df = (4/3)²/((1/9)/2 + 1/1)
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 6.0).toDF("v")
    val r = Stats.welchTTest(a, b, col("v")).head()
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    val tWant = -3.0 / math.sqrt(4.0 / 3)
    val dfWant = (4.0 / 3) * (4.0 / 3) / ((1.0 / 9) / 2 + 1.0)
    assert(math.abs(r.getAs[Double]("t") - tWant) < 1e-12)
    assert(math.abs(r.getAs[Double]("df") - dfWant) < 1e-12)
    // swap sides: t negates, p identical
    val s = Stats.welchTTest(b, a, col("v")).head()
    assert(math.abs(s.getAs[Double]("t") + r.getAs[Double]("t")) < 1e-12)
    assert(math.abs(s.getAs[Double]("p_approx") - r.getAs[Double]("p_approx")) < 1e-12)
    // identical constant samples: se = 0 → null t/p, not an error
    val c = Seq(5.0, 5.0).toDF("v")
    val d = Stats.welchTTest(c, c, col("v")).head()
    assert(d.isNullAt(d.fieldIndex("t")) && d.isNullAt(d.fieldIndex("p_approx")))
    // n=1 side is unevaluable
    val e = Stats.welchTTest(Seq(1.0).toDF("v"), a, col("v")).head()
    assert(e.isNullAt(e.fieldIndex("t")))
  }

  test("spearmanMatrix: monotone nonlinear is exactly ±1; Pearson is not") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 50.0).map(x => (x, x * x * x, -x))
      .toDF("x", "y", "z")
    val sp = Stats.spearmanMatrix(df, Seq("x", "y", "z")).head()
    assert(math.abs(sp.getAs[Double]("corr_x_y") - 1.0) < 1e-12)
    assert(math.abs(sp.getAs[Double]("corr_x_z") + 1.0) < 1e-12)
    val pe = Stats.correlationMatrix(df, Seq.empty, Seq("x", "y")).head()
    assert(pe.getAs[Double]("corr_x_y") < 0.999) // cubic bends the line
  }

  test("spearmanMatrix: average tie ranks, listwise deletion, constant column null") {
    val df = Seq(
      (Some(1.0), Some(1.0), Some(7.0)), (Some(2.0), Some(1.0), Some(7.0)),
      (Some(2.0), Some(2.0), Some(7.0)), (Some(3.0), Some(2.0), Some(7.0)),
      (Some(9.0), None, Some(7.0))) // null y → row dropped everywhere
      .toDF("x", "y", "c")
    val r = Stats.spearmanMatrix(df, Seq("x", "y", "c")).head()
    assert(r.getAs[Long]("n") === 4L)
    // reference Pearson over hand average ranks x=[1,2.5,2.5,4], y=[1.5,1.5,3.5,3.5]
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(1.5, 1.5, 3.5, 3.5)
    def corr(a: Seq[Double], b: Seq[Double]) = {
      val ma = a.sum / a.size; val mb = b.sum / b.size
      val cov = a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
      cov / math.sqrt(a.map(p => (p - ma) * (p - ma)).sum *
        b.map(q => (q - mb) * (q - mb)).sum)
    }
    assert(math.abs(r.getAs[Double]("corr_x_y") - corr(rx, ry)) < 1e-12)
    assert(r.isNullAt(r.fieldIndex("corr_x_c"))) // constant → zero rank variance
  }

  test("kruskalWallis: hand values without and with ties; all-tied yields nulls") {
    // g1={1,2}, g2={3,4}: ranks 1..4, R=(3,7) → H = .6·29 − 15 = 2.4, C=1
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 3.0), ("g2", 4.0)).toDF("g", "v")
    val r1 = Stats.kruskalWallis(a, col("g"), col("v")).head()
    assert(r1.getAs[Long]("k") === 2L && r1.getAs[Long]("n") === 4L)
    assert(math.abs(r1.getAs[Double]("h") - 2.4) < 1e-12)
    assert(math.abs(r1.getAs[Double]("h_tie") - 2.4) < 1e-12)
    // g1={1,1}, g2={2}: avg tie rank 1.5, R=(3,3) → H=1.5, C=.75, H'=2
    val b = Seq(("g1", 1.0), ("g1", 1.0), ("g2", 2.0)).toDF("g", "v")
    val r2 = Stats.kruskalWallis(b, col("g"), col("v")).head()
    assert(math.abs(r2.getAs[Double]("h") - 1.5) < 1e-12)
    assert(math.abs(r2.getAs[Double]("h_tie") - 2.0) < 1e-12)
    // all observations equal: H = 0 and the tie correction degenerates
    val c = Seq(("g1", 5.0), ("g1", 5.0), ("g2", 5.0)).toDF("g", "v")
    val r3 = Stats.kruskalWallis(c, col("g"), col("v")).head()
    assert(math.abs(r3.getAs[Double]("h")) < 1e-12)
    assert(r3.isNullAt(r3.fieldIndex("h_tie")) && r3.isNullAt(r3.fieldIndex("p_approx")))
  }

  test("kruskalWallis: matches an independent rank computation on 3 pseudo-random groups") {
    val data = (1 to 60).map(i => (s"g${i % 3}", ((i * 37) % 13).toDouble))
    val got = Stats.kruskalWallis(data.toDF("g", "v"), col("g"), col("v")).head()
    // reference: average ranks over the pooled sort
    val sorted = data.map(_._2).sorted
    val rank = data.map(_._2).distinct.map { v =>
      val lo = sorted.indexOf(v) + 1; val hi = sorted.lastIndexOf(v) + 1
      v -> (lo + hi) / 2.0
    }.toMap
    val n = data.size.toDouble
    val s = data.groupBy(_._1).values.map { g =>
      val rg = g.map(t => rank(t._2)).sum; rg * rg / g.size
    }.sum
    val h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    val tt = data.map(_._2).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val hT = h / (1 - tt / (n * n * n - n))
    assert(math.abs(got.getAs[Double]("h") - h) < 1e-9)
    assert(math.abs(got.getAs[Double]("h_tie") - hT) < 1e-9)
    // p mirrors the Wilson-Hilferty + A&S closed form exactly
    val k = 2.0
    val z = (math.cbrt(hT / k) - (1 - 2 / (9 * k))) / math.sqrt(2 / (9 * k))
    val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
    val poly = t * (0.319381530 + t * (-0.356563782 +
      t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    val pdf = math.exp(-0.5 * z * z) / math.sqrt(2 * math.Pi)
    // p = 1 − Φ(z); Φ(z<0) = pdf·poly(|z|) under the A&S reflection
    val pWant = if (z >= 0) pdf * poly else 1.0 - pdf * poly
    assert(math.abs(got.getAs[Double]("p_approx") - pWant) < 1e-9)
  }

  test("ebShrinkRates: method-of-moments prior and posterior shrink toward the mean") {
    // rates [.5 .75 .25] at n=4 each: μ=.5, s²=.125/3, α+β=5, α=β=2.5
    val rows = for {
      (k, y) <- Seq(("a", 2), ("b", 3), ("c", 1)); i <- 1 to 4
    } yield (k, if (i <= y) 1 else 0)
    val got = Stats.ebShrinkRates(rows.toDF("k", "s"), col("k"), col("s"))
      .orderBy("key").collect()
    assert(got.forall(r => math.abs(r.getAs[Double]("prior_alpha") - 2.5) < 1e-12))
    assert(got.forall(r => math.abs(r.getAs[Double]("prior_beta") - 2.5) < 1e-12))
    val shrunk = got.map(r => r.getAs[String]("key") -> r.getAs[Double]("shrunk")).toMap
    assert(math.abs(shrunk("a") - 0.5) < 1e-12)
    assert(math.abs(shrunk("b") - 5.5 / 9) < 1e-12)
    assert(math.abs(shrunk("c") - 3.5 / 9) < 1e-12)
    // shrinkage direction: b pulled below its raw .75, c above its raw .25
    assert(shrunk("b") < 0.75 && shrunk("c") > 0.25)
  }

  test("ebShrinkRates: degenerate priors are null, never silently unshrunk") {
    // zero rate spread → s²=0 → no prior
    val flat = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0)).toDF("k", "s")
    val r1 = Stats.ebShrinkRates(flat, col("k"), col("s")).head()
    assert(r1.isNullAt(r1.fieldIndex("prior_alpha")) && r1.isNullAt(r1.fieldIndex("shrunk")))
    // rates [0,1] → s² = μ(1−μ) → α+β = 0, not a valid beta prior
    val extreme = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("k", "s")
    val r2 = Stats.ebShrinkRates(extreme, col("k"), col("s")).head()
    assert(r2.isNullAt(r2.fieldIndex("shrunk")))
  }
}
