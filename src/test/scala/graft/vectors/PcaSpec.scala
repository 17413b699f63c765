package graft.vectors

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 4-D cloud with two dominant orthogonal directions:
  // x = a·u + b·w, var(a) >> var(b), so PC1 ≈ ±u, PC2 ≈ ±w
  private val u = Array(0.5, 0.5, 0.5, 0.5)
  private val w = Array(0.5, -0.5, 0.5, -0.5)
  private val cloud = (0 until 400).map { i =>
    val a = 3.0 * math.sin(i * 0.731)
    val b = 0.7 * math.cos(i * 1.292)
    (i.toLong, (0 until 4).map(d => (1.0 + a * u(d) + b * w(d)).toFloat).toArray)
  }
  private lazy val df = cloud.toDF("id", "vec")

  private def dotA(x: Array[Double], y: Array[Double]): Double =
    x.zip(y).map { case (p, q) => p * q }.sum

  test("jacobiEigen solves a hand-checkable symmetric 2x2 exactly") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(vecs(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("fit recovers the planted dominant directions with orthonormal components") {
    val m = Pca.fit(df, "vec", dim = 4, k = 4)
    assert(m.n == 400L)
    // PC1/PC2 align with u/w up to sign (cosine ≈ ±1)
    assert(math.abs(dotA(m.components(0), u)) > 0.999)
    assert(math.abs(dotA(m.components(1), w)) > 0.999)
    // rows orthonormal
    for (i <- 0 until 4; j <- 0 until 4) {
      val d = dotA(m.components(i), m.components(j))
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"comp($i)·comp($j) = $d")
    }
    // eigenvalues descending, non-negative for a covariance
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.eigenvalues.forall(_ > -1e-9))
  }

  test("spectrum satisfies the trace and Frobenius invariants of the covariance") {
    val (_, _, cov) = Pca.moments(df, "vec", 4)
    val m = Pca.fit(df, "vec", dim = 4, k = 4)
    val trace = (0 until 4).map(i => cov(i)(i)).sum
    val frob2 = cov.flatten.map(x => x * x).sum
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-9 * math.max(1.0, trace))
    assert(math.abs(m.eigenvalues.map(l => l * l).sum - frob2) < 1e-9 * math.max(1.0, frob2))
  }

  test("projected axes have variance = eigenvalue; whitening gives unit variance") {
    val m = Pca.fit(df, "vec", dim = 4, k = 2)
    val proj = df.select(m.projection(col("vec")).as("p"))
      .select((0 until 2).map(j => col("p")(j).as(s"p$j")): _*)
    val vars = proj.select(
      var_pop("p0").as("v0"), var_pop("p1").as("v1"),
      covar_pop("p0", "p1").as("c01")).head()
    assert(math.abs(vars.getDouble(0) - m.eigenvalues(0)) < 1e-6 * m.eigenvalues(0))
    assert(math.abs(vars.getDouble(1) - m.eigenvalues(1)) < 1e-6 * m.eigenvalues(0))
    // decorrelated axes
    assert(math.abs(vars.getDouble(2)) < 1e-6 * m.eigenvalues(0))

    val white = df.select(m.projection(col("vec"), whiten = true).as("p"))
      .select(var_pop(col("p")(0)).as("v0"), var_pop(col("p")(1)).as("v1")).head()
    assert(math.abs(white.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(white.getDouble(1) - 1.0) < 1e-6)
  }

  test("fits are deterministic and sign-pinned") {
    val m1 = Pca.fit(df, "vec", dim = 4, k = 4)
    val m2 = Pca.fit(df, "vec", dim = 4, k = 4)
    assert(m1.components.flatten.toSeq == m2.components.flatten.toSeq)
    assert(m1.components.forall { row =>
      row(row.indices.maxBy(j => (math.abs(row(j)), -j))) >= 0.0
    })
    // explained variance is monotone to 1.0
    val ev = m1.explainedVariance
    assert(ev.sliding(2).forall(p => p(0) <= p(1) + 1e-12) && math.abs(ev.last - 1.0) < 1e-9)
  }
}
