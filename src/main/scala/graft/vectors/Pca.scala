package graft.vectors

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening for embedding columns — the spectral
  * preprocessing step in front of semantic dedup and ANN (SemDeDup-style
  * pipelines whiten before clustering; IVF recall improves on
  * decorrelated axes; low-rank projection is the principled version of
  * D36's data-oblivious JL projection).
  *
  * The 100 TB decomposition is the classic two-scale split:
  *
  *  1. DISTRIBUTED one-pass moment sweep — a typed [[Aggregator]]
  *     accumulates (n, Σv, upper-triangular Σv·vᵀ) per partition and
  *     merges buffers: d + d(d+1)/2 doubles of state, map-side partial
  *     aggregation, ONE job, no explode (a dim×dim explode would
  *     shuffle n·d² rows; this shuffles ~#partitions buffers).
  *  2. DRIVER d×d eigensolve — covariance is d², independent of corpus
  *     size (64-dim → 32 KB); cyclic Jacobi diagonalizes it exactly
  *     (symmetric, so Jacobi is unconditionally stable and
  *     deterministic — no RNG, no iteration-order ambiguity).
  *  3. The k×d component matrix returns to the cluster as LITERALS in a
  *     narrow `transform` projection — scoring is a map inside the
  *     scan, exactly the [[VectorOps.randomProject]] shape.
  *
  * Covariance is POPULATION (1/n) normalized — matches `covar_pop` for
  * cross-engine verification and makes "eigenvalue = variance of the
  * projected data" exact rather than off by n/(n−1).
  *
  * Eigenvector sign is pinned (largest-|entry| coordinate positive) so
  * fits are bit-reproducible run to run.
  */
object Pca {

  /** (n, Σvᵢ, packed upper-triangular Σ vᵢvⱼ). Arrays are mutated in
    * place inside reduce/merge — safe under Aggregator's buffer
    * ownership contract. */
  final case class MomentBuf(var n: Long, sum: Array[Double], gram: Array[Double])

  private final class MomentAgg(d: Int) extends Aggregator[Seq[Double], MomentBuf, MomentBuf] {
    override def zero: MomentBuf = MomentBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    override def reduce(b: MomentBuf, v: Seq[Double]): MomentBuf = {
      require(v != null && v.length == d, s"expected $d-dim vector, got ${if (v == null) "null" else v.length.toString}")
      val a = v.toArray
      var i = 0; var t = 0
      while (i < d) {
        b.sum(i) += a(i)
        var j = i
        while (j < d) { b.gram(t) += a(i) * a(j); t += 1; j += 1 }
        i += 1
      }
      b.n += 1L
      b
    }
    override def merge(x: MomentBuf, y: MomentBuf): MomentBuf = {
      var i = 0
      while (i < x.sum.length)  { x.sum(i) += y.sum(i);   i += 1 }
      i = 0
      while (i < x.gram.length) { x.gram(i) += y.gram(i); i += 1 }
      x.n += y.n
      x
    }
    override def finish(b: MomentBuf): MomentBuf = b
    override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
    override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  }

  /** The raw moment buffer as a ONE-ROW DataFrame `(n, sum, gram)` —
    * the MERGEABLE form: buffers from disjoint slices (or micro-batches)
    * combine by elementwise addition, so fleet-scale / streaming PCA
    * appends these rows and never rescans raw vectors (the D40
    * sketch-card discipline applied to second moments). */
  def momentTable(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(VectorOps.toDouble(col(vecCol)))
      .as[Seq[Double]]
      .select(new MomentAgg(dim).toColumn)
      .toDF() // Dataset[MomentBuf] → columns (n, sum, gram)
  }

  /** Merge stored moment rows (one per slice/batch — state-scale, not
    * corpus-scale) and unpack to (n, mean[d], population cov[d][d]). */
  def momentsFromRows(rows: Seq[(Long, Seq[Double], Seq[Double])], dim: Int):
      (Long, Array[Double], Array[Array[Double]]) = {
    require(rows.nonEmpty, "no moment rows")
    val acc = MomentBuf(0L, new Array[Double](dim), new Array[Double](dim * (dim + 1) / 2))
    rows.foreach { case (n, s, g) =>
      require(s.length == acc.sum.length && g.length == acc.gram.length,
        s"moment row dimensionality mismatch (expected dim=$dim)")
      acc.n += n
      var i = 0
      while (i < acc.sum.length)  { acc.sum(i) += s(i);   i += 1 }
      i = 0
      while (i < acc.gram.length) { acc.gram(i) += g(i); i += 1 }
    }
    unpack(acc, dim)
  }

  private def unpack(buf: MomentBuf, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    require(buf.n > 0, "PCA needs at least one vector")
    val n = buf.n.toDouble
    val mean = buf.sum.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = buf.gram(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    (buf.n, mean, cov)
  }

  /** One distributed pass → (n, mean[d], population covariance[d][d]).
    * Driver state is O(d²), never O(n). */
  def moments(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val buf = df.select(VectorOps.toDouble(col(vecCol)))
      .as[Seq[Double]]
      .select(new MomentAgg(dim).toColumn)
      .head()
    unpack(buf, dim)
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix: repeated sweeps of
    * (p,q) rotations until every off-diagonal is below `tol` relative to
    * the Frobenius norm. Returns (eigenvalues, eigenvectors-as-rows),
    * sorted by descending eigenvalue, each vector sign-pinned. Exact
    * convergence is certified downstream by the Σλ² = ‖C‖²_F invariant
    * (only a fully-diagonalized matrix satisfies it). */
  def jacobiEigen(sym: Array[Array[Double]], tol: Double = 1e-12, maxSweeps: Int = 64):
      (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val fro = math.sqrt(sym.map(_.map(x => x * x).sum).sum).max(Double.MinPositiveValue)
    var sweep = 0
    var off = Double.MaxValue
    while (off > tol * fro && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol * fro / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // smaller root of t² + 2θt − 1 = 0 (the stable rotation); θ=0 → 45°
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = math.sqrt({
        var sos = 0.0
        var i = 0
        while (i < d) { var j = i + 1; while (j < d) { sos += 2 * a(i)(j) * a(i)(j); j += 1 }; i += 1 }
        sos
      })
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eigVals = order.map(i => a(i)(i)).toArray
    val eigVecs = order.map { i =>
      val row = v(i).clone()
      val m = row.indices.maxBy(j => (math.abs(row(j)), -j)) // ties → lowest index
      if (row(m) < 0) row.indices.foreach(j => row(j) = -row(j))
      row
    }.toArray
    (eigVals, eigVecs)
  }

  /** Fitted model: `components` is k×d (rows orthonormal), eigenvalues
    * descending, population-covariance convention. */
  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {

    def k: Int = components.length

    /** Projection column: (v − mean)·compⱼ for j < k, as array<double>.
      * Mean and components ride as literals — narrow map, zero shuffle,
      * composable into the scan. `whiten = true` scales axis j by
      * 1/√λⱼ (axes with λ ≤ 0 — numerically empty — map to 0 rather
      * than ±∞). */
    def projection(vec: Column, whiten: Boolean = false): Column = {
      val centered = zip_with(VectorOps.toDouble(vec), typedLit(mean.toSeq), (a, b) => a - b)
      val comps = typedLit(components.map(_.toSeq).toSeq)
      val proj = transform(comps, c => VectorOps.dot(c, centered))
      if (!whiten) proj
      else {
        val scales = typedLit(eigenvalues.map(l => if (l > 0) 1.0 / math.sqrt(l) else 0.0).toSeq)
        zip_with(proj, scales, (p, s) => p * s)
      }
    }

    /** Cumulative explained-variance ratio after the first k' axes. */
    def explainedVariance: Array[Double] = {
      val total = eigenvalues.sum
      eigenvalues.scanLeft(0.0)(_ + _).drop(1).map(_ / total)
    }
  }

  /** Fit a k-component PCA: one distributed moment pass + the driver
    * eigensolve. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    val (n, mean, cov) = moments(df, vecCol, dim)
    fitFromMoments(n, mean, cov, k)
  }

  /** The driver half alone — fit from already-merged moments (the
    * streaming/fleet path: [[momentsFromRows]] over stored state). */
  def fitFromMoments(
      n: Long, mean: Array[Double], cov: Array[Array[Double]], k: Int): PcaModel = {
    require(k >= 1 && k <= cov.length, s"k must be in [1, ${cov.length}], got $k")
    val (eigVals, eigVecs) = jacobiEigen(cov)
    PcaModel(n, mean, eigVals.take(k), eigVecs.take(k))
  }
}
