package graft.vectors

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column math over embedding columns (`array<float>` / `array<double>`).
  *
  * All operations are `functions.transform` / `zip_with` / `aggregate`
  * expressions — per-row, shuffle-free, and identical in plan shape at
  * any scale. Math is done in double precision (floats are upcast per
  * element) so results are bit-stable across engines.
  */
object VectorOps {

  /** Elementwise upcast to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ — sequential left-to-right sum, matching the order a
    * columnar engine evaluates a dot product (bit-reproducible).
    *
    * Measured (DOTBENCH.json — `graft.DotBench`, 1M pairs × 64 dims,
    * local[32]): this interpreted fold runs ~1.0s median vs ~2.7s for a
    * fully unrolled `a[1]·b[1] + … + a[64]·b[64]` expression — per-
    * element `element_at`/`GetArrayItem` towers pay bounds/null checks
    * and deep expression-tree dispatch per access, while the fold walks
    * the two arrays once. The fold's run-to-run variance is high
    * (0.85–5.5s; interpreted eval allocates per element), which is
    * itself a reason hot paths use the native expression instead. Do
    * not "optimize" this into element accessors without re-running
    * DotBench. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Σ vᵢ² — a self-dot, so it reuses the native codegen'd
    * [[graft.expressions.DotProduct]] (identical null semantics: a null
    * element nulls the HOF fold's sum too). */
  def sumSquares(v: Column): Column =
    graft.expressions.VectorExpressions.dotNative(v, v)

  /** ‖v‖₂ */
  def l2Norm(v: Column): Column = sqrt(sumSquares(v))

  /** cos(a,b) = a·b / (‖a‖‖b‖). Pass precomputed norms when calling in a
    * join hot path so each side's norm is computed once per row, not once
    * per pair.
    *
    * The dot product here is the native codegen'd
    * [[graft.expressions.DotProduct]] (one primitive loop fused into the
    * surrounding stage — measured faster than the interpreted fold and
    * far more stable: DOTBENCH.json medians 0.72s vs 1.02s on 1M×64,
    * best runs 0.16s vs 0.85s, and no multi-second GC spikes;
    * bit-identical result). Both
    * inputs must therefore be `array<double>` ([[toDouble]] first). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotNative(a, b) / (l2Norm(a) * l2Norm(b))

  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    graft.expressions.VectorExpressions.dotNative(a, b) / (normA * normB)

  /** Deterministic projection coefficient for [[randomProject]] —
    * the shared [[graft.expressions.VectorExpressions.planeCoef]]
    * splitmix derivation, keyed by (output dim, seed, input dim), so
    * any engine regenerates the identical matrix from indices alone. */
  def projCoef(seed: Int, outIdx: Int, dimIdx: Int): Double =
    graft.expressions.VectorExpressions.planeCoef(outIdx, seed, dimIdx)

  /** Johnson–Lindenstrauss random projection: map a `dims`-dimensional
    * vector to `outDim` components, each the native codegen'd dot
    * product with a deterministic pseudo-random plane (uniform in
    * [−1, 1] — variance 1/3 — scaled by √(3/outDim) so expected
    * pairwise distances are preserved). The standard cheap dimensionality cut before ANN /
    * clustering: storage and shuffle width drop dims/outDim× (compose
    * with [[Quantize]] for another 4×), JL distortion is
    * O(√(log n / outDim)) independent of the input dimension. Pure
    * narrow map — `outDim` fused dot products inside the scan. Input
    * must be `array<double>` ([[toDouble]] first). */
  def randomProject(v: Column, dims: Int, outDim: Int, seed: Int = 0): Column = {
    require(dims >= 1 && outDim >= 1, s"bad dims: $dims → $outDim")
    val scale = math.sqrt(3.0 / outDim.toDouble)
    array((0 until outDim).map { j =>
      val plane = array((0 until dims).map(d => lit(projCoef(seed, j, d) * scale)): _*)
      graft.expressions.VectorExpressions.dotNative(v, plane)
    }: _*)
  }
}
