package graft.vectors

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the storage/
  * bandwidth half of a vector pipeline: a 768-dim float32 embedding is
  * 3 KB; symmetric int8 quantization stores 768 bytes + one scale,
  * a 4× cut in scan bytes and shuffle width for ANN candidate
  * generation, at a bounded per-dimension reconstruction error of
  * scale/2 (≈ max|v|/254).
  *
  * All operations are `transform`/`zip_with`/`aggregate` expressions
  * over a PRE-MATERIALIZED double array (stage
  * [[VectorOps.toDouble]] first — the HOF staging rule applies), so
  * quantization is a narrow map inside the scan at any corpus size.
  */
object Quantize {

  /** Symmetric per-vector scale: max|vᵢ| / 127. Zero for an all-zero
    * vector (quantized form is then all zeros). */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** Quantize to int8 range [-127, 127]: round(vᵢ/scale), clamped.
    * Rounds half AWAY FROM ZERO, matching DuckDB for bit-stable
    * cross-engine verification. (NumPy's np.round is half-to-even and
    * WILL disagree on exact .5 ties — quantize offline with
    * np.trunc(x + copysign(0.5, x)) if codes must match.) */
  def int8Quantize(v: Column, scale: Column): Column =
    when(scale > 0,
      transform(v, x => greatest(lit(-127L), least(lit(127L), round(x / scale))).cast("int")))
      .otherwise(transform(v, _ => lit(0)))

  /** Per-dimension worst-case reconstruction error of a quantized
    * vector: max |vᵢ − qᵢ·scale| (≤ scale/2 except at clamped dims,
    * which symmetric scaling makes impossible — asserted in the spec). */
  def int8MaxError(v: Column, q: Column, scale: Column): Column =
    array_max(zip_with(v, q, (x, qi) => abs(x - qi * scale)))

  /** Dot product in the quantized domain: scaleA·scaleB·Σ qaᵢ·qbᵢ.
    * The integer sum is exact (≤ 127²·dims ≪ 2⁶³), so the only error
    * vs the full-precision dot is the quantization itself — this is
    * the serving-time operation quantized storage exists for. */
  def int8Dot(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    sa * sb * aggregate(zip_with(qa, qb, (a, b) => (a * b).cast("long")), lit(0L), (acc, x) => acc + x)
      .cast("double")
}
