package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two
  * `array<double>` columns.
  *
  * Why a custom `Expression` and not `functions.aggregate`/`zip_with`:
  * higher-order functions are interpreted — every element pays a lambda
  * dispatch and boxing — and a fully unrolled `a[1]·b[1]+…` tower pays a
  * per-element `GetArrayItem` null/bounds check and deep tree dispatch
  * (measured ~2.7× WORSE than the fold's median — DOTBENCH.json, 1M×64;
  * see VectorOps.dot). This
  * expression participates in whole-stage codegen via [[doGenCode]]: the
  * generated code is one tight primitive loop over the two ArrayData
  * buffers — no boxing, no dispatch, fused into the surrounding operator.
  * This is the preferred extension path when built-in functions cannot
  * express the computation efficiently: native Expression > UDF.
  *
  * Semantics are EXACTLY those of the fold formulation, so the
  * [[graft.plans.RewriteDotProduct]] optimizer rule may substitute this
  * expression unconditionally: null if either array is null, if the
  * lengths differ (zip_with pads with nulls → null sum), or if any
  * element is null; otherwise elements are summed left to right
  * (bit-identical — DuckDB-oracle parity is preserved).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs MUST be array<double> (callers apply VectorOps.toDouble) —
  // enforced at analysis time: getDouble on float-backed array data
  // would be silent corruption, not an error. (The type-COERCION traits
  // are private[sql], so inputs are validated, not auto-cast.)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got ${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // may return null even for non-null children (length mismatch)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native hyperplane-LSH signature: ALL `tables × bits` sign bits of a
  * vector against a fixed plane matrix, in one fused pass. Emits
  * `array<long>` — element t is table t's bucket (bit p set iff
  * `Σ_d v[d]·plane(t,p,d) > 0`).
  *
  * Why this exists (see SURVEY §5b): the matmul formulation it replaced
  * (posexplode dims → broadcast-join plane coefficients → partial-sum
  * per (id, table, plane) → sign-pack) was codegen'd but paid a
  * (id, table, plane) SHUFFLE of ~tables×bits rows per vector — the
  * dominant cost of signature generation at 10^10 vectors. This
  * expression runs inside the corpus scan with zero shuffle and zero
  * row amplification: the plane matrix is a reference object in the
  * generated code, and the loop is the same tight primitive pattern as
  * [[DotProduct]].
  *
  * Null semantics match [[DotProduct]]: null vector, wrong length, or
  * any null element → null result. The plane matrix is NOT carried in
  * the plan — every coefficient is a pure seeded hash of
  * (table, plane, dim) ([[VectorExpressions.planeCoef]]), so the
  * expression holds only the three scalars and regenerates the matrix
  * lazily on driver and executors alike (a 16×42×768 configuration
  * would otherwise box ~516k doubles into every plan-equality probe).
  */
case class HyperplaneSigs(child: Expression, tables: Int, bits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(tables >= 1 && bits >= 1 && bits <= 62 && dims >= 1, "need tables>=1, 1<=bits<=62, dims>=1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"
  override def nullable: Boolean = true

  @transient private lazy val planeArr: Array[Double] = {
    val a = new Array[Double](tables * bits * dims)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < bits) {
        var d = 0
        while (d < dims) {
          a((t * bits + p) * dims + d) = VectorExpressions.planeCoef(t, p, d)
          d += 1
        }
        p += 1
      }
      t += 1
    }
    a
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < bits) {
        var dot = 0.0
        val base = (t * bits + p) * dims
        var d = 0
        while (d < dims) {
          if (x.isNullAt(d)) return null
          dot += x.getDouble(d) * planeArr(base + d)
          d += 1
        }
        if (dot > 0) out(t) |= 1L << p
        p += 1
      }
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planeArr, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |long[] $out = new long[$tables];
         |if ($v.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  outer: for (int $t = 0; $t < $tables; $t++) {
         |    for (int $p = 0; $p < $bits; $p++) {
         |      double $dot = 0.0;
         |      final int $base = ($t * $bits + $p) * $dims;
         |      for (int $d = 0; $d < $dims; $d++) {
         |        if ($v.isNullAt($d)) { ${ev.isNull} = true; break outer; }
         |        $dot += $v.getDouble($d) * $pl[$base + $d];
         |      }
         |      if ($dot > 0) $out[$t] |= 1L << $p;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Deterministic pseudo-random hyperplane coefficient for
    * (table, plane, dim): a fixed-seed hash mapped to [-1, 1). No RNG
    * state — driver, executors, and the reference formulation
    * ([[graft.similarity.Ann.hyperplaneSignature]]) all regenerate
    * identical planes from the indices alone. */
  def planeCoef(table: Int, plane: Int, dim: Int): Double = {
    var h = (table.toLong * 0x100000L + plane.toLong * 0x1000L + dim.toLong) * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
    (Math.floorMod(h, 2000001L) - 1000000L).toDouble / 1000000.0
  }

  /** Column API for [[DotProduct]]. Inputs must be `array<double>`
    * (apply `VectorOps.toDouble` to float embeddings first). */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[HyperplaneSigs]]. Input must be `array<double>`
    * of exactly `dims` elements. */
  def hyperplaneSigsNative(v: Column, tables: Int, bits: Int, dims: Int): Column =
    ColumnBridge.column(HyperplaneSigs(ColumnBridge.expression(v), tables, bits, dims))
}
