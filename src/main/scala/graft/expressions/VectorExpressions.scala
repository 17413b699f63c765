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

object VectorExpressions {
  /** Column API for [[DotProduct]]. Inputs must be `array<double>`
    * (apply `VectorOps.toDouble` to float embeddings first). */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
