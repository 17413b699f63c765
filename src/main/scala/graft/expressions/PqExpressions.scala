package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the [[graft.vectors.Pq]] hot path —
  * the encode / ADC / reconstruction-error inner loops that round-13
  * profiling measured as the suite's single heaviest cost (d79c: three
  * 2.7 s Lloyd-round jobs plus a 3.7 s error pass, all interpreted
  * higher-order-function chains paying a lambda dispatch and boxing per
  * array element — guide §4.1/§1.2 "per-task work").
  *
  * Exactness contract (the same discipline as [[DotProduct]]): every
  * floating-point addition happens in EXACTLY the order of the HOF
  * formulation it replaces —
  *  - per-subspace distances fold `(a-b)²` over d = 0..subDim-1 from
  *    0.0 (the `aggregate(zip_with(...))` order);
  *  - argmin keeps the FIRST code attaining the minimum
  *    (`array_position(dists, array_min(dists))` tie rule);
  *  - whole-vector sums ([[PqAdcL2]], [[PqQuantErr]]) accumulate over
  *    the global dim order 0..dim-1 from 0.0 — NOT per-subspace
  *    partials — bit-identical to the flat
  *    `aggregate(zip_with(v, decode(codes), …))` fold they replace, so
  *    DuckDB-oracle parity is preserved to the last ulp.
  *
  * The codebook rides as a flattened `double[]` reference object in the
  * generated code (the [[HyperplaneSigs]] pattern), laid out
  * `books[(j·kCodes + c)·subDim + d]`. Null semantics follow
  * [[DotProduct]]: null input, wrong length, or a null element → null.
  */
object PqExpressions {

  /** Column API: `array<int>` of length m — each subvector's nearest
    * codebook entry (squared L2, ties to the lowest code). `vec` must
    * be `array<double>` of exactly m·subDim elements. */
  def pqEncode(vec: Column, m: Int, kCodes: Int, subDim: Int, books: Array[Double]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), m, kCodes, subDim, books))

  /** Column API: squared-L2 asymmetric distance from `query` (a full
    * `array<double>` vector column) to the reconstruction of `codes` —
    * bit-identical to `aggregate(zip_with(query, decode(codes), (a,b)
    * => (a-b)²), 0.0, _+_)`. */
  def pqAdcL2(query: Column, codes: Column, m: Int, kCodes: Int, subDim: Int,
              books: Array[Double]): Column =
    ColumnBridge.column(PqAdcL2(ColumnBridge.expression(query),
      ColumnBridge.expression(codes), m, kCodes, subDim, books))

  /** Column API: squared-L2 reconstruction error of `vec` under the
    * codebooks — bit-identical to
    * `aggregate(zip_with(v, decode(encode(v)), (a,b) => (a-b)²), 0.0, _+_)`
    * (encode and the error fused into one pass; the additions are the
    * same values in the same global dim order). */
  def pqQuantErr(vec: Column, m: Int, kCodes: Int, subDim: Int, books: Array[Double]): Column =
    ColumnBridge.column(PqQuantErr(ColumnBridge.expression(vec), m, kCodes, subDim, books))
}

case class PqEncode(child: Expression, m: Int, kCodes: Int, subDim: Int,
                    books: Array[Double]) extends UnaryExpression {
  require(m >= 1 && kCodes >= 1 && subDim >= 1 && books.length == m * kCodes * subDim,
    s"codebook layout mismatch: m=$m kCodes=$kCodes subDim=$subDim books=${books.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < kCodes) {
        var s = 0.0
        val base = (j * kCodes + c) * subDim
        var d = 0
        while (d < subDim) {
          if (x.isNullAt(j * subDim + d)) return null
          val diff = books(base + d) - x.getDouble(j * subDim + d)
          s += diff * diff
          d += 1
        }
        if (s < best) { best = s; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqBooks", books, "double[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      s"""
         |int[] $out = new int[$m];
         |if ($v.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  outer: for (int $j = 0; $j < $m; $j++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $kCodes; $c++) {
         |      double $s = 0.0;
         |      final int $base = ($j * $kCodes + $c) * $subDim;
         |      for (int $d = 0; $d < $subDim; $d++) {
         |        if ($v.isNullAt($j * $subDim + $d)) { ${ev.isNull} = true; break outer; }
         |        final double $diff = $cb[$base + $d] - $v.getDouble($j * $subDim + $d);
         |        $s += $diff * $diff;
         |      }
         |      if ($s < $best) { $best = $s; $bestC = $c; }
         |    }
         |    $out[$j] = $bestC;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqAdcL2(left: Expression, right: Expression, m: Int, kCodes: Int,
                   subDim: Int, books: Array[Double]) extends BinaryExpression {
  require(m >= 1 && kCodes >= 1 && subDim >= 1 && books.length == m * kCodes * subDim,
    s"codebook layout mismatch: m=$m kCodes=$kCodes subDim=$subDim books=${books.length}")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>) inputs, got ${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_l2"
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, cs: Any): Any = {
    val x = q.asInstanceOf[ArrayData]
    val codes = cs.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim || codes.numElements() != m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= kCodes) return null
      val base = (j * kCodes + c) * subDim
      var d = 0
      while (d < subDim) {
        if (x.isNullAt(j * subDim + d)) return null
        val diff = x.getDouble(j * subDim + d) - books(base + d)
        s += diff * diff
        d += 1
      }
      j += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cs) => {
      val cb = ctx.addReferenceObj("pqBooks", books, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      s"""
         |double $s = 0.0;
         |if ($q.numElements() != ${m * subDim} || $cs.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  outer: for (int $j = 0; $j < $m; $j++) {
         |    if ($cs.isNullAt($j)) { ${ev.isNull} = true; break outer; }
         |    final int $c = $cs.getInt($j);
         |    if ($c < 0 || $c >= $kCodes) { ${ev.isNull} = true; break outer; }
         |    final int $base = ($j * $kCodes + $c) * $subDim;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      if ($q.isNullAt($j * $subDim + $d)) { ${ev.isNull} = true; break outer; }
         |      final double $diff = $q.getDouble($j * $subDim + $d) - $cb[$base + $d];
         |      $s += $diff * $diff;
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class PqQuantErr(child: Expression, m: Int, kCodes: Int, subDim: Int,
                      books: Array[Double]) extends UnaryExpression {
  require(m >= 1 && kCodes >= 1 && subDim >= 1 && books.length == m * kCodes * subDim,
    s"codebook layout mismatch: m=$m kCodes=$kCodes subDim=$subDim books=${books.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_quant_err"
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      // argmin pass — the same per-subspace fold as PqEncode
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < kCodes) {
        var s = 0.0
        val base = (j * kCodes + c) * subDim
        var d = 0
        while (d < subDim) {
          if (x.isNullAt(j * subDim + d)) return null
          val diff = books(base + d) - x.getDouble(j * subDim + d)
          s += diff * diff
          d += 1
        }
        if (s < best) { best = s; bestC = c }
        c += 1
      }
      // error pass — re-accumulated into the GLOBAL sum in dim order so
      // the grouping matches the flat zip_with fold bit-for-bit
      val base = (j * kCodes + bestC) * subDim
      var d = 0
      while (d < subDim) {
        val diff = x.getDouble(j * subDim + d) - books(base + d)
        total += diff * diff
        d += 1
      }
      j += 1
    }
    total
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqBooks", books, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      val total = ctx.freshName("total")
      s"""
         |double $total = 0.0;
         |if ($v.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  outer: for (int $j = 0; $j < $m; $j++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $kCodes; $c++) {
         |      double $s = 0.0;
         |      final int $base = ($j * $kCodes + $c) * $subDim;
         |      for (int $d = 0; $d < $subDim; $d++) {
         |        if ($v.isNullAt($j * $subDim + $d)) { ${ev.isNull} = true; break outer; }
         |        final double $diff = $cb[$base + $d] - $v.getDouble($j * $subDim + $d);
         |        $s += $diff * $diff;
         |      }
         |      if ($s < $best) { $best = $s; $bestC = $c; }
         |    }
         |    final int $base = ($j * $kCodes + $bestC) * $subDim;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      final double $diff = $v.getDouble($j * $subDim + $d) - $cb[$base + $d];
         |      $total += $diff * $diff;
         |    }
         |  }
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
