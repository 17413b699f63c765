package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native span-mask: drop every token covered by a `w`-token window
  * starting at any of `starts` (0-based, SORTED ascending — the
  * `sort_array(collect_set(…))` contract of the span-removal
  * operators), keeping the rest in order.
  *
  * Replaces the interpreted
  * `filter(tokens, (x, i) => !exists(starts, s => s <= i && i <= s+w-1))`
  * HOF pair in d31/d31b's mask stage: that form re-walks the start
  * array for EVERY token — O(tokens × starts) lambda dispatches with
  * no codegen — while the sorted contract admits a single merge sweep.
  * Here one pointer walks tokens, one walks starts, and a running
  * `cover` carries the furthest end seen: O(tokens + starts) per row,
  * one virtual call from whole-stage-codegen'd code.
  *
  * Semantics are exactly the HOF pair's: the predicate never inspects
  * the token value, so null ELEMENTS survive or drop purely by
  * position; either null INPUT yields null (call sites coalesce the
  * starts of untouched documents to an empty array, which fast-paths
  * to the input array unchanged).
  */
case class SpanMask(tokens: Expression, starts: Expression, w: Int)
    extends BinaryExpression {

  require(w >= 1, s"window width must be >= 1, got $w")

  override def left: Expression = tokens
  override def right: Expression = starts

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, starts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"(${t.simpleString}, ${s.simpleString})")
    }

  override def dataType: DataType = tokens.dataType
  override def prettyName: String = "graft_span_mask"

  /** The merge sweep; public so generated code makes one virtual call. */
  def maskArray(toks: ArrayData, sts: ArrayData): ArrayData = {
    val m = sts.numElements()
    if (m == 0) return toks
    val n = toks.numElements()
    val out = new Array[AnyRef](n)
    var cover = -1L
    var j = 0
    var k = 0
    var i = 0
    while (i < n) {
      while (j < m && sts.getInt(j) <= i) {
        val end = sts.getInt(j).toLong + (w - 1)
        if (end > cover) cover = end
        j += 1
      }
      if (i > cover) {
        out(k) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override def nullSafeEval(t: Any, s: Any): Any =
    maskArray(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      val ref = ctx.addReferenceObj("spanMask", this, classOf[SpanMask].getName)
      s"${ev.value} = $ref.maskArray($t, $s);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, starts = newRight)
}

object SpanExpressions {
  /** Column API for [[SpanMask]]. `starts` must be sorted ascending. */
  def spanMask(tokens: Column, starts: Column, w: Int): Column =
    ColumnBridge.column(SpanMask(
      ColumnBridge.expression(tokens), ColumnBridge.expression(starts), w))
}
