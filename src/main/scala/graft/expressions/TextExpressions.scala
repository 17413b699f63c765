package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-set membership counter: given an `array<string>` token
  * column and up to 62 word sets, emits `array<long>` where element i
  * counts the tokens contained in set i — ALL sets in ONE pass.
  *
  * Replaces per-set `size(filter(tokens, _.isin(words)))` towers: each
  * of those is an interpreted higher-order pass over the token array
  * with a per-element linear `isin` chain, repeated once per set (the
  * d8 language-id hot path paid 4 such passes per row). Here every
  * token costs one hash lookup into a (token → set-bitmask) map, the
  * loop participates in whole-stage codegen, and adding sets adds bits
  * to a mask, not passes over the data.
  *
  * Semantics match the `filter(isin)` formulation: null tokens count
  * for no set (isin(null) is not true); a null token ARRAY yields null.
  */
case class StopwordHitCounts(child: Expression, sets: Seq[Seq[String]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(sets.nonEmpty && sets.length <= 62, "need 1..62 word sets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_set_hits"
  override def nullable: Boolean = child.nullable

  // real stopword lists run to thousands of words per set — keep them out
  // of plan strings (same rationale as HyperplaneSigs' coefficient
  // matrix); equality/canonicalization still compare the full sets
  override def stringArgs: Iterator[Any] = Iterator(child, sets.length)

  @transient private lazy val maskOf: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    sets.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) | (1L << i)))
      }
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Long](sets.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = maskOf.get(arr.getUTF8String(i))
        if (m != null) {
          var mask = m.longValue()
          while (mask != 0L) {
            counts(java.lang.Long.numberOfTrailingZeros(mask)) += 1
            mask &= mask - 1
          }
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val map = ctx.addReferenceObj("maskOf", maskOf, "java.util.HashMap")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val mask = ctx.freshName("mask")
      s"""
         |long[] $counts = new long[${sets.length}];
         |final int $n = $v.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    Object $m = $map.get($v.getUTF8String($i));
         |    if ($m != null) {
         |      long $mask = ((java.lang.Long) $m).longValue();
         |      while ($mask != 0L) {
         |        $counts[java.lang.Long.numberOfTrailingZeros($mask)]++;
         |        $mask &= $mask - 1L;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API for [[StopwordHitCounts]]: element i of the result
    * counts tokens contained in `sets(i)`. Input must be
    * `array<string>` (stage [[graft.text.TextFunctions.tokens]] first). */
  def setHitCounts(tokens: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopwordHitCounts(ColumnBridge.expression(tokens), sets))
}
