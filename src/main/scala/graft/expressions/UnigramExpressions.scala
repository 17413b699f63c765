package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram piece model — the
  * inference half of SentencePiece-style unigram tokenization (Kudo
  * 2018): among all ways to split the word into vocabulary pieces,
  * return the one maximizing Σ log p(piece).
  *
  * Dynamic programming over character positions (O(len × maxPieceLen)
  * per word, each step one hash lookup) is genuinely imperative — the
  * HOF `aggregate` cannot express the backtracking — so it lives in a
  * native expression: codegen'd, zero shuffle, and in graft's pipelines
  * it runs over the DISTINCT-WORD table (vocabulary-sized), never the
  * corpus (the D34 BPE encode discipline).
  *
  * Coverage contract: a character absent from the vocabulary segments
  * as its own single-char piece at `unkLogp` (a floor well below any
  * real piece), so segmentation NEVER fails and
  * `concat(pieces) == word` always. Ties prefer the LONGER final piece
  * (deterministic across JVMs — no float-order dependence beyond the
  * model itself).
  *
  * The vocabulary ships inside the expression (task-serialized with the
  * plan): bounded by the tokenizer's vocab size (≤ ~10^5 entries, a few
  * MB) — the same carrier class as D44's λ table, with the documented
  * broadcast escape hatch if a vocabulary ever outgrows it.
  */
case class ViterbiSegment(
    child: Expression,
    vocab: Map[String, Double],
    maxPieceLen: Int,
    unkLogp: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_viterbi_segment"
  override def nullable: Boolean = child.nullable

  /** Public for the generated code path. */
  def evalText(s: UTF8String): GenericArrayData = {
    val w = s.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val neg = Double.NegativeInfinity
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // length of the best piece ENDING at i
    var i = 1
    while (i <= n) { score(i) = neg; i += 1 }
    i = 1
    while (i <= n) {
      // longest candidate first: on equal scores the longer piece wins
      var len = math.min(maxPieceLen, i)
      while (len >= 1) {
        val prev = score(i - len)
        if (prev != neg) {
          val piece = w.substring(i - len, i)
          val lp = vocab.get(piece) match {
            case Some(p) => p
            case None => if (len == 1) unkLogp else neg
          }
          if (lp != neg && prev + lp > score(i)) {
            score(i) = prev + lp
            back(i) = len
          }
        }
        len -= 1
      }
      i += 1
    }
    // backtrack (score(n) is always finite: single-char fallback)
    var count = 0
    i = n
    while (i > 0) { count += 1; i -= back(i) }
    val out = new Array[Any](count)
    i = n
    var k = count - 1
    while (i > 0) {
      out(k) = UTF8String.fromString(w.substring(i - back(i), i))
      k -= 1
      i -= back(i)
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = evalText(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("viterbiSegment", this, classOf[ViterbiSegment].getName)
      s"${ev.value} = $ref.evalText($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramExpressions {
  /** Column API for [[ViterbiSegment]]. */
  def viterbiSegment(
      word: Column,
      vocab: Map[String, Double],
      maxPieceLen: Int,
      unkLogp: Double): Column =
    ColumnBridge.column(
      ViterbiSegment(ColumnBridge.expression(word), vocab, maxPieceLen, unkLogp))
}
