package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mojibake repair: undo the single most common text-corruption
  * class in web corpora — a UTF-8 byte stream decoded once with the
  * wrong single-byte charset (Latin-1 / windows-1252), turning every
  * multi-byte character into 2-4 junk characters (`é` → `Ã©`,
  * `’` → `â€™`). Crawl pipelines meet this constantly (mislabeled
  * Content-Type headers, charset-less pages), and the damage is exactly
  * invertible when the WHOLE string is such a misdecode: re-encode each
  * character to its original byte, then strictly re-decode as UTF-8.
  *
  * Safety contract (why this can run blind over 100 TB):
  *  - a character with no windows-1252/Latin-1 byte (CJK, emoji, real
  *    `€` in otherwise-clean text …) → NOT a pure misdecode → input
  *    returned untouched;
  *  - re-encoded bytes that are not STRICTLY well-formed UTF-8 (genuine
  *    Latin-1 text like `Café` — `E9` needs continuation bytes) → input
  *    returned untouched;
  *  - pure-ASCII rows short-circuit before allocating anything (the
  *    corpus hot path);
  *  - the repaired string no longer re-encodes to multi-byte UTF-8, so
  *    the operator is idempotent by construction.
  *
  * The byte mapping is windows-1252 (a strict superset of Latin-1 for
  * this purpose): `0x00-0x7F` and `0xA0-0xFF` map identically, the
  * `0x80-0x9F` slots map from the cp1252 specials (`€ ‚ ƒ „ … † ‡ ˆ ‰ Š
  * ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ`) AND from raw C1 controls (what a
  * plain Latin-1 misdecode leaves), so both misdecode flavors repair.
  *
  * One narrow codegen'd map — no shuffle, no regex, no charset-machinery
  * allocation on the ASCII path. Detection heuristics (what to COUNT as
  * suspicious) live in [[graft.text.Mojibake]]; this expression is the
  * repair and is self-guarding, so it composes with or without a
  * detector gate.
  */
case class FixMojibake(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"
  override def nullable: Boolean = child.nullable

  /** char → original byte under a windows-1252/Latin-1 misdecode; -1 if
    * the char cannot come from one (not a misdecode → bail). */
  private def toByte(c: Char): Int = c match {
    case _ if c <= 0xFF => c.toInt // ASCII + Latin-1 + raw C1 controls
    case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
    case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
    case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
    case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
    case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
    case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
    case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
    case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
    case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
    case _ => -1
  }

  /** Strict UTF-8 well-formedness over `bytes`, requiring at least one
    * multi-byte sequence (all-ASCII re-decode would be a no-op). */
  private def validMultibyteUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    var sawMulti = false
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else {
        val len =
          if (b >= 0xC2 && b <= 0xDF) 2
          else if (b >= 0xE0 && b <= 0xEF) 3
          else if (b >= 0xF0 && b <= 0xF4) 4
          else return false // C0/C1 overlong leads and stray continuations
        if (i + len > n) return false
        var j = 1
        while (j < len) {
          val t = bytes(i + j) & 0xFF
          if (t < 0x80 || t > 0xBF) return false
          j += 1
        }
        // overlong / surrogate / out-of-range second-byte constraints
        val b1 = bytes(i + 1) & 0xFF
        if (b == 0xE0 && b1 < 0xA0) return false
        if (b == 0xED && b1 > 0x9F) return false
        if (b == 0xF0 && b1 < 0x90) return false
        if (b == 0xF4 && b1 > 0x8F) return false
        sawMulti = true
        i += len
      }
    }
    sawMulti
  }

  /** Public for the generated code path. */
  def evalText(s: UTF8String): UTF8String = {
    val t = s.toString
    val n = t.length
    var i = 0
    var allAscii = true
    while (i < n && allAscii) { if (t.charAt(i) >= 0x80) allAscii = false; i += 1 }
    if (allAscii) return s // corpus hot path: nothing to repair
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val b = toByte(t.charAt(i))
      if (b < 0) return s // not representable → not a pure misdecode
      bytes(i) = b.toByte
      i += 1
    }
    if (!validMultibyteUtf8(bytes)) return s // genuine Latin-1 text etc.
    UTF8String.fromBytes(bytes) // bytes ARE the UTF-8 of the repaired text
  }

  override def nullSafeEval(v: Any): Any = evalText(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("fixMojibake", this, classOf[FixMojibake].getName)
      s"${ev.value} = $ref.evalText($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MojibakeExpressions {
  /** Column API for [[FixMojibake]]. */
  def fixMojibake(text: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(text)))
}
