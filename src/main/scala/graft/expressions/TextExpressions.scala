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

/** Gram key: a window of interned token ids. Equality/hashing over the
  * id array — exact gram equality without building gram strings
  * (tokens contain no spaces, so the id sequence IS the joined gram). */
private final class GramKey(val ids: Array[Int]) {
  override def hashCode: Int = java.util.Arrays.hashCode(ids)
  override def equals(o: Any): Boolean = o match {
    case k: GramKey => java.util.Arrays.equals(ids, k.ids)
    case _ => false
  }
}

/** Native n-gram repetition statistics: for each window width n in
  * `ns`, the characters covered by the single most frequent word
  * n-gram (count ties broken to the larger coverage) and by ALL
  * occurrences of every n-gram appearing ≥ 2 times — the two Gopher
  * Table A1 repetition numerators — as `array<long>` laid out
  * `[top_{n1}, dup_{n1}, top_{n2}, dup_{n2}, …]`.
  *
  * Replaces, per width, an interpreted `array_sort` of the shingle
  * array plus run-start/ run-fold higher-order chains (no codegen, no
  * common-subexpression elimination) with ONE JVM pass: tokens are
  * interned to ids, each window hashes an id slice into a count map,
  * and gram character lengths come from a prefix-sum
  * (Σ `numChars` + n − 1 ≡ the joined gram's `length()`, in code
  * points, since tokens contain no spaces). O(m·Σn) with no string
  * materialization; the d42 bench cost dropped ~4× when this replaced
  * the sort path.
  *
  * Precondition: token arrays contain no null elements (the staged
  * `tokens` + non-empty filter guarantee it); a null element is
  * treated as an empty token. A null ARRAY yields null.
  */
case class NgramRepStats(child: Expression, ns: Seq[Int])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(ns.nonEmpty && ns.forall(_ >= 1), s"window widths must be >= 1, got $ns")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_rep_stats"
  override def nullable: Boolean = child.nullable

  /** Public for the generated code path: one virtual call per row keeps
    * the surrounding projection inside whole-stage codegen. */
  def evalArray(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val ids = new Array[Int](m)
    val prefix = new Array[Int](m + 1)
    val intern = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < m) {
      val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      var id = intern.get(t)
      if (id == null) { id = Integer.valueOf(intern.size()); intern.put(t, id) }
      ids(i) = id.intValue()
      prefix(i + 1) = prefix(i) + t.numChars()
      i += 1
    }
    val out = new Array[Long](2 * ns.length)
    var j = 0
    while (j < ns.length) {
      val n = ns(j)
      if (m >= n) {
        val counts = new java.util.HashMap[GramKey, Array[Long]]()
        var s = 0
        while (s <= m - n) {
          val key = new GramKey(java.util.Arrays.copyOfRange(ids, s, s + n))
          val e = counts.get(key)
          if (e == null) counts.put(key, Array(1L, (prefix(s + n) - prefix(s) + (n - 1)).toLong))
          else e(0) += 1L
          s += 1
        }
        var bestCnt = 0L
        var bestChars = 0L
        var dup = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val e = it.next()
          val chars = e(0) * e(1)
          if (e(0) > bestCnt || (e(0) == bestCnt && chars > bestChars)) {
            bestCnt = e(0); bestChars = chars
          }
          if (e(0) >= 2L) dup += chars
        }
        out(2 * j) = bestChars
        out(2 * j + 1) = dup
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = evalArray(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("ngramRepStats", this, classOf[NgramRepStats].getName)
      s"${ev.value} = $ref.evalArray($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Flesch word/syllable counter: over a token array, emits
  * `array<long>` `[n_words, n_syllables]` in one character pass —
  * a word is a token containing an ASCII alphanumeric, its syllables
  * are `[aeiouy]+` group count floored at 1 (exactly the
  * `filter(rlike) + aggregate(regexp_extract_all)` HOF chain this
  * replaces: that form paid an interpreted lambda dispatch plus a
  * regex-match ARRAY allocation per token). Tokens arrive lowercased
  * (the staged `tokens` contract), so the ASCII class test IS the
  * `[a-z0-9]` regex. Null elements count as empty tokens; a null
  * ARRAY yields null. */
case class FleschCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_flesch_counts"

  def evalArray(arr: ArrayData): ArrayData = {
    var words = 0L
    var syllables = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var isWord = false
        var groups = 0
        var inGroup = false
        var j = 0
        val len = s.length
        while (j < len) {
          val c = s.charAt(j)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) isWord = true
          val vowel = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
          if (vowel && !inGroup) groups += 1
          inGroup = vowel
          j += 1
        }
        if (isWord) {
          words += 1
          syllables += math.max(1, groups)
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(words, syllables))
  }

  override def nullSafeEval(v: Any): Any = evalArray(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("fleschCounts", this, classOf[FleschCounts].getName)
      s"${ev.value} = $ref.evalArray($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native C4 line cleaning: split on `\n`, space-trim each line, drop
  * blanks, keep lines that end in terminal punctuation (`.` `!` `?`,
  * optionally followed by a closing quote `"` `”` `'`), have ≥
  * `minLineWords` whitespace words, and do not contain "javascript"
  * (case-insensitive); emits `struct(n_lines, n_kept, clean_text)` —
  * kept lines rejoined with `\n` — in ONE character pass.
  *
  * Replaces the three staged higher-order projections (split →
  * transform(trim) → filter(blank) → filter(keep rule) → array_join)
  * of the reference formulation in [[graft.text.C4Filter]]: each HOF
  * is an interpreted lambda dispatch per line with a regex compile-
  * cached rlike per element, and no common-subexpression elimination
  * between the stages. Semantics are bit-equal to the reference chain
  * (C4FilterSpec property-checks them against each other), including
  * the Java-regex `$` nuance: `rlike("[.!?]$")` matches BEFORE a final
  * line terminator, so a space-trimmed line ending `.\r` keeps — the
  * scan skips ONE trailing terminator (`\r`, U+0085, U+2028, U+2029)
  * before the punctuation test, exactly like `$`.
  *
  * A null text yields null (the reference chain's `coalesce` lands ""
  * — callers go through [[graft.text.C4Filter.addCleanLines]], which
  * keeps that coalesce).
  */
case class C4LineClean(child: Expression, minLineWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(minLineWords >= 1, s"minLineWords must be >= 1, got $minLineWords")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_lines", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_kept", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "graft_c4_line_clean"
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean = // Java regex \s (ASCII)
    c == ' ' || c == '\t' || c == '\u000B' || c == '\f' || c == '\r'
  private def isTerm(c: Char): Boolean = c == '.' || c == '!' || c == '?'
  private def isQuote(c: Char): Boolean = c == '"' || c == '”' || c == '\''
  private def isLineTerm(c: Char): Boolean =
    c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  private def keepLine(t: String, a: Int, b: Int): Boolean = {
    // effective end: Java-regex `$` matches before ONE final terminator
    var e = b
    if (e > a && isLineTerm(t.charAt(e - 1))) e -= 1
    if (e == a) return false
    val last = t.charAt(e - 1)
    val okEnd = isTerm(last) ||
      (isQuote(last) && e - a >= 2 && isTerm(t.charAt(e - 2)))
    if (!okEnd) return false
    var words = 0
    var inWord = false
    var i = a
    while (i < b) {
      if (!isWs(t.charAt(i))) { if (!inWord) { words += 1; inWord = true } }
      else inWord = false
      i += 1
    }
    if (words < minLineWords) return false
    !t.substring(a, b).toLowerCase(java.util.Locale.ROOT).contains("javascript")
  }

  /** Public for the generated code path. */
  def evalText(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = s.toString
    val n = text.length
    var nLines = 0L
    var nKept = 0L
    val sb = new java.lang.StringBuilder
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        var a = start
        var b = i
        while (a < b && text.charAt(a) == ' ') a += 1
        while (b > a && text.charAt(b - 1) == ' ') b -= 1
        if (b > a) {
          nLines += 1
          if (keepLine(text, a, b)) {
            nKept += 1
            if (sb.length > 0) sb.append('\n')
            sb.append(text, a, b)
          }
        }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLines, nKept, UTF8String.fromString(sb.toString)))
  }

  override def nullSafeEval(v: Any): Any = evalText(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("c4LineClean", this, classOf[C4LineClean].getName)
      s"${ev.value} = $ref.evalText($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass text normalization — the canonical "make crawl text
  * uniform before hashing/dedup/tokenization" cleanup (reference's
  * placeholder/whitespace hygiene generalized: clean_transform.py's
  * text normalization column rules, re-scoped to unicode):
  *
  *  1. Line terminators: `\r\n` → `\n`; lone `\r`, U+0085, U+2028,
  *     U+2029 → `\n`.
  *  2. Unicode space family (NBSP U+00A0, U+1680, U+2000–200A, U+202F,
  *     U+205F, U+3000) → ASCII space.
  *  3. Zero-widths (U+200B–200D, U+FEFF) and control chars other than
  *     tab/newline (U+0000–0008, 000B, 000C, 000E–001F, 007F) removed.
  *  4. Curly quotes → `'` / `"`; dash family (U+2010–2015, U+2212) →
  *     `-`; ellipsis U+2026 → `...`.
  *  5. Whitespace structure: runs of spaces/tabs collapse to one
  *     space, spaces adjacent to newlines drop, 3+ newlines collapse
  *     to exactly 2 (paragraph break), and the ends are trimmed.
  *
  * All five phases run in ONE character scan (a pending-space/
  * pending-newline state machine — no intermediate strings, no regex),
  * and the expression participates in whole-stage codegen. Equivalent
  * regex chain (what the oracle replays): the char maps, then
  * `[ \t]+`→` `, ` *\n *`→`\n`, `\n{3,}`→`\n\n`, `trim(' '|'\n')`.
  *
  * Why normalize-first matters at 100 TB: exact dedup (D1), MinHash
  * shingles (D2), and token counts (D9) all hash the raw bytes — two
  * visually identical documents with NBSP vs space land in different
  * clusters unless this pass runs first, so it sits at the head of the
  * D45 pretraining pipeline's transform chain.
  */
case class TextNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_text_normalize"
  override def nullable: Boolean = child.nullable

  private def isRemoved(c: Char): Boolean =
    (c < ' ' && c != '\t' && c != '\n' && c != '\r') || c == '\u007F' ||
      c == '\u200B' || c == '\u200C' || c == '\u200D' || c == '\uFEFF'
  private def isUniSpace(c: Char): Boolean =
    c == '\u00A0' || c == '\u1680' || (c >= '\u2000' && c <= '\u200A') ||
      c == '\u202F' || c == '\u205F' || c == '\u3000'
  private def isNewlineLike(c: Char): Boolean =
    c == '\u0085' || c == '\u2028' || c == '\u2029'
  private def mapQuoteDash(c: Char): Char = c match {
    case '\u2018' | '\u2019' | '\u201A' | '\u201B' => '\''
    case '\u201C' | '\u201D' | '\u201E' | '\u201F' => '"'
    case '\u2010' | '\u2011' | '\u2012' | '\u2013' | '\u2014' | '\u2015' | '\u2212' => '-'
    case other => other
  }

  /** Public for the generated code path. */
  def evalText(s: UTF8String): UTF8String = {
    val t = s.toString
    val n = t.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var pendingNl = 0
    def visible(c: Char): Unit = {
      if (pendingNl > 0) {
        if (sb.length > 0) sb.append(if (pendingNl >= 3) "\n\n" else "\n" * pendingNl)
      } else if (pendingSpace && sb.length > 0) sb.append(' ')
      pendingNl = 0
      pendingSpace = false
      sb.append(c)
    }
    var i = 0
    while (i < n) {
      val raw = t.charAt(i)
      if (raw == '\r') {
        if (i + 1 < n && t.charAt(i + 1) == '\n') () // \r\n: the \n handles it
        else { pendingNl += 1; pendingSpace = false }
      } else if (raw == '\n' || isNewlineLike(raw)) {
        pendingNl += 1; pendingSpace = false
      } else if (raw == ' ' || raw == '\t' || isUniSpace(raw)) {
        if (pendingNl == 0) pendingSpace = true // spaces after \n drop
      } else if (isRemoved(raw)) {
        () // dropped without touching pending state
      } else if (raw == '\u2026') {
        visible('.'); sb.append('.'); sb.append('.')
      } else {
        visible(mapQuoteDash(raw))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing pendings drop = trim
  }

  override def nullSafeEval(v: Any): Any = evalText(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("textNormalize", this, classOf[TextNormalize].getName)
      s"${ev.value} = $ref.evalText($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API for [[C4LineClean]]: `struct(n_lines, n_kept,
    * clean_text)` per document in one native pass. */
  def c4LineClean(text: Column, minLineWords: Int): Column =
    ColumnBridge.column(C4LineClean(ColumnBridge.expression(text), minLineWords))

  /** Column API for [[FleschCounts]]: `[n_words, n_syllables]` over a
    * lowercased token array (stage [[graft.text.TextFunctions.tokens]]
    * first). */
  def fleschCounts(tokens: Column): Column =
    ColumnBridge.column(FleschCounts(ColumnBridge.expression(tokens)))

  /** Column API for [[StopwordHitCounts]]: element i of the result
    * counts tokens contained in `sets(i)`. Input must be
    * `array<string>` (stage [[graft.text.TextFunctions.tokens]] first). */
  def setHitCounts(tokens: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(StopwordHitCounts(ColumnBridge.expression(tokens), sets))

  /** Column API for [[NgramRepStats]]: `[top_{n1}, dup_{n1}, …]` char
    * coverages per window width. Input must be `array<string>` with no
    * null elements (stage tokens first). */
  def ngramRepStats(tokens: Column, ns: Seq[Int]): Column =
    ColumnBridge.column(NgramRepStats(ColumnBridge.expression(tokens), ns))

  /** Column API for [[TextNormalize]]: unicode cleanup + whitespace
    * structure normalization in one native pass. */
  def textNormalize(text: Column): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(text)))
}
