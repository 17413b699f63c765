package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher repetition rules (Rae et al. 2021, arXiv 2112.11446 Table A1,
  * bottom half) — the published hard gates against self-repeating text,
  * completing [[GopherFilter]]'s quality half:
  *
  *   - duplicate-line fraction ≤ 0.30 and duplicate-line CHARACTER
  *     fraction ≤ 0.20 (chars in occurrences beyond each line's first);
  *     the same pair over blank-line-separated paragraphs at ≤ 0.30 /
  *     ≤ 0.20;
  *   - top n-gram character fraction for n = 2,3,4 (chars covered by
  *     the single most frequent word n-gram; count ties break to the
  *     longer gram) ≤ 0.20 / 0.18 / 0.16;
  *   - duplicated n-gram character fraction for n = 5..10 (chars over
  *     ALL occurrences of every n-gram appearing ≥ 2 times; overlapping
  *     occurrences each count, per the paper) ≤ 0.15 / 0.14 / 0.13 /
  *     0.12 / 0.11 / 0.10.
  *
  * Everything is a narrow map: per-document n-gram frequencies come
  * from ONE native in-row pass
  * ([[graft.expressions.NgramRepStats]] — interned token ids hashed
  * per window into a count map, all widths in one expression) — no
  * explode, no shuffle, no corpus-wide gram key (the d28 Zipf-skew
  * class is structurally absent because grams never leave their row).
  * Line/paragraph arrays are staged in their own projections
  * (interpreted higher-order functions get no common-subexpression
  * elimination — [[TextFunctions.shinglesOf]]).
  *
  * Line rules run on RAW text (normalization collapses newlines);
  * n-gram denominators use the normalized-text length, the exact
  * character count of the space-joined token stream.
  */
object GopherRepetition {

  /** (n, threshold) for the top-n-gram character-fraction gates. */
  val TopNgramCaps: Seq[(Int, Double)] = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)

  /** (n, threshold) for the duplicated-n-gram character-fraction gates. */
  val DupNgramCaps: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  private def safeFrac(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  /** Appends `prefix` (a struct of the Table A1 repetition metrics,
    * per-rule booleans, and their conjunction `keep`) to `df`.
    *
    * Struct fields: `dup_line_frac`, `dup_line_char_frac`,
    * `dup_para_frac`, `dup_para_char_frac`, `top_<n>gram_char_frac`,
    * `dup_<n>gram_char_frac`, `ok_dup_lines`, `ok_dup_line_chars`,
    * `ok_dup_paras`, `ok_dup_para_chars`, `ok_top_ngrams`,
    * `ok_dup_ngrams`, `keep`. A DataFrame→DataFrame (not Column) API
    * because the sorted shingle arrays must be materialized between
    * projections. */
  def addFlags(df: DataFrame, text: Column, prefix: String = "rep"): DataFrame = {
    val ns = (TopNgramCaps ++ DupNgramCaps).map(_._1)
    val t = coalesce(text, lit(""))
    val stage1 = df.select(
      col("*"),
      // drop empty tokens: whitespace-only text normalizes to " ", which
      // would otherwise shingle two empty tokens into a 1-char gram that
      // covers the whole 1-char denominator
      filter(TextFunctions.tokens(t), w => length(w) > 0).as("__rep_toks"),
      greatest(length(TextFunctions.normalize(t)), lit(1)).as("__rep_nchars"),
      transform(split(t, "\n"), l => trim(l)).as("__rep_rawlines"),
      transform(split(t, "\n{2,}"), p => trim(p)).as("__rep_rawparas"))
    val stage2 = stage1.select(
      col("*"),
      filter(col("__rep_rawlines"), l => length(l) > 0).as("__rep_lines"),
      filter(col("__rep_rawparas"), p => length(p) > 0).as("__rep_paras"))
    // one native pass computes every width's (top, dup) char coverage —
    // NgramRepStats replaces the former per-width array_sort + run-fold
    // HOF chains (interpreted, no CSE) with an in-row count map
    val stage5 = stage2.select(
      col("*"),
      array_distinct(col("__rep_lines")).as("__rep_lines_d"),
      array_distinct(col("__rep_paras")).as("__rep_paras_d"),
      graft.expressions.TextExpressions.ngramRepStats(col("__rep_toks"), ns).as("__rep_ng"))

    def charsOf(arr: Column): Column =
      coalesce(aggregate(arr, lit(0L), (acc, x) => acc + length(x)), lit(0L))

    val dupLineFrac = safeFrac(
      size(col("__rep_lines")) - size(col("__rep_lines_d")), size(col("__rep_lines")))
    val dupLineCharFrac = safeFrac(
      charsOf(col("__rep_lines")) - charsOf(col("__rep_lines_d")), charsOf(col("__rep_lines")))
    val dupParaFrac = safeFrac(
      size(col("__rep_paras")) - size(col("__rep_paras_d")), size(col("__rep_paras")))
    val dupParaCharFrac = safeFrac(
      charsOf(col("__rep_paras")) - charsOf(col("__rep_paras_d")), charsOf(col("__rep_paras")))
    val topFracs = TopNgramCaps.map { case (n, cap) =>
      val idx = ns.indexOf(n)
      val f = safeFrac(element_at(col("__rep_ng"), 2 * idx + 1), col("__rep_nchars"))
      (n, cap, f)
    }
    val dupFracs = DupNgramCaps.map { case (n, cap) =>
      val idx = ns.indexOf(n)
      val f = safeFrac(element_at(col("__rep_ng"), 2 * idx + 2), col("__rep_nchars"))
      (n, cap, f)
    }
    val okDupLines = dupLineFrac <= 0.30
    val okDupLineChars = dupLineCharFrac <= 0.20
    val okDupParas = dupParaFrac <= 0.30
    val okDupParaChars = dupParaCharFrac <= 0.20
    val okTop = topFracs.map { case (_, cap, f) => f <= cap }.reduce(_ && _)
    val okDup = dupFracs.map { case (_, cap, f) => f <= cap }.reduce(_ && _)
    val fields: Seq[Column] =
      Seq(dupLineFrac.as("dup_line_frac"),
        dupLineCharFrac.as("dup_line_char_frac"),
        dupParaFrac.as("dup_para_frac"),
        dupParaCharFrac.as("dup_para_char_frac")) ++
        topFracs.map { case (n, _, f) => f.as(s"top_${n}gram_char_frac") } ++
        dupFracs.map { case (n, _, f) => f.as(s"dup_${n}gram_char_frac") } ++
        Seq(okDupLines.as("ok_dup_lines"),
          okDupLineChars.as("ok_dup_line_chars"),
          okDupParas.as("ok_dup_paras"),
          okDupParaChars.as("ok_dup_para_chars"),
          okTop.as("ok_top_ngrams"),
          okDup.as("ok_dup_ngrams"),
          (okDupLines && okDupLineChars && okDupParas && okDupParaChars && okTop && okDup).as("keep"))
    stage5
      .select(col("*"), struct(fields: _*).as(prefix))
      .drop(stage5.columns.filter(_.startsWith("__rep_")): _*)
  }
}
