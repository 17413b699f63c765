package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style heuristic quality rules (Rae et al. 2021, arXiv
  * 2112.11446 Table A1 — the canonical pretraining filter set next to
  * C4's): per-document boolean flags plus the metrics behind them, all
  * as ONE narrow-map struct expression over the staged token array —
  * zero shuffle, codegen-friendly, composable into the scan ahead of
  * any dedup or mixing stage. [[graft.text.TextFunctions.qualityScoreOf]]
  * (D7) is the soft sibling; these are the published hard gates.
  *
  * Thresholds are the paper's: word count in [minWords, maxWords],
  * mean word length in [3, 10], symbol-to-word ratio ≤ 0.1 ('#' chars
  * and "..."/"…" runs), ≥80% of words containing an alphabetic
  * character, ≥2 stop-word occurrences, ≤90% of lines starting with a
  * bullet, ≤30% of lines ending in an ellipsis. Words are the
  * engine-wide normalized whitespace tokens; line rules run on the RAW
  * text (normalization collapses newlines).
  */
object GopherFilter {

  /** The paper's stop-word gate list. */
  val StopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Struct column of per-rule booleans + `keep` (their conjunction).
    * Field order is fixed and mirrored by the d41 oracle. */
  def flags(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") / n
    val nSymbols = (length(text) - length(regexp_replace(text, "#", ""))).cast("double") +
      size(regexp_extract_all(text, lit("(\\.{3}|…)"), lit(1))).cast("double")
    val nAlpha = size(filter(toks, w => w.rlike("[a-z]"))).cast("double")
    val nStop = size(filter(toks, w => w.isin(StopWords: _*)))
    val lines = filter(split(coalesce(text, lit("")), "\n"), l => length(trim(l)) > 0)
    val nLines = greatest(size(lines).cast("double"), lit(1.0))
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double")
    val nEllipsis = size(filter(lines, l => trim(l).rlike("(\\.{3}|…)$"))).cast("double")
    val fWords = size(toks) >= minWords && size(toks) <= maxWords
    val fMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val fSymbols = nSymbols / greatest(n, lit(1.0)) <= 0.1
    val fAlpha = nAlpha / greatest(n, lit(1.0)) >= 0.8
    val fStop = nStop >= 2
    val fBullet = nBullet / nLines <= 0.9
    val fEllipsis = nEllipsis / nLines <= 0.3
    struct(
      fWords.as("ok_word_count"),
      fMeanLen.as("ok_mean_word_len"),
      fSymbols.as("ok_symbol_ratio"),
      fAlpha.as("ok_alpha_words"),
      fStop.as("ok_stop_words"),
      fBullet.as("ok_bullet_lines"),
      fEllipsis.as("ok_ellipsis_lines"),
      (fWords && fMeanLen && fSymbols && fAlpha && fStop && fBullet && fEllipsis).as("keep"))
  }
}
