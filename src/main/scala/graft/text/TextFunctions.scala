package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * primitives (codegen'd, whole-stage-compatible) — no UDFs — so a
  * 100 TB text scan stays a single narrow pass with column pruning.
  */
object TextFunctions {

  /** Canonical text normalization shared by dedup/fingerprinting:
    * trim, lowercase, collapse whitespace runs to single spaces. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Collapse runs of identical consecutive elements to one occurrence
    * ("the the the" → "the"; works on any array — tokens for stutter
    * removal, lines for C4-style repeated-line cleanup). Element i
    * survives iff it differs from element i−1; the comparison is
    * null-safe and the index guard is a `when`, not a boolean OR, so
    * the 1-based `element_at` never sees index 0 under ANSI mode.
    *
    * `arr` MUST be a staged column (materialized in its own projection),
    * not an inline expression: interpreted HOFs get no common-
    * subexpression elimination, so an inline `tokens(text)` would
    * re-tokenize per element via the lambda's `element_at` — the O(n²)
    * trap [[shinglesOf]] documents. Narrow map; no shuffle. */
  def collapseRuns(arr: Column): Column =
    filter(arr, (x, i) =>
      when(i === 0, lit(true)).otherwise(!(x <=> element_at(arr, i))))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword-boundary token count: alpha runs, digit runs, and
    * single non-alphanumeric marks — a deterministic proxy for a real
    * tokenizer's token count. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long")

  /** Word k-shingles ("a b c" 3-grams) over a PRE-MATERIALIZED token
    * array column, distinct. Documents shorter than k tokens yield an
    * empty array.
    *
    * Callers in hot paths should materialize `tokens(text)` in a prior
    * projection and pass the attribute here: higher-order functions are
    * interpreted with NO common-subexpression elimination, so referencing
    * a raw `tokens(text)` expression would re-run the tokenizing regex
    * for every `element_at` call — O(shingles × k) regex evaluations per
    * row instead of one. */
  def shinglesOf(t: Column, k: Int): Column =
    array_distinct(shinglesAllOf(t, k))

  /** Non-distinct k-shingles over a pre-materialized token array. Use
    * when downstream semantics ignore duplicates (e.g. MinHash minima) —
    * skips the O(n²) `array_distinct` pass. */
  def shinglesAllOf(t: Column, k: Int): Column = {
    // sequence(1, n) flips to a descending sequence when n < 1, so short
    // documents must short-circuit to an empty array explicitly.
    val make = transform(sequence(lit(1), size(t) - (k - 1)), i =>
      concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*))
    when(size(t) >= k, make).otherwise(array().cast("array<string>"))
  }

  /** Word k-shingles of normalized text, distinct. Convenience form; hot
    * paths should stage [[tokens]] and call [[shinglesOf]] (see note
    * there). */
  def shingles(text: Column, k: Int): Column = shinglesOf(tokens(text), k)

  /** Punctuation ratio over characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;]", "")).cast("double") / length(text)

  /** Uppercase-character ratio. */
  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text)

  /** Ratio of tokens appearing in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t)
  }

  /** Composite quality score in [0,1]: rewards length (saturating at
    * `fullWords` words), penalizes punctuation- and uppercase-heavy text.
    * Mirrors the shape of C4/Gopher-style quality heuristics. */
  def qualityScore(text: Column, fullWords: Int = 100): Column = {
    val words = tokenCount(text).cast("double")
    least(lit(1.0), words / fullWords) * 0.5 +
      (lit(1.0) - least(punctRatio(text), lit(1.0))) * 0.3 +
      (lit(1.0) - least(upperRatio(text), lit(1.0))) * 0.2
  }

  /** Stopword lists for the language-ID heuristic. Deliberately tiny:
    * the operator is the pattern (per-language hit counting with a
    * deterministic argmax), not a production language model. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "es" -> Seq("el", "la", "de", "los", "que", "y", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "dans", "que"))

  /** Per-language stopword hit counts over a PRE-MATERIALIZED token
    * array (see [[shinglesOf]] for why staging matters).
    *
    * All languages are counted by ONE native pass
    * ([[graft.expressions.StopwordHitCounts]]: a token → language-mask
    * hash lookup per element, codegen'd) instead of one interpreted
    * `size(filter(isin))` sweep per language — the per-language columns
    * below are `element_at` projections over that single shared result
    * (common-subexpression-eliminated in codegen). */
  def langHitsOf(t: Column): Seq[(String, Column)] = {
    val hits = graft.expressions.TextExpressions.setHitCounts(t, LangStopwords.map(_._2))
    LangStopwords.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(hits, i + 1)
    }
  }

  /** Per-language stopword hit counts as (lang → count) columns. */
  def langHits(text: Column): Seq[(String, Column)] = langHitsOf(tokens(text))

  /** Argmax over per-language hit-count columns with list-order
    * tie-break (an earlier language wins ties) — fully deterministic,
    * and a plain comparison CASE chain, so it stays inside whole-stage
    * codegen.
    *
    * (The r1 formulation folded an array accumulator over the tokens —
    * one interpreted `aggregate`+`zip_with` per row — and was the #3
    * bench hot spot. Hit counting via `size(filter(...))` over a staged
    * token array plus this codegen'd argmax is strictly cheaper.) */
  def langPred(hits: Seq[(String, Column)]): Column = {
    val preds = hits.zipWithIndex.init.map { case ((lang, h), i) =>
      val beatsRest = hits.drop(i + 1).map { case (_, h2) => h >= h2 }.reduce(_ && _)
      (beatsRest, lang)
    }
    preds.foldRight(lit(hits.last._1)) { case ((cond, lang), els) =>
      when(cond, lit(lang)).otherwise(els)
    }
  }

  /** Predicted language: argmax of stopword hits, earlier language wins
    * ties. Convenience one-shot form; hot paths should stage [[tokens]]
    * once and compose [[langHitsOf]] + [[langPred]] across projections. */
  def langId(text: Column): Column = langPred(langHits(text))

  /** Repetition ratio over a PRE-MATERIALIZED token array: 1 −
    * distinct/total. Boilerplate, keyword stuffing, and generation
    * loops repeat tokens; clean prose stays low — a standard
    * Gopher-style quality signal alongside [[qualityScore]]. 0 for
    * empty/degenerate docs rather than null. */
  def repetitionRatioOf(t: Column): Column =
    when(size(t) > 0,
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
      .otherwise(lit(0.0))

  /** Content fingerprint: MD5 of the normalized text — stable across
    * whitespace/case variation. */
  def contentFingerprint(text: Column): Column = md5(normalize(text))

  /** Winnowing-style minimum shingle fingerprint over a PRE-MATERIALIZED
    * token array: the lexicographic min of the MD5s of all word
    * k-grams. Robust to local edits — two documents sharing most
    * shingles usually share the min. Null for documents under k tokens. */
  def minShingleFingerprintOf(t: Column, k: Int = 3): Column = {
    val sh = shinglesOf(t, k)
    when(size(sh) > 0, array_min(transform(sh, s => md5(s))))
  }

  /** Min-shingle fingerprint of raw text. Convenience form; hot paths
    * should stage [[tokens]] and call [[minShingleFingerprintOf]] — an
    * inline token expression is re-evaluated per element access inside
    * the interpreted shingle HOF (this was a 45s-at-sf0.1 bench query
    * before staging; ~1s after). */
  def minShingleFingerprint(text: Column, k: Int = 3): Column =
    minShingleFingerprintOf(tokens(text), k)
}
