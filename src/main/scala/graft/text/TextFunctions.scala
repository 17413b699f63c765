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

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword-boundary token count: alpha runs, digit runs, and
    * single non-alphanumeric marks — a deterministic proxy for a real
    * tokenizer's token count. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long")

  /** Word k-shingles ("a b c" 3-grams) of normalized text, distinct.
    * Documents shorter than k tokens yield an empty array. */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    // sequence(1, n) flips to a descending sequence when n < 1, so short
    // documents must short-circuit to an empty array explicitly.
    val make = transform(sequence(lit(1), size(t) - (k - 1)), i =>
      concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*))
    when(size(t) >= k, array_distinct(make)).otherwise(array().cast("array<string>"))
  }

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

  /** Per-language stopword hit counts as (lang → count) columns. */
  def langHits(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    LangStopwords.map { case (lang, words) =>
      lang -> size(filter(t, w => w.isin(words: _*))).cast("long")
    }
  }

  /** Predicted language: argmax of stopword hits with a fixed priority
    * order (list order breaks ties on strict-greater comparison) —
    * fully deterministic.
    *
    * Single-expression formulation: one fold over the tokens carries all
    * per-language counters (array accumulator), a second tiny fold takes
    * the argmax. Tokenization happens exactly once per row — separate
    * hit-count columns would each re-tokenize, since higher-order
    * functions get no common-subexpression elimination. */
  def langId(text: Column): Column = {
    val langs = LangStopwords
    val names = array(langs.map(l => lit(l._1)): _*)
    val hits = aggregate(tokens(text), array_repeat(lit(0L), langs.size),
      (acc, w) => zip_with(acc, names,
        (c, name) => c + langs.foldRight(lit(0L): Column) { case ((lang, words), els) =>
          when(name === lang, when(w.isin(words: _*), 1L).otherwise(0L)).otherwise(els)
        }))
    val best = aggregate(
      zip_with(hits, names, (v, name) => struct(v.as("v"), name.as("lang"))),
      struct(lit(-1L).as("v"), lit("?").as("lang")),
      (acc, x) => when(x.getField("v") > acc.getField("v"), x).otherwise(acc))
    best.getField("lang")
  }

  /** Content fingerprint: MD5 of the normalized text — stable across
    * whitespace/case variation. */
  def contentFingerprint(text: Column): Column = md5(normalize(text))

  /** Winnowing-style minimum shingle fingerprint: the lexicographic min
    * of the MD5s of all word 3-grams. Robust to local edits — two
    * documents sharing most shingles usually share the min. Null for
    * documents under 3 tokens. */
  def minShingleFingerprint(text: Column, k: Int = 3): Column = {
    val sh = shingles(text, k)
    when(size(sh) > 0, array_min(transform(sh, s => md5(s))))
  }
}
