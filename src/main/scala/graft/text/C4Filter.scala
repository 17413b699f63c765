package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style cleaning (Raffel et al. 2020, arXiv 1910.10683 §2.2) — the
  * other canonical pretraining filter set next to [[GopherFilter]]'s.
  * Where Gopher is document-level hard GATES, C4 is first a LINE-level
  * rewrite (keep only sentence-like lines) and then page-level gates on
  * the cleaned text. Both phases are narrow-map struct expressions over
  * staged line arrays — zero shuffle, codegen-friendly, composable into
  * the scan ahead of dedup/mixing (C4's own ordering: clean → gate →
  * span-dedup, the last being [[graft.dedup.Dedup]] span/paragraph ops).
  *
  * Line keep rule (the paper's): the trimmed line ends in a terminal
  * punctuation mark (`.` `!` `?` or a closing quote after one), has at
  * least `minLineWords` whitespace words, and does not contain the word
  * "javascript" (case-insensitive). Page gates on the cleaned text:
  * at least `minSentences` sentences (terminal-punctuation runs), no
  * "lorem ipsum", no `{` (code page signal), and no word from
  * `badWords`. All rules are plain regex/HOF logic so an external SQL
  * oracle can recompute them bit-for-bit.
  */
object C4Filter {

  private def words(l: Column): Column =
    split(trim(regexp_replace(l, "\\s+", " ")), " ")

  /** Per-line C4 keep predicate over a trimmed, non-blank line. */
  private def keepLine(l: Column, minLineWords: Int): Column =
    l.rlike("[.!?][\"”']?$") &&
      size(words(l)) >= minLineWords &&
      !lower(l).contains("javascript")

  /** Appends `prefix` = struct(n_lines, n_kept, clean_text): blank
    * lines dropped, surviving lines rejoined with a newline in original
    * order. Production path is the native single-pass
    * [[graft.expressions.C4LineClean]] (the staged-HOF reference chain
    * below compiles to three interpreted lambda passes per document;
    * C4FilterSpec asserts both agree, including the `$`-before-`\r`
    * regex nuance). */
  def addCleanLines(df: DataFrame, text: Column, prefix: String = "c4",
                    minLineWords: Int = 5): DataFrame =
    df.withColumn(prefix,
      graft.expressions.TextExpressions.c4LineClean(coalesce(text, lit("")), minLineWords))

  /** REFERENCE implementation of [[addCleanLines]] — the declarative
    * HOF chain the native expression replaces; kept for the
    * equivalence spec so the two can never silently diverge. */
  private[graft] def addCleanLinesRef(df: DataFrame, text: Column, prefix: String = "c4",
                                      minLineWords: Int = 5): DataFrame = {
    val stage = df.select(col("*"),
      filter(transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
        l => length(l) > 0).as("__c4_lines"))
    stage
      .select(col("*"),
        filter(col("__c4_lines"), l => keepLine(l, minLineWords)).as("__c4_kept"))
      .select(col("*"), struct(
          size(col("__c4_lines")).cast("long").as("n_lines"),
          size(col("__c4_kept")).cast("long").as("n_kept"),
          array_join(col("__c4_kept"), "\n").as("clean_text"))
        .as(prefix))
      .drop("__c4_lines", "__c4_kept")
  }

  /** Number of sentences in cleaned text = terminal-punctuation runs
    * (`[.!?]+`), the paper's "at least 3 sentences" unit. */
  def sentenceCount(clean: Column): Column =
    size(regexp_extract_all(clean, lit("([.!?]+)"), lit(1))).cast("long")

  /** Page-level gate struct over the CLEANED text: field order is fixed
    * and mirrored by the d56 oracle. `keep` is the conjunction. */
  def pageFlags(clean: Column, minSentences: Int = 3,
                badWords: Seq[String] = Nil): Column = {
    val lc = lower(clean)
    val fSentences = sentenceCount(clean) >= minSentences
    val fLorem = !lc.contains("lorem ipsum")
    val fBrace = !clean.contains("{")
    val fBad =
      if (badWords.isEmpty) lit(true)
      else !arrays_overlap(TextFunctions.tokens(clean), array(badWords.map(lit): _*))
    struct(
      fSentences.as("ok_sentences"),
      fLorem.as("ok_lorem"),
      fBrace.as("ok_brace"),
      fBad.as("ok_bad_words"),
      (fSentences && fLorem && fBrace && fBad).as("keep"))
  }

  /** The composed C4 pipeline: clean lines, then gate pages; returns
    * the input columns plus `c4` (line stats + clean_text) and `flags`
    * (page gates). Callers filter on `flags.keep` and continue with
    * `c4.clean_text`. */
  def clean(df: DataFrame, text: Column, minLineWords: Int = 5,
            minSentences: Int = 3, badWords: Seq[String] = Nil): DataFrame =
    addCleanLines(df, text, "c4", minLineWords)
      .withColumn("flags", pageFlags(col("c4.clean_text"), minSentences, badWords))
}
