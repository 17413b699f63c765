package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → main-text extraction as a pure column pipeline — the crawl
  * ingestion step between the raw fetch ([[graft.sources.HttpFetch]])
  * and line/document quality gating ([[Boilerplate]], [[GopherFilter]]).
  * The reference pipeline ingests pre-extracted JSON; a 100 TB crawl
  * corpus arrives as HTML, so extraction must run inside the scan:
  * every step here is a codegen'd `regexp_replace`/`replace` narrow
  * map — zero shuffle, no UDF, no external parser (a DOM parse per
  * document would allocate far more than the regex passes and cannot
  * run inside whole-stage codegen).
  *
  * Deterministic, engine-mirrorable rules (documented contract, not a
  * browser emulation):
  *   1. comments and `script`/`style`/`noscript`/`head`/`template`
  *      element BODIES are dropped (their text is never content);
  *   2. block-level tags become newlines (paragraph structure survives
  *      for the downstream line-level classifiers);
  *   3. every remaining tag is stripped;
  *   4. the five standard entities plus `&#39;`/`&nbsp;` are decoded,
  *      `&amp;` LAST (so `&amp;lt;` decodes to the literal `&lt;`,
  *      never to `<` — single-pass decode, the anti-double-decode
  *      order);
  *   5. horizontal whitespace collapses to single spaces, blank lines
  *      collapse away, and the result is edge-trimmed.
  *
  * Regexes stay within the portable intersection of Java regex and
  * RE2 ((?is) inline flags, non-greedy quantifiers, \b) so a DuckDB
  * oracle can mirror extraction byte-for-byte.
  */
object HtmlExtract {

  private val BlockTags =
    "p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|table|thead|tbody|" +
      "section|article|aside|header|footer|nav|main|form|blockquote|pre|figure|figcaption"

  /** Tags whose entire content is non-text; bodies removed wholesale. */
  private val DropElems = Seq("script", "style", "noscript", "head", "template")

  /** Plain text of an HTML document per the rules above. Null-safe
    * (null → empty). */
  def extractText(html: Column): Column = {
    val noComments = regexp_replace(coalesce(html, lit("")), "(?s)<!--.*?-->", "")
    val noDropped = DropElems.foldLeft(noComments) { (c, t) =>
      regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t\\s*>", "")
    }
    val blocksToNewline =
      regexp_replace(noDropped, s"(?i)</?(?:$BlockTags)\\b[^>]*/?>", "\n")
    val noTags = regexp_replace(blocksToNewline, "<[^>]*>", "")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    val spaced = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val tightLines = regexp_replace(spaced, " ?\\n ?", "\n")
    val squeezed = regexp_replace(tightLines, "\\n+", "\n")
    regexp_replace(squeezed, "^\\n+|\\n+$", "")
  }

  /** Audit metrics for extraction QA dashboards: raw size, extracted
    * size, tag/link/script counts — one struct, same narrow map. */
  def extractionStats(html: Column): Column = {
    val h = coalesce(html, lit(""))
    struct(
      length(h).cast("long").as("raw_chars"),
      length(extractText(h)).cast("long").as("text_chars"),
      size(regexp_extract_all(h, lit("<[a-zA-Z][^>]*>"), lit(0))).cast("long").as("n_tags"),
      size(regexp_extract_all(h, lit("(?i)<a\\b"), lit(0))).cast("long").as("n_links"),
      size(regexp_extract_all(h, lit("(?i)<script\\b"), lit(0))).cast("long").as("n_scripts"))
  }
}
