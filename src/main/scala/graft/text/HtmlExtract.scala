package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  private val AnchorRe =
    "(?is)<a\\b[^>]*?href\\s*=\\s*[\"']([^\"'#][^\"']*)[\"'][^>]*>(.*?)</a"

  /** `array<struct<href, anchor>>` of a page's anchor links — the raw
    * material of the crawl link graph ([[linkEdges]] turns it into an
    * edge table for C23/C61/C62). Codegen'd `regexp_extract_all`, one
    * pass per capture group, zipped positionally — no UDF, no parser
    * object per row. Fragment-only links (`href="#..."`) are excluded
    * at the regex (they navigate within the page, not the graph);
    * anchor text is tag-stripped and whitespace-squeezed. */
  def extractLinks(html: Column): Column = {
    val h = coalesce(html, lit(""))
    val hrefs = regexp_extract_all(h, lit(AnchorRe), lit(1))
    val anchors = regexp_extract_all(h, lit(AnchorRe), lit(2))
    zip_with(hrefs, anchors, (href, a) => struct(
      href.as("href"),
      trim(regexp_replace(regexp_replace(a, "<[^>]*>", " "), "\\s+", " "))
        .as("anchor")))
  }

  /** Resolve an extracted href against its page URL — absolute
    * http(s) kept, protocol-relative `//…` and root-relative `/…`
    * completed from the base, everything else (relative paths,
    * mailto:, javascript:) null: relative-path resolution needs dot-
    * segment normalization that buys little on crawl graphs (root-
    * relative + absolute dominate) and is documented out of scope. */
  def resolveLink(baseUrl: Column, href: Column): Column = {
    val proto = try_parse_url(baseUrl, lit("PROTOCOL"))
    val host = try_parse_url(baseUrl, lit("HOST"))
    when(href.rlike("(?i)^https?://"), href)
      .when(href.startsWith("//") && proto.isNotNull, concat(proto, lit(":"), href))
      .when(href.startsWith("/") && proto.isNotNull && host.isNotNull,
        concat(proto, lit("://"), host, href))
  }

  /** The crawl link graph: one (src, dst) edge per resolved,
    * canonicalized anchor link, self-loops and unresolvable hrefs
    * dropped, deduped — feeds PageRank/harmonic/LPA directly. One
    * scan + one generate + one distinct shuffle. */
  def linkEdges(df: DataFrame, url: Column, html: Column): DataFrame = {
    import graft.sources.Urls
    val src = Urls.canonicalUrl(url)
    df.select(src.as("src"), explode(extractLinks(html)).as("__l"))
      .select(col("src"), Urls.canonicalUrl(
        resolveLink(col("src"), col("__l.href"))).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
  }
}
