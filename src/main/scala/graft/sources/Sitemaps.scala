package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemap.xml parsing (A32) — the crawl DISCOVERY channel next to the
  * compliance channel ([[Robots]]): a site's sitemap enumerates its
  * fetchable URLs with freshness hints, so a recrawl pipeline reads
  * sitemaps instead of re-spidering, and `lastmod` drives incremental
  * pulls (join against the A28 bookmark: only entries newer than the
  * mark re-enter the frontier).
  *
  * Parsing is regex extraction over the XML body (the A21/A25
  * discipline: sitemaps are machine-generated and schema-rigid —
  * `<url>`/`<sitemap>` blocks with `<loc>` and optional freshness
  * tags; no per-row DOM object, everything codegen'd). Both document
  * sitemaps and sitemapindex files parse in one pass: index entries
  * surface as `is_index = true` rows whose `loc` is the CHILD sitemap
  * to fetch — the caller loops fetch→parse until no index rows remain
  * (sitemap trees are ≤2 levels in practice; the loop is driver-side
  * over domain-scale rows, never data-scale).
  *
  * Scale shape: one scan + one generate per sitemap body; bodies are
  * ≤50 MB by protocol (50k URLs), a bounded per-row cost, and the
  * output is frontier-scale rows that flow straight into
  * [[Robots.filterAllowed]] → [[Frontier.schedule]].
  */
object Sitemaps {

  /** One row per sitemap entry: (sitemap_url, is_index, loc,
    * lastmod, lastmod_date, changefreq, priority). `lastmod` is the
    * raw W3C-datetime string; `lastmod_date` is its date prefix parsed
    * (null when absent/malformed — never an ANSI cast error).
    * Entries without a `<loc>` are dropped. */
  def parseSitemap(df: DataFrame, url: Column, xml: Column): DataFrame = {
    val x = coalesce(xml, lit(""))
    val urlBlocks = regexp_extract_all(x, lit("(?s)<url>(.*?)</url>"), lit(1))
    val idxBlocks = regexp_extract_all(x, lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))
    val entries = concat(
      transform(urlBlocks, b => struct(lit(false).as("is_index"), b.as("b"))),
      transform(idxBlocks, b => struct(lit(true).as("is_index"), b.as("b"))))
    // Real-world sitemaps wrap values in CDATA (<loc><![CDATA[…]]></loc>)
    // and some generators namespace-qualify the tags (<sm:loc>); both
    // must still parse — a CDATA wrapper surviving into the URL silently
    // fails host matching in Robots.filterAllowed/Frontier.schedule
    // downstream. Non-capturing prefix groups keep the value in group 1.
    def tag(b: Column, t: String): Column = {
      val raw = trim(regexp_extract(b,
        s"(?s)<(?:\\w+:)?$t(?:\\s[^>]*)?>(.*?)</(?:\\w+:)?$t>", 1))
      val v = trim(regexp_replace(raw,
        "(?s)^<!\\[CDATA\\[(.*)\\]\\]>$", "$1"))
      when(length(v) > 0, v)
    }
    val b = col("__e.b")
    val lastmod = tag(b, "lastmod")
    val prio = tag(b, "priority")
    df.select(url.as("sitemap_url"), explode(entries).as("__e"))
      .select(
        col("sitemap_url"),
        col("__e.is_index").as("is_index"),
        tag(b, "loc").as("loc"),
        lastmod.as("lastmod"),
        // date prefix, parse-guarded end to end: a digit-shaped but
        // INVALID date (2024-02-30) must also yield null, never an
        // ANSI error mid-crawl — try_to_timestamp, not a bare to_date
        // behind a shape regex
        when(lastmod.rlike("^\\d{4}-\\d{2}-\\d{2}"),
          to_date(try_to_timestamp(substring(lastmod, 1, 10),
            lit("yyyy-MM-dd")))).as("lastmod_date"),
        lower(tag(b, "changefreq")).as("changefreq"),
        when(prio.rlike("^[0-9]*\\.?[0-9]+$"), prio.cast("double")).as("priority"))
      .filter(col("loc").isNotNull)
  }

  /** Incremental-recrawl filter: entries strictly newer than the A28
    * bookmark `mark` (entries WITHOUT a lastmod are kept — an unknown
    * freshness must re-fetch, the conservative direction). */
  def newSince(entries: DataFrame, mark: java.sql.Date): DataFrame =
    entries.filter(col("lastmod_date").isNull || col("lastmod_date") > lit(mark))
}
