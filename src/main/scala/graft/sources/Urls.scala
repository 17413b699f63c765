package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-side URL canonicalization — the normalization in front of any
  * web-scale dedup or frontier: raw crawl URLs are full of aliasing
  * (tracking params, fragments, case-varied hosts, default ports,
  * doubled slashes) that makes one page look like dozens, inflating
  * fetch volume ([[HttpFetch]]) and defeating URL-level dedup. Every
  * function is a pure narrow-map `Column` expression (codegen'd string
  * ops, zero shuffle) so canonicalization composes into the scan.
  *
  * Reference scope: the reference fetches a fixed id list
  * (fetch_movies.py:21-34) and needs none of this; it comes from the
  * LLM-training-data brief (crawl curation next to C23 PageRank and the
  * A18 fetcher).
  */
object Urls {

  /** Query parameters dropped during canonicalization: cross-site
    * tracking/click identifiers that never change the resource. */
  val DefaultTrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref_src")

  /** Lowercased host (no port, no userinfo); null for unparseable URLs
    * (try_parse_url — ANSI mode must not kill a crawl-scale scan over one
    * malformed URL). */
  def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** Registrable-domain HEURISTIC: the last two host labels, or the
    * last three when the second-to-last is a short generic label
    * (co/com/net/org/gov/edu/ac — "bbc.co.uk" → "bbc.co.uk", not
    * "co.uk"). A documented approximation: the real answer needs the
    * Public Suffix List, which is a lookup table callers can join on
    * the host when exactness matters; this heuristic covers the common
    * ccTLD patterns without carrying that table. */
  def registeredDomainOf(url: Column): Column = {
    val labels = split(hostOf(url), "\\.")
    val n = size(labels)
    val secondLevel = element_at(labels, -2)
    when(n <= 2, array_join(labels, "."))
      .otherwise(when(n >= 3 && secondLevel.isin("co", "com", "net", "org", "gov", "edu", "ac"),
          concat_ws(".", element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
        .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1))))
  }

  /** Canonical form of `url` for URL-level dedup:
    *  - scheme and authority lowercased; default ports (:80 for http,
    *    :443 for https) stripped;
    *  - fragment dropped (client-side only);
    *  - `dropParams` query parameters removed, remaining parameters
    *    SORTED (param order never changes the resource on sane
    *    servers — the standard crawl-dedup assumption), empty query
    *    dropped entirely;
    *  - doubled path slashes collapsed, trailing slash stripped (the
    *    root path stays "/"; an empty path becomes "/").
    * Path and parameter VALUES keep their case (case-sensitive on most
    * servers). Null/unparseable URLs yield null. */
  def canonicalUrl(url: Column, dropParams: Seq[String] = DefaultTrackingParams): Column = {
    val scheme = lower(try_parse_url(url, lit("PROTOCOL")))
    val authority = lower(try_parse_url(url, lit("AUTHORITY")))
    // strip the scheme's default port only
    val auth = when(scheme === "http", regexp_replace(authority, ":80$", ""))
      .when(scheme === "https", regexp_replace(authority, ":443$", ""))
      .otherwise(authority)
    val rawPath = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val squashed = regexp_replace(rawPath, "/{2,}", "/")
    val path = when(squashed === "" , lit("/"))
      .otherwise(when(length(squashed) > 1, regexp_replace(squashed, "/$", ""))
        .otherwise(squashed))
    val q = try_parse_url(url, lit("QUERY"))
    val keptParams = array_join(
      array_sort(filter(split(coalesce(q, lit("")), "&"), p =>
        length(p) > 0 && !lower(split(p, "=").getItem(0))
          .isin(dropParams.map(_.toLowerCase): _*))), "&")
    val query = when(length(keptParams) > 0, concat(lit("?"), keptParams)).otherwise(lit(""))
    when(scheme.isNull || auth.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), auth, path, query))
  }

  /** Keep-first URL-level dedup: one row per canonical URL (minimum
    * `id` wins — deterministic). The groupBy key is the canonical
    * string; at crawl scale this is one hash shuffle with map-side
    * combine, the same shape as content-level exact dedup (D1). */
  def dedupByCanonicalUrl(df: DataFrame, id: Column, url: Column): DataFrame =
    df.select(id.as("id"), canonicalUrl(url).as("canonical_url"))
      .filter(col("canonical_url").isNotNull)
      .groupBy("canonical_url")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_aliases"))

  /** Drop rows whose registrable domain appears in `blocked` (a
    * one-column frame of lowercase domains — the UT1-blocklist shape).
    * An anti-join on the domain: Catalyst broadcasts the typical
    * few-million-row list, and unparseable URLs (null domain) pass
    * through — blocklists exclude known-bad, they don't require
    * parseability. */
  def filterBlockedDomains(df: DataFrame, url: Column, blocked: DataFrame): DataFrame = {
    require(!df.columns.contains("__dom"),
      "filterBlockedDomains reserves column '__dom'; rename the input column")
    val list = blocked.select(lower(col(blocked.columns.head)).as("__dom"))
    df.withColumn("__dom", registeredDomainOf(url))
      .join(list, Seq("__dom"), "left_anti")
      .drop("__dom")
  }

  /** Per-domain frequency cap (the C4/RefinedWeb host-capping step:
    * no single domain may dominate the corpus), SKEW-IMMUNE: a window
    * rank over the domain key would put a hub domain's 10^8 rows into
    * one unsplittable task, so instead per-domain counts come from a
    * partial-aggregating groupBy joined back (AQE-skew-splittable) and
    * each row keeps iff `hash(id) · n_domain < k · M` — a deterministic
    * uniform thinning whose kept count is min(k, n) in EXPECTATION
    * (domains at or under the cap keep everything exactly). For exact
    * k over BOUNDED strata (sources, languages — not web domains) use
    * [[graft.operators.Sampling.exactKPerStratum]]. */
  def capPerDomainExpected(df: DataFrame, id: Column, url: Column, k: Int,
                           salt: String = ""): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    require(!df.columns.contains("__dom") && !df.columns.contains("__n"),
      "capPerDomainExpected reserves columns '__dom'/'__n'; rename the input columns")
    val withDom = df.withColumn("__dom", registeredDomainOf(url))
    val counts = withDom.groupBy("__dom").agg(count(lit(1)).as("__n"))
    withDom.join(counts, Seq("__dom"))
      .filter(col("__n") <= k ||
        graft.operators.Sampling.hashBucket(id, salt) * col("__n") <
          k.toLong * graft.operators.Sampling.M)
      .drop("__dom", "__n")
  }
}
