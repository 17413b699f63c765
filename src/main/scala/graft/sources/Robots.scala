package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL compliance filtering — the legal/polite
  * gate every crawl pipeline needs between frontier and fetch
  * ([[HttpFetch]]), sized for "one rules table × a trillion frontier
  * URLs": parse each domain's robots.txt ONCE into a rules table,
  * then filtering is a domain-keyed join + longest-match arbitration,
  * never a per-URL re-parse.
  *
  * Implements the practical core of REP (RFC 9309): `User-agent`
  * grouping (consecutive UA lines share the following rule block),
  * `Allow`/`Disallow` path prefixes, `#` comments, case-insensitive
  * directives. Matching: the MOST SPECIFIC matching user-agent group
  * wins outright (an agent with its own group ignores `*` entirely),
  * within the group the LONGEST matching prefix wins, allow wins
  * exact-length ties (Google semantics), and no matching rule — or no
  * rules at all for the domain — means allowed. Wildcards inside
  * paths (`*`, `$`) are NOT interpreted (prefix semantics only, the
  * original REP; documented).
  *
  * Scale shape: parsing is one stateful HOF fold per robots body
  * (bodies are KB-sized — trivially narrow); the filter joins the
  * frontier to rules on the DOMAIN key (broadcast when the rules
  * table fits, hash otherwise — both AQE-choosable), candidate
  * fan-out per URL is that domain's rule count, and the verdict is
  * one partial-aggregating `max_by` per URL. A mega-domain with 10⁴
  * rules is a 10⁴ fan-out on one key — the A20/C13 hot-key class,
  * combiner-absorbed. */
object Robots {

  /** Parse robots.txt bodies: one row per (domain, agent, allow,
    * prefix). `body` is the raw robots.txt text. */
  def parseRobots(df: DataFrame, domain: Column, body: Column): DataFrame = {
    val lines = split(coalesce(body, lit("")), "\n")
    // normalized (directive, value) pairs; comments and junk dropped
    val parsed = transform(lines, l => {
      val noComment = regexp_replace(l, "#.*$", "")
      val d = lower(trim(regexp_extract(noComment, "^([^:]+):", 1)))
      val v = trim(regexp_extract(noComment, "^[^:]+:(.*)$", 1))
      struct(d.as("d"), v.as("v"))
    })
    // stateful group scan: consecutive user-agent lines accumulate into
    // the CURRENT agent set; the first rule line after them closes the
    // set; the next user-agent line after rules starts a fresh group
    val folded = aggregate(
      parsed,
      struct(
        array().cast("array<string>").as("agents"),
        lit(false).as("open"),
        array().cast("array<struct<agent:string,allow:boolean,prefix:string>>")
          .as("out")),
      (acc, e) => {
        val d = e.getField("d"); val v = e.getField("v")
        val isUa = d === "user-agent" && length(v) > 0
        val isRule = (d === "allow" || d === "disallow") && length(v) > 0
        val agents = when(isUa && acc.getField("open"), array(lower(v)))
          .when(isUa, array_union(acc.getField("agents"), array(lower(v))))
          .otherwise(acc.getField("agents"))
        val newRules = when(isRule,
          transform(acc.getField("agents"), a => struct(
            a.as("agent"), (d === "allow").as("allow"), v.as("prefix"))))
          .otherwise(array().cast(
            "array<struct<agent:string,allow:boolean,prefix:string>>"))
        struct(
          agents.as("agents"),
          when(isUa, lit(false)).when(isRule, lit(true))
            .otherwise(acc.getField("open")).as("open"),
          concat(acc.getField("out"), newRules).as("out"))
      })
    df.select(domain.as("domain"), explode(folded.getField("out")).as("__r"))
      .select(col("domain"), col("__r.agent"), col("__r.allow"), col("__r.prefix"))
  }

  /** Parse `Crawl-delay` directives: one row per (domain, agent,
    * delay_s). The de-facto-standard politeness directive (not in RFC
    * 9309 but honored by most major crawlers); same consecutive-UA
    * grouping as [[parseRobots]], with a delay line closing the agent
    * group the way a path rule does. Non-numeric values are dropped.
    * Feeds [[Frontier.schedule]]. */
  def parseCrawlDelays(df: DataFrame, domain: Column, body: Column): DataFrame = {
    val lines = split(coalesce(body, lit("")), "\n")
    val parsed = transform(lines, l => {
      val noComment = regexp_replace(l, "#.*$", "")
      val d = lower(trim(regexp_extract(noComment, "^([^:]+):", 1)))
      val v = trim(regexp_extract(noComment, "^[^:]+:(.*)$", 1))
      struct(d.as("d"), v.as("v"))
    })
    val folded = aggregate(
      parsed,
      struct(
        array().cast("array<string>").as("agents"),
        lit(false).as("open"),
        array().cast("array<struct<agent:string,delay:double>>").as("out")),
      (acc, e) => {
        val d = e.getField("d"); val v = e.getField("v")
        // ANSI-safe numeric parse: regex-guarded cast, non-numeric → null
        val delay = when(v.rlike("^[0-9]+(\\.[0-9]+)?$"), v.cast("double"))
        val isUa = d === "user-agent" && length(v) > 0
        val isDelay = d === "crawl-delay" && delay.isNotNull
        // ANY rule line (path rule or delay) closes the agent group —
        // mixed-directive bodies are the norm, and a path rule between
        // UA groups must not let a later group's delay leak backwards
        val isRule = isDelay ||
          ((d === "allow" || d === "disallow") && length(v) > 0)
        val agents = when(isUa && acc.getField("open"), array(lower(v)))
          .when(isUa, array_union(acc.getField("agents"), array(lower(v))))
          .otherwise(acc.getField("agents"))
        val newRows = when(isDelay,
          transform(acc.getField("agents"), a => struct(
            a.as("agent"), delay.as("delay"))))
          .otherwise(array().cast("array<struct<agent:string,delay:double>>"))
        struct(
          agents.as("agents"),
          when(isUa, lit(false)).when(isRule, lit(true))
            .otherwise(acc.getField("open")).as("open"),
          concat(acc.getField("out"), newRows).as("out"))
      })
    df.select(domain.as("domain"), explode(folded.getField("out")).as("__r"))
      .select(col("domain"), col("__r.agent"), col("__r.delay").as("delay_s"))
  }

  /** Keep the URLs `agent` may fetch. `rules` is [[parseRobots]]'
    * output; URLs on domains absent from it are allowed (no robots =
    * no restriction — the web's default). */
  def filterAllowed(urls: DataFrame, url: Column, rules: DataFrame,
                    agent: String): DataFrame = {
    val host = Urls.hostOf(url)
    // try_parse_url yields EMPTY (not null) for path-less URLs like
    // 'https://d.com' — normalize both to '/', or 'Disallow: /' would
    // never match the site root
    val path0 = try_parse_url(url, lit("PATH"))
    val path = when(path0.isNull || length(path0) === 0, lit("/")).otherwise(path0)
    // unique per-row key: the verdict groupBy must preserve input
    // multiplicity (grouping on the data columns alone would silently
    // dedup identical frontier rows — a filter never changes counts)
    Seq("__rb_id", "__rb_host", "__rb_path").foreach(c =>
      require(!urls.columns.contains(c),
        s"filterAllowed reserves working column $c; rename the input column"))
    val withKey = urls.withColumn("__rb_id", monotonically_increasing_id())
      .withColumn("__rb_host", host).withColumn("__rb_path", path)
    val cand = withKey.join(
      rules.select(col("domain").as("__rb_host"), col("agent").as("__rb_a"),
        col("allow").as("__rb_allow"), col("prefix").as("__rb_p")),
      Seq("__rb_host"), "left")
    // rules for OTHER agents must contribute nothing — but never by
    // filtering, which would drop a URL whose domain has only foreign
    // rules; null-guard inside the aggregates instead
    val applicable = col("__rb_a") === lit(agent.toLowerCase) || col("__rb_a") === "*"
    // per URL: does a specific-agent group exist → that group wins
    // outright; then longest matching prefix, allow wins length ties;
    // unmatched / rule-free URLs are allowed
    val specific = max(when(
      applicable && col("__rb_a") === lit(agent.toLowerCase), lit(1))
      .otherwise(lit(0)))
    val verdict = cand
      .groupBy((col("__rb_id") +: urls.columns.map(col)).toSeq: _*)
      .agg(specific.as("__sp"),
        max(when(applicable && col("__rb_p").isNotNull &&
            col("__rb_path").startsWith(col("__rb_p")),
          struct(
            when(col("__rb_a") === lit(agent.toLowerCase), lit(1)).otherwise(lit(0))
              .as("sp"),
            length(col("__rb_p")).as("plen"),
            col("__rb_allow").as("allow")))).as("__m"))
    verdict.filter(
        col("__m").isNull ||                       // no matching rule
        (col("__sp") === 1 && col("__m.sp") === 0) || // specific group exists,
                                                      // best match is only in *
        col("__m.allow"))
      .select(urls.columns.map(col): _*)
  }
}
