package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Polite crawl-frontier scheduling (A31) — the dispatch layer between
  * the filtered frontier ([[Robots.filterAllowed]], A20's domain caps)
  * and the fetcher pool ([[HttpFetch]]): per-host FIFO slots spaced by
  * that host's `Crawl-delay` ([[Robots.parseCrawlDelays]]), so a
  * mega-host never gets hammered no matter how many of its URLs the
  * frontier holds, and every other host's queue drains in parallel.
  *
  * Scale shape: ONE window partitioned by host — politeness is
  * inherently serial PER HOST, so per-host sequencing is the minimum
  * possible coordination and the host key is the natural shard;
  * distinct hosts schedule in parallel across the cluster. A host with
  * 10⁶ frontier URLs is one window partition — but a 10⁶-slot schedule
  * at even 1 s/slot spans 11 days of dispatch, so frontiers that
  * lopsided must be capped upstream ([[Urls.capPerDomainExpected]],
  * A20) before the window sees them — and the contract is ENFORCED,
  * not assumed: `maxPerHost` is checked per host inside the plan (a
  * partition-only count over the same host shuffle the sequencing
  * window already pays) and a host past the bound raises with the
  * upstream-cap advice instead of silently building a multi-day
  * schedule on one straggler partition. Delay arbitration is one
  * broadcast-sized join (the rules table is domain-scale).
  */
object Frontier {

  /** Assign each URL its per-host FIFO slot and dispatch offset.
    * `delays` is [[Robots.parseCrawlDelays]]' output; the most
    * specific matching agent group wins (own agent over `*`, larger
    * delay on duplicate directives — deterministic), hosts without a
    * directive get `defaultDelaySeconds`. Slot order within a host is
    * lexicographic by canonical URL (deterministic, engine-agnostic).
    * Output: input columns + `host`, `seq` (0-based slot) and
    * `dispatch_offset_s` = seq × delay. A host holding more than
    * `maxPerHost` frontier URLs fails loud with the A20 upstream-cap
    * advice — the politeness window must never sequence a
    * corpus-frequency key. */
  def schedule(urls: DataFrame, url: Column, delays: DataFrame, agent: String,
               defaultDelaySeconds: Double = 1.0,
               maxPerHost: Long = 100000L): DataFrame = {
    require(defaultDelaySeconds > 0,
      s"defaultDelaySeconds must be positive, got $defaultDelaySeconds")
    require(maxPerHost >= 1, s"maxPerHost must be >= 1, got $maxPerHost")
    Seq("host", "seq", "dispatch_offset_s").foreach(c =>
      require(!urls.columns.contains(c),
        s"schedule reserves output column $c; rename the input column"))
    val appl = delays
      .filter(lower(col("agent")).isin(agent.toLowerCase, "*"))
      .groupBy(col("domain").as("host"))
      .agg(max_by(col("delay_s"), struct(
        when(lower(col("agent")) === agent.toLowerCase, 1).otherwise(0).as("sp"),
        col("delay_s").as("d"))).as("__fr_delay"))
    val withHost = urls.withColumn("host", Urls.hostOf(url))
    val w = Window.partitionBy(col("host")).orderBy(url.asc)
    // partition-only count rides the SAME host shuffle as the
    // sequencing window — the guard costs no extra exchange
    val nPerHost = count(lit(1)).over(Window.partitionBy(col("host")))
    withHost
      .join(broadcast(appl), Seq("host"), "left")
      .withColumn("__fr_d", coalesce(col("__fr_delay"), lit(defaultDelaySeconds)))
      .withColumn("__fr_n", nPerHost)
      .withColumn("seq",
        when(col("__fr_n") <= maxPerHost,
          (row_number().over(w) - 1).cast("long"))
          .otherwise(raise_error(concat(
            lit("Frontier.schedule: host "), col("host"), lit(" holds "),
            col("__fr_n").cast("string"),
            lit(s" frontier URLs > maxPerHost=$maxPerHost; cap the"),
            lit(" frontier upstream (Urls.capPerDomainExpected, A20)"),
            lit(" before scheduling")))))
      .withColumn("dispatch_offset_s", col("seq") * col("__fr_d"))
      .drop("__fr_delay", "__fr_d", "__fr_n")
  }
}
