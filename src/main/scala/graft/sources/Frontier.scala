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
  * lopsided are capped upstream ([[Urls.capPerDomainExpected]], A20)
  * long before the window sees them; the window never runs over a
  * corpus-frequency key. Delay arbitration is one broadcast-sized
  * join (the rules table is domain-scale).
  */
object Frontier {

  /** Assign each URL its per-host FIFO slot and dispatch offset.
    * `delays` is [[Robots.parseCrawlDelays]]' output; the most
    * specific matching agent group wins (own agent over `*`, larger
    * delay on duplicate directives — deterministic), hosts without a
    * directive get `defaultDelaySeconds`. Slot order within a host is
    * lexicographic by canonical URL (deterministic, engine-agnostic).
    * Output: input columns + `host`, `seq` (0-based slot) and
    * `dispatch_offset_s` = seq × delay. */
  def schedule(urls: DataFrame, url: Column, delays: DataFrame, agent: String,
               defaultDelaySeconds: Double = 1.0): DataFrame = {
    require(defaultDelaySeconds > 0,
      s"defaultDelaySeconds must be positive, got $defaultDelaySeconds")
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
    withHost
      .join(broadcast(appl), Seq("host"), "left")
      .withColumn("__fr_d", coalesce(col("__fr_delay"), lit(defaultDelaySeconds)))
      .withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .withColumn("dispatch_offset_s", col("seq") * col("__fr_d"))
      .drop("__fr_delay", "__fr_d")
  }
}
