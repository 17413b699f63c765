package graft.graph

import graft.operators.Lineage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-core decomposition by distributed peeling — the graph-pruning
  * complement of [[Triangles]]' density metric and [[PageRank]]'s
  * importance ranking: the k-core is the maximal subgraph where every
  * vertex keeps degree ≥ k INSIDE the subgraph. Spam link-rings and
  * scraper farms survive aggressive coring (dense by construction)
  * while organic long-tail pages peel away, which is why crawl-graph
  * curation cores before it ranks; community "engagement cores" in
  * event graphs are the same computation.
  *
  * The classic peel, Spark-shaped: each round computes degrees (one
  * partial-aggregating groupBy over the edge list), finds vertices
  * below k, and anti-joins them out of BOTH endpoint positions;
  * [[Lineage.truncate]] cuts each round's plan (the [[Bfs]] round
  * discipline — without it round r replays rounds 1..r-1), and the
  * empty-delta early exit rides the truncation's materialization.
  * Rounds are bounded by the graph's PEELING DEPTH — small for
  * power-law graphs (hubs hold cores together), but O(n/2) on an
  * adversarial path graph, so `maxRounds` is a loud contract, not a
  * silent cap: exceeding it throws rather than returning a
  * not-yet-converged set that LOOKS like a core. Per-round cost is
  * O(E_remaining); the edge list only shrinks.
  */
object KCore {

  /** Vertices of the k-core: `(vertex, degree)` rows with the degree
    * measured INSIDE the core (all ≥ k by definition; empty result =
    * no k-core). Input edges are canonicalized: self-loops dropped,
    * parallel/reverse duplicates collapsed — a simple undirected
    * graph, the [[Triangles]] discipline. */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
      maxRounds: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = Lineage.truncate(
      edges.filter(src.isNotNull && dst.isNotNull && src =!= dst)
        .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
        .distinct())
    var round = 0
    var done = false
    while (!done) {
      val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val bad = deg.filter(col("deg") < k).select("v")
      val pruned = Lineage.truncate(
        e.join(bad.withColumnRenamed("v", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("v", "b"), Seq("b"), "left_anti")
          .select("a", "b"))
      val before = e.count()
      val after = pruned.count()
      e = pruned
      if (after == before || after == 0) done = true
      else {
        round += 1
        if (round >= maxRounds) throw new IllegalStateException(
          s"k-core peel did not converge in $maxRounds rounds " +
            s"($after edges remain); raise maxRounds — this graph's " +
            "peeling depth exceeds the configured bound")
      }
    }
    e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k) // vacuous by fixpoint; keeps the contract loud
  }
}
