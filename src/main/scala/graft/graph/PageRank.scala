package graft.graph

import graft.operators.Lineage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge table — the iterative-graph workload beyond
  * [[graft.dedup.Dedup.clusterPairs]]'s min-label propagation. The
  * LLM-data use is crawl curation: rank domains/pages by link
  * centrality to prioritize fetching and weight sources (the same role
  * harmonic centrality plays in Common Crawl's ranking).
  *
  * Power iteration with damping `d`: rank ← (1−d)/n + d·(Σ in-neighbor
  * rank/out-degree + dangling mass/n), a FIXED number of rounds so the
  * result is deterministic and externally re-derivable (a convergence
  * threshold would couple the answer to float noise; rank movement
  * after `iters` rounds is bounded by d^iters).
  *
  * Scale shape per round: one (src)-keyed join ranks⋈edges, one (dst)
  * hash aggregate — the d15 iteration discipline: [[Lineage.truncate]]
  * cuts lineage each round (reliable checkpoint when the session has a
  * checkpoint dir, localCheckpoint otherwise), the dangling-mass term
  * is a one-row broadcast, nothing pairwise, no driver-side graph
  * state. Vertices and degrees are computed ONCE up front and reused
  * via the same truncation.
  */
object PageRank {

  /** (vertex, rank) after `iters` rounds over `edges(src, dst)`.
    * Duplicate edges count once; self-loops are legal. Ranks sum to 1
    * (up to float round-off) — dangling vertices' mass is
    * redistributed uniformly, the standard stochastic completion. */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 5): DataFrame = {
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = Lineage.truncate(edges.select(col("src"), col("dst")).distinct())
    val vertices = Lineage.truncate(
      e.select(col("src").as("v"))
        .unionAll(e.select(col("dst").as("v")))
        .distinct())
    val outDeg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("__deg"))
    // degrees ride on the vertex table once; dangling vertices keep null
    val verts = Lineage.truncate(vertices.join(outDeg, Seq("v"), "left"))
    // 1/n folded in as a literal: the count is one cheap action over
    // the checkpointed vertex table, and every round's plan stays free
    // of an extra aggregate+broadcast
    val invN = 1.0 / verts.count().toDouble
    var ranks = Lineage.truncate(verts.select(col("v"), col("__deg"), lit(invN).as("rank")))
    for (_ <- 0 until iters) {
      // mass leaving dangling vertices — a single-row broadcast
      val dangling = ranks.agg(
        coalesce(sum(when(col("__deg").isNull, col("rank"))), lit(0.0)).as("__dm"))
      val contrib = ranks.filter(col("__deg").isNotNull)
        .join(e, ranks("v") === e("src"))
        .select(col("dst").as("v"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("v").agg(sum("__c").as("__in"))
      ranks = Lineage.truncate(verts.join(contrib, Seq("v"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("v"), col("__deg"),
          (lit((1.0 - damping) * invN) +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) + col("__dm") * lit(invN)))
            .as("rank")))
    }
    ranks.select(col("v").as("vertex"), round(col("rank"), 6).as("rank"))
  }
}
