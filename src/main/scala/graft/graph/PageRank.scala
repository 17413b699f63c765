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

  /** Weighted PageRank over `edges(src, dst, weight)`: contributions
    * split proportionally to edge weight instead of 1/out-degree —
    * the form co-citation/co-purchase graphs need ([[Projection]]'s
    * shared-count edges, crawl graphs with link multiplicities, D86's
    * bigram weights): an edge seen 40× should carry 40× the vote of a
    * hapax edge, which the unweighted walk throws away.
    *
    * Same scale discipline as [[pageRank]]: parallel edges COLLAPSE BY
    * SUMMING their weights (one partial-aggregating normalize pass),
    * out-strengths fold into per-edge transition probabilities ONCE so
    * every round is one src-keyed join + one dst hash aggregate with
    * [[graft.operators.Lineage.truncate]] cutting lineage; dangling
    * mass (vertices with no outgoing weight) redistributes uniformly
    * via a one-row broadcast. Non-positive/null weights are dropped
    * (they carry no vote; a zero-weight edge must not create a
    * spurious dangling escape). Ranks sum to 1 up to float round-off.
    * With all weights equal this IS [[pageRank]] (spec-asserted). */
  def weightedPageRank(edges: DataFrame, damping: Double = 0.85,
                       iters: Int = 5): DataFrame = {
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = Lineage.truncate(
      edges.select(col("src"), col("dst"), col("weight").cast("double").as("__w"))
        .filter(col("src").isNotNull && col("dst").isNotNull && col("__w") > 0)
        .groupBy("src", "dst").agg(sum(col("__w")).as("__w")))
    val outW = e0.groupBy("src").agg(sum(col("__w")).as("__ow"))
    val trans = Lineage.truncate(
      e0.join(outW, "src")
        .select(col("src"), col("dst"), (col("__w") / col("__ow")).as("__p")))
    val vertices = Lineage.truncate(
      e0.select(col("src").as("v")).unionAll(e0.select(col("dst").as("v")))
        .distinct()
        .join(outW.select(col("src").as("v")).withColumn("__hasout", lit(true)),
          Seq("v"), "left"))
    val invN = 1.0 / vertices.count().toDouble
    var ranks = Lineage.truncate(
      vertices.select(col("v"), col("__hasout"), lit(invN).as("rank")))
    for (_ <- 0 until iters) {
      val dangling = ranks.agg(
        coalesce(sum(when(col("__hasout").isNull, col("rank"))), lit(0.0)).as("__dm"))
      val contrib = ranks.join(trans, ranks("v") === trans("src"))
        .select(col("dst").as("v"), (col("rank") * col("__p")).as("__c"))
        .groupBy("v").agg(sum("__c").as("__in"))
      ranks = Lineage.truncate(
        vertices.join(contrib, Seq("v"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("v"), col("__hasout"),
            (lit((1.0 - damping) * invN) +
              lit(damping) * (coalesce(col("__in"), lit(0.0)) + col("__dm") * lit(invN)))
              .as("rank")))
    }
    ranks.select(col("v").as("vertex"), round(col("rank"), 6).as("rank"))
  }
}
