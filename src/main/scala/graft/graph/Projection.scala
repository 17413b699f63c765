package graft.graph

import graft.operators.Lineage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite → unipartite projection: connect two left-side vertices
  * by the number of right-side neighbors they share — users sharing
  * items (co-purchase), suppliers sharing parts, documents sharing
  * hosts: THE standard graph build feeding [[PageRank]]/[[Communities]]
  * /[[Triangles]] when the raw data is bipartite. Emits the shared
  * count plus the two standard normalized weights (overlap =
  * shared/min(degᵃ,degᵇ), cosine = shared/√(degᵃ·degᵇ)), so downstream
  * thresholds don't favor high-degree vertices.
  *
  * Scale shape: distinct edges, right-side degrees partial-aggregate;
  * pair generation is the self-equi-join on the SHARED right vertex —
  * a right hub of degree d yields C(d,2) pairs, so `maxRightDegree`
  * drops over-connected right vertices WHOLE before pairing (the
  * B17/D85 mega-basket guard: a part every supplier buys connects
  * everyone to everyone and carries no signal; the cap is part of the
  * operator's contract, oracle-mirrored, never silent truncation
  * mid-pair). Pair counts partial-aggregate (Zipf pairs collapse
  * map-side), left degrees join back key-hashed, `minShared` bounds
  * the output before the degree joins. Canonical a < b orientation. */
object Projection {

  def bipartiteProject(edges: DataFrame, minShared: Long = 1L,
                       maxRightDegree: Long = 10000L): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxRightDegree >= 2, s"maxRightDegree must be >= 2, got $maxRightDegree")
    val e = Lineage.truncate(
      edges.select(col("src"), col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val rdeg = e.groupBy("dst").agg(count(lit(1)).as("__rd"))
    val kept = e.join(rdeg.filter(col("__rd") <= maxRightDegree).select("dst"), "dst")
    // left degrees are measured on the CAPPED edge set so overlap and
    // cosine stay consistent with the pairs actually generated
    val ldeg = Lineage.truncate(
      kept.groupBy(col("src").as("__v")).agg(count(lit(1)).as("__d")))
    val b = kept.select(col("dst"), col("src").as("__b"))
    val pairs = kept.join(b, Seq("dst"))
      .filter(col("src") < col("__b"))
      .groupBy(col("src").as("a"), col("__b").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(ldeg.select(col("__v").as("a"), col("__d").as("__da")), "a")
      .join(ldeg.select(col("__v").as("b"), col("__d").as("__db")), "b")
      .select(col("a"), col("b"), col("shared"),
        (col("shared") / least(col("__da"), col("__db"))).as("overlap"),
        (col("shared") / sqrt(col("__da") * col("__db"))).as("cosine"))
  }
}
