package graft.graph

import graft.operators.Lineage
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** HyperBall (Boldi & Vigna 2013): the neighborhood function
  * N(t) = #{(v,u) : d(v,u) ≤ t} of a graph, estimated with one
  * HyperLogLog "ball" sketch per vertex — THE way distance statistics
  * (effective diameter, average distance, centrality spectra) are
  * computed on web/social graphs where exact all-pairs BFS is |V|²
  * and dead. The recurrence is pure merge:
  * Ball_v(t) = Ball_v(t−1) ∪ ⋃_{v→w} Ball_w(t−1), and HLL unions make
  * each round ONE edge join + ONE vertex-keyed sketch aggregate —
  * |V|-scale state (4-8 KB/vertex at lgK=12), |E|-scale work per
  * round, partial-aggregating and AQE-splittable; hub vertices merge
  * map-side exactly like any hot aggregation key. Rounds lineage-
  * truncate ([[graft.operators.Lineage]]) like every graft iterative
  * operator; per-round driver state is the single N(t) scalar.
  *
  * The loop stops early once the sum of per-vertex estimates stops
  * changing (merges are monotone; a fixed point means every ball
  * stopped growing — t reached the diameter), and the converged value
  * fills the remaining rows so the output always has maxT+1 rows. */
object HyperBall {

  /** (t, n_pairs_est) for t = 0..maxT. `edges` needs `src`/`dst`
    * columns; `directed=false` traverses both ways. */
  def neighborhoodFunction(edges: DataFrame, maxT: Int, lgK: Int = 12,
                           directed: Boolean = false): DataFrame = {
    require(maxT >= 0, s"maxT must be >= 0, got $maxT")
    val spark = edges.sparkSession
    val e = normalized(edges, directed)
    val nodes = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()
    var balls = Lineage.truncate(
      nodes.groupBy("v").agg(hll_sketch_agg(col("v"), lit(lgK)).as("sk")))
    def total(b: DataFrame): Double =
      b.agg(coalesce(sum(hll_sketch_estimate(col("sk"))), lit(0.0))).head().getDouble(0)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, total(balls)))
    var t = 1
    var converged = false
    while (t <= maxT && !converged) {
      val contrib = e.join(balls, e("dst") === balls("v"))
        .groupBy(e("src").as("v")).agg(hll_union_agg(col("sk")).as("nsk"))
      balls = Lineage.truncate(
        balls.join(contrib, Seq("v"), "left_outer")
          .select(col("v"),
            when(col("nsk").isNull, col("sk"))
              .otherwise(hll_union(col("sk"), col("nsk"))).as("sk")))
      val nf = total(balls)
      converged = nf == out.last._2
      out += ((t, nf))
      t += 1
    }
    while (out.size <= maxT) out += ((out.size, out.last._2))
    toDf(spark, out.toSeq)
  }

  /** EXACT neighborhood function by distinct-pair frontier expansion —
    * |pairs| ≤ |V|² state, the cost HyperBall exists to avoid; provided
    * for small graphs and for verifying the estimate (the c8b exact-
    * mode-at-test-scale discipline). */
  def exactNeighborhoodFunction(edges: DataFrame, maxT: Int,
                                directed: Boolean = false): DataFrame = {
    require(maxT >= 0, s"maxT must be >= 0, got $maxT")
    val spark = edges.sparkSession
    val e = normalized(edges, directed)
    val nodes = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()
    var pairs = Lineage.truncate(nodes.select(col("v"), col("v").as("u")))
    val out = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, pairs.count().toDouble))
    var t = 1
    var converged = false
    while (t <= maxT && !converged) {
      pairs = Lineage.truncate(
        pairs.unionAll(
            pairs.join(e, pairs("u") === e("src")).select(col("v"), col("dst").as("u")))
          .distinct())
      val nf = pairs.count().toDouble
      converged = nf == out.last._2
      out += ((t, nf))
      t += 1
    }
    while (out.size <= maxT) out += ((out.size, out.last._2))
    toDf(spark, out.toSeq)
  }

  /** Per-vertex harmonic centrality estimate H(v) = Σ_{u≠v} 1/d(v,u),
    * the distance-based importance ranking Common Crawl publishes for
    * its host graph (Boldi-Vigna's preferred centrality: handles
    * disconnected graphs where closeness breaks) — computed from the
    * SAME ball recurrence: the t-shell size is |B(v,t)| − |B(v,t−1)|,
    * and H(v) = Σ_t shell_t/t accumulates per vertex as the balls grow.
    * Same scale shape as [[neighborhoodFunction]]: |V|-scale sketch
    * state, one edge join + one sketch aggregate per round, lineage
    * truncated, early exit at the fixed point. Distances beyond `maxT`
    * contribute nothing (documented truncation — at web scale the
    * 1/d tail beyond the effective diameter is noise); for DIRECTED
    * in-centrality (paths TO v, the standard form) pass the reversed
    * edge table with `directed = true`.
    *
    * Output: (vertex, harmonic_est) — estimates, not exact values (the
    * HLL trade that makes |V|²-free centrality possible); rank with
    * them, verify small graphs against [[exactHarmonicCentrality]]. */
  def harmonicCentrality(edges: DataFrame, maxT: Int, lgK: Int = 12,
                         directed: Boolean = false): DataFrame = {
    require(maxT >= 1, s"maxT must be >= 1, got $maxT")
    val e = normalized(edges, directed)
    val nodes = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()
    var state = Lineage.truncate(
      nodes.groupBy("v").agg(hll_sketch_agg(col("v"), lit(lgK)).as("sk"))
        .select(col("v"), col("sk"),
          hll_sketch_estimate(col("sk")).as("__prev"), lit(0.0).as("score")))
    def total(s: DataFrame): Double =
      s.agg(coalesce(sum(col("__prev")), lit(0.0))).head().getDouble(0)
    var last = total(state)
    var t = 1
    var converged = false
    while (t <= maxT && !converged) {
      val contrib = e.join(state, e("dst") === state("v"))
        .groupBy(e("src").as("v")).agg(hll_union_agg(col("sk")).as("nsk"))
      val est = hll_sketch_estimate(col("__nsk"))
      state = Lineage.truncate(
        state.join(contrib, Seq("v"), "left_outer")
          .select(col("v"),
            when(col("nsk").isNull, col("sk"))
              .otherwise(hll_union(col("sk"), col("nsk"))).as("__nsk"),
            col("__prev"), col("score"))
          // registers only grow under union and the estimate is
          // monotone in them, so the shell is ≥ 0; greatest() guards
          // the contract explicitly rather than trusting it silently
          .select(col("v"), col("__nsk").as("sk"), est.as("__prev"),
            (col("score") + greatest(est - col("__prev"), lit(0.0)) / t).as("score")))
      val nf = total(state)
      converged = nf == last
      last = nf
      t += 1
    }
    state.select(col("v").as("vertex"), col("score").as("harmonic_est"))
  }

  /** EXACT harmonic centrality by (source, reached) pair-frontier BFS —
    * |V|²-bounded state, verification-scale only (the
    * [[exactNeighborhoodFunction]] discipline). Same `maxT` truncation
    * and direction contract as [[harmonicCentrality]]. */
  def exactHarmonicCentrality(edges: DataFrame, maxT: Int,
                              directed: Boolean = false): DataFrame = {
    require(maxT >= 1, s"maxT must be >= 1, got $maxT")
    val e = normalized(edges, directed)
    val nodes = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v"))).distinct()
    var visited = Lineage.truncate(nodes.select(col("v"), col("v").as("u"))
      .withColumn("__d", lit(0)))
    var frontier = visited
    var t = 1
    while (t <= maxT && !frontier.isEmpty) {
      val next = Lineage.truncate(
        frontier.join(e, frontier("u") === e("src"))
          .select(col("v"), col("dst").as("u")).distinct()
          .join(visited.select("v", "u"), Seq("v", "u"), "left_anti")
          .withColumn("__d", lit(t)))
      visited = Lineage.truncate(visited.unionAll(next))
      frontier = next
      t += 1
    }
    visited.filter(col("__d") > 0)
      .groupBy(col("v").as("vertex"))
      .agg(sum(lit(1.0) / col("__d")).as("harmonic"))
  }

  private def normalized(edges: DataFrame, directed: Boolean): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    Lineage.truncate(
      (if (directed) fwd
       else fwd.unionAll(edges.select(col("dst").as("src"), col("src").as("dst"))))
        .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
        .distinct())
  }

  private def toDf(spark: SparkSession, rows: Seq[(Int, Double)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
      StructType(Seq(StructField("t", IntegerType, nullable = false),
        StructField("n_pairs_est", DoubleType, nullable = false))))
}
