package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: synchronous LPA with the same deterministic
    * (max count, min label) vote. */
  private def naive(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).filter(p => p._1 != p._2).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val verts = sym.flatMap(p => Seq(p._1, p._2)).distinct
    var lab = verts.map(v => v -> v).toMap
    for (_ <- 0 until iters) {
      lab = verts.map { v =>
        val counts = adj.getOrElse(v, Seq.empty).map(lab).groupBy(identity)
          .view.mapValues(_.size).toMap
        if (counts.isEmpty) v -> lab(v)
        else v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Communities.labelPropagation(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("two triangles joined by one bridge settle into two communities") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle A
      (10L, 11L), (11L, 12L), (10L, 12L),     // triangle B
      (3L, 10L))                              // bridge
    val got = run(e, iters = 4)
    assert(got === naive(e, 4))
    // each triangle agrees internally on one label, and they differ
    assert(Set(got(1L), got(2L)).size === 1 && got(1L) === got(3L))
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
    assert(got(1L) !== got(10L))
  }

  test("matches the reference vote-for-vote on a random graph, both parities") {
    val rnd = new scala.util.Random(11)
    val e = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    for (iters <- Seq(3, 4)) // sync LPA can 2-cycle: pin both parities
      assert(run(e, iters) === naive(e, iters), s"iters=$iters")
  }

  test("deterministic tie rule: a single edge pair converges to the min label") {
    // after round 1: 1 adopts 2's label? no — 1's only neighbor is 2
    // (label 2), 2's only neighbor is 1 (label 1): sync swap; round 2
    // swaps back... the min-label tie never fires on degree-1 pairs,
    // parity decides — pin the exact reference behavior instead of a guess
    val e = Seq((1L, 2L))
    assert(run(e, 1) === naive(e, 1))
    assert(run(e, 2) === naive(e, 2))
  }

  test("self-loops, duplicates, nulls normalized; directed honors direction") {
    val base = Seq((1L, 2L), (1L, 2L), (2L, 2L)).toDF("src", "dst")
      .unionAll(Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)))
        .toDF("src", "dst"))
    val got = Communities.labelPropagation(base, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L)) // 5 rode a null edge: excluded
    // directed: 1→2 means only 2 hears 1's label; 1 keeps its own
    val dgot = Communities.labelPropagation(
        Seq((1L, 2L)).toDF("src", "dst"), iters = 3, directed = true)
      .as[(Long, Long)].collect().toMap
    assert(dgot === Map(1L -> 1L, 2L -> 1L))
  }
}
