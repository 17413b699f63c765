package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  /** Naive ground truth: count vertex triples with all three edges. */
  private def naiveTriangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    vs.combinations(3).count { case Seq(x, y, z) =>
      und((x, y)) && und((x, z)) && und((y, z))
    }
  }

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.triangleStats(edges.toDF("src", "dst"), "src", "dst").head()

  test("counts each triangle exactly once on a known graph") {
    // K4 (4 triangles) plus a pendant and a disconnected edge
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val edges = k4 ++ Seq((4L, 5L), (8L, 9L))
    val r = stats(edges)
    assert(r.getAs[Long]("n_vertices") == 7)
    assert(r.getAs[Long]("n_edges") == 8)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("n_triangles") == naiveTriangles(edges))
    // wedges: degrees 4,3,3,3,1,1,1 minus... compute: Σ C(d,2)
    assert(r.getAs[Long]("n_wedges") == naiveWedges(edges))
  }

  private def naiveWedges(edges: Seq[(Long, Long)]): Long = {
    val und = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
    deg.values.map(d => d.toLong * (d - 1) / 2).sum
  }

  test("self-loops, duplicates, and reverse duplicates collapse") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (3L, 1L))
    val r = stats(edges)
    assert(r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Long]("n_triangles") == 1)
  }

  test("bipartite graph has zero triangles (and null-safe clustering)") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    val r = stats(edges)
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Double]("clustering") == 0.0)
  }

  test("matches the naive count on a pseudo-random graph with hubs") {
    // deterministic congruential edges; hub 0 connects to everything
    val rnd = (1 to 300).map(i => ((i * 7919L) % 40, (i * 104729L) % 40))
    val hub = (1L to 39L).map(v => (0L, v))
    val edges = rnd ++ hub
    val r = stats(edges)
    assert(r.getAs[Long]("n_triangles") == naiveTriangles(edges))
    assert(r.getAs[Long]("n_wedges") == naiveWedges(edges))
  }
}
