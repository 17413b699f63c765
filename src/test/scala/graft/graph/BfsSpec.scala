package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive ground truth: multi-source BFS on the driver. */
  private def naive(edges: Seq[(Long, Long)], seeds: Set[Long], maxHops: Int,
      directed: Boolean): Map[Long, Long] = {
    val adj = (if (directed) edges else edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int,
      directed: Boolean = false): Map[Long, Long] =
    Bfs.hopDistances(edges.toDF("src", "dst"), seeds.toDF("v"), maxHops, directed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph distances from one seed") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, Seq(1L), 10) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // maxHops caps the radius
    assert(run(path, Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("matches naive BFS on a random graph, directed and undirected") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    for (directed <- Seq(true, false)) {
      assert(run(edges, Seq(0L, 7L), 4, directed) === naive(edges, Set(0L, 7L), 4, directed),
        s"directed=$directed")
    }
  }

  test("multi-source takes the minimum distance; unreachable vertices absent") {
    // two components: 1-2-3 and 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val got = run(edges, Seq(1L, 3L), 5)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 0L)) // 2 is 1 hop from either seed
  }

  test("directed edges are one-way; self-loops and duplicates are harmless") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L), (3L, 1L))
    val got = run(edges, Seq(1L), 3, directed = true)
    assert(got === Map(1L -> 0L, 2L -> 1L)) // 3→1 not traversable from 1
  }

  test("maxHops=0 returns only seeds; empty seeds return nothing") {
    val edges = Seq((1L, 2L))
    assert(run(edges, Seq(1L), 0) === Map(1L -> 0L))
    assert(run(edges, Seq.empty[Long], 3) === Map.empty[Long, Long])
  }

  test("seed absent from the graph still reports itself at dist 0") {
    assert(run(Seq((1L, 2L)), Seq(99L), 3) === Map(99L -> 0L))
  }
}
