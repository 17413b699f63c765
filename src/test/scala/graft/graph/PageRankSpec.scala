package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Naive in-memory power iteration with the same fixed rounds and
    * dangling handling — the ground truth. */
  private def naive(edges: Seq[(String, String)], d: Double, iters: Int): Map[String, Double] = {
    val e = edges.distinct
    val vs = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
    val n = vs.size
    var rank = vs.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dm = vs.filterNot(deg.contains).map(rank).sum
      val in = e.groupBy(_._2).view.mapValues(_.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = vs.map(v => v -> ((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dm / n))).toMap
    }
    rank
  }

  test("pageRank matches naive power iteration incl. dangling mass") {
    // C has no out-edges (dangling); duplicate edge A→B must count once
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("D", "A"))
    val got = PageRank.pageRank(edges.toDF("src", "dst"), damping = 0.85, iters = 5)
      .as[(String, Double)].collect().toMap
    val expect = naive(edges, 0.85, 5)
    expect.foreach { case (v, r) =>
      assert(math.abs(got(v) - r) < 1e-6, s"$v: ${got(v)} vs $r")
    }
    // stochastic: ranks sum to 1
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
    // the sink C (fed by A and B) outranks the source D (fed by nobody)
    assert(got("C") > got("D"))
  }

  test("pageRank of a cycle is uniform") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = PageRank.pageRank(edges, iters = 3).as[(String, Double)].collect().toMap
    got.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-6)) // output is rounded to 6 dp
  }

  test("weightedPageRank: equal weights reproduce the unweighted walk exactly") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
      .toDF("src", "dst")
    val want = PageRank.pageRank(edges, iters = 4).as[(String, Double)].collect().toMap
    val got = PageRank.weightedPageRank(edges.withColumn("weight", lit(2.0)),
      iters = 4).as[(String, Double)].collect().toMap
    assert(got === want)
  }

  test("weightedPageRank: weight steers the vote; parallel edges pool; junk weights drop") {
    // a splits 9:1 between b and c → b must far outrank c
    val e = Seq(("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0))
      .toDF("src", "dst", "weight")
    val got = PageRank.weightedPageRank(e, iters = 6)
      .as[(String, Double)].collect().toMap
    assert(got("b") > 2 * got("c"), s"9:1 split must separate: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
    // parallel edges pool: (a→b 9) ≡ (a→b 4 + a→b 5)
    val pooled = PageRank.weightedPageRank(
        Seq(("a", "b", 4.0), ("a", "b", 5.0), ("a", "c", 1.0), ("b", "a", 1.0),
          ("c", "a", 1.0)).toDF("src", "dst", "weight"), iters = 6)
      .as[(String, Double)].collect().toMap
    assert(pooled === got)
    // zero/null weights carry no vote and create no vertex
    val junk = PageRank.weightedPageRank(
        Seq(("a", "b", 1.0), ("a", "z", 0.0)).toDF("src", "dst", "weight")
          .unionAll(Seq(("a", "q", null.asInstanceOf[java.lang.Double]))
            .toDF("src", "dst", "weight")), iters = 2)
      .as[(String, Double)].collect().toMap
    assert(junk.keySet === Set("a", "b"))
  }
}
