package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1-2-3-4-5 (undirected)
  private def path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")

  test("exactNeighborhoodFunction: hand values on a path graph, converged tail filled") {
    // N(0)=5, N(1)=5+2·4=13, N(2)=13+2·3=19, N(3)=19+2·2=23, N(4)=25=diam
    val got = HyperBall.exactNeighborhoodFunction(path, maxT = 6)
      .orderBy("t").select("t", "n_pairs_est").as[(Int, Double)].collect().toSeq
    assert(got === Seq((0, 5.0), (1, 13.0), (2, 19.0), (3, 23.0), (4, 25.0),
      (5, 25.0), (6, 25.0)))
  }

  test("directed graphs only expand along edge direction") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = HyperBall.exactNeighborhoodFunction(e, maxT = 2, directed = true)
      .orderBy("t").select("n_pairs_est").as[Double].collect().toSeq
    // t0: 3 self-pairs; t1: +(1,2),(2,3); t2: +(1,3)
    assert(got === Seq(3.0, 5.0, 6.0))
  }

  test("neighborhoodFunction estimate tracks exact within 5% on a random graph") {
    val edges = (1 to 400).map(i => ((i * 37) % 97, (i * 53) % 97))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val est = HyperBall.neighborhoodFunction(edges, maxT = 3)
      .orderBy("t").select("n_pairs_est").as[Double].collect()
    val exact = HyperBall.exactNeighborhoodFunction(edges, maxT = 3)
      .orderBy("t").select("n_pairs_est").as[Double].collect()
    est.zip(exact).foreach { case (e2, x) =>
      assert(math.abs(e2 - x) / x <= 0.05, s"estimate $e2 vs exact $x")
    }
    // the function is non-decreasing in t
    assert(est.sliding(2).forall(w => w(0) <= w(1) + 1e-9))
  }

  test("duplicate edges, self-loops and nulls are normalized away") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L)).toDF("src", "dst")
      .unionAll(Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L)))
        .toDF("src", "dst"))
    // the null-src edge is dropped entirely, so 9 never enters the
    // vertex set; the self-loop is stripped; nodes {1,2}: 2 → 4 → 4
    val got = HyperBall.exactNeighborhoodFunction(e, maxT = 2)
      .orderBy("t").select("n_pairs_est").as[Double].collect().toSeq
    assert(got === Seq(2.0, 4.0, 4.0))
  }

  test("exactHarmonicCentrality: hand values on a path; maxT truncates the tail") {
    // path 1-2-3-4 undirected: H(2) = 1 + 1 + 1/2 = 2.5 (ends), H(1) =
    // 1 + 1/2 + 1/3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val h = HyperBall.exactHarmonicCentrality(e, maxT = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(h(1L) - (1.0 + 0.5 + 1.0 / 3)) < 1e-12)
    assert(math.abs(h(2L) - 2.5) < 1e-12)
    assert(math.abs(h(3L) - 2.5) < 1e-12)
    assert(math.abs(h(4L) - (1.0 + 0.5 + 1.0 / 3)) < 1e-12)
    // maxT=1 keeps only direct neighbors
    val t1 = HyperBall.exactHarmonicCentrality(e, maxT = 1)
      .as[(Long, Double)].collect().toMap
    assert(t1 === Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 1.0))
  }

  test("exactHarmonicCentrality: directed edges measure OUT-distance as given") {
    // 1→2→3: from 1 reach 2 (d1) and 3 (d2); from 3 reach nothing
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val h = HyperBall.exactHarmonicCentrality(e, maxT = 5, directed = true)
      .as[(Long, Double)].collect().toMap
    assert(h.get(3L).isEmpty) // no outgoing paths → no row
    assert(math.abs(h(1L) - 1.5) < 1e-12 && h(2L) === 1.0)
  }

  test("harmonicCentrality estimate tracks exact within 10% and ranks a star's hub first") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val est = HyperBall.harmonicCentrality(edges, maxT = 4)
      .as[(Long, Double)].collect().toMap
    val exact = HyperBall.exactHarmonicCentrality(edges, maxT = 4)
      .as[(Long, Double)].collect().toMap
    assert(est.keySet === exact.keySet)
    for ((v, x) <- exact)
      assert(math.abs(est(v) - x) / x <= 0.10, s"vertex $v: est ${est(v)} vs exact $x")
    // structure check: a star hub dominates its leaves
    val star = (1L to 12L).map(i => (0L, i)).toDF("src", "dst")
    val hs = HyperBall.harmonicCentrality(star, maxT = 3)
      .as[(Long, Double)].collect().toMap
    assert((1L to 12L).forall(l => hs(0L) > hs(l)))
  }
}
