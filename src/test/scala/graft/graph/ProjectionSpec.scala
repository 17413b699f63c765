package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("bipartiteProject: shared counts, overlap and cosine, canonical a<b") {
    // u1 ~ {i1,i2,i3}, u2 ~ {i2,i3}, u3 ~ {i3,i4}
    val e = Seq(("u1", "i1"), ("u1", "i2"), ("u1", "i3"),
      ("u2", "i2"), ("u2", "i3"), ("u3", "i3"), ("u3", "i4")).toDF("src", "dst")
    val got = Projection.bipartiteProject(e)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set(("u1", "u2"), ("u1", "u3"), ("u2", "u3")))
    val (s12, o12, c12) = got(("u1", "u2"))
    assert(s12 === 2L && math.abs(o12 - 1.0) < 1e-12) // 2/min(3,2)
    assert(math.abs(c12 - 2.0 / math.sqrt(6.0)) < 1e-12)
    assert(got(("u1", "u3"))._1 === 1L && got(("u2", "u3"))._1 === 1L)
  }

  test("bipartiteProject: minShared floor; duplicate edges collapse") {
    val e = Seq(("u1", "i1"), ("u1", "i1"), ("u1", "i2"), ("u2", "i1"),
      ("u2", "i2"), ("u3", "i2")).toDF("src", "dst")
    val got = Projection.bipartiteProject(e, minShared = 2)
      .select("a", "b", "shared").as[(String, String, Long)].collect()
    assert(got.toSeq === Seq(("u1", "u2", 2L))) // u3 shares only 1
  }

  test("bipartiteProject: a right hub over the cap drops whole, degrees follow") {
    // "hub" connects all three users; capped at 2 it vanishes entirely,
    // leaving only the i1 pair — and u1's degree must count 1, not 2
    val e = Seq(("u1", "i1"), ("u2", "i1"),
      ("u1", "hub"), ("u2", "hub"), ("u3", "hub")).toDF("src", "dst")
    val capped = Projection.bipartiteProject(e, maxRightDegree = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(capped.keySet === Set(("u1", "u2")))
    assert(capped(("u1", "u2")) === ((1L, 1.0))) // overlap 1/min(1,1)
    val uncapped = Projection.bipartiteProject(e)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(uncapped === Set(("u1", "u2"), ("u1", "u3"), ("u2", "u3")))
  }
}
