package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohesionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Seq[Float], Int)]) =
    Cohesion.labelCohesion(rows.toDF("id", "vec", "label"),
      col("id"), col("vec"), col("label"))

  test("separable classes: cohesion 1, separation 0, margin 1") {
    val rows = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(2f, 0f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0f, 3f), 1))
    val got = run(rows).orderBy("label").collect()
    assert(got.length === 2)
    got.foreach { r =>
      assert(r.getLong(1) === 2L)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, "axis-aligned members vs own centroid")
      assert(math.abs(r.getDouble(3)) < 1e-12, "orthogonal other centroid")
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    }
  }

  test("a mislabeled member drags cohesion down and can flip the margin") {
    // label 0 holds one vector that actually belongs with label 1
    val rows = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0f, 1f), 1))
    val got = run(rows).orderBy("label").collect()
    val l0 = got(0)
    // centroid0 = (.5,.5); members at 45° → cohesion cos45 ≈ 0.7071
    assert(math.abs(l0.getDouble(2) - math.sqrt(0.5)) < 1e-9)
    // the mislabeled (0,1) member has cosine 1.0 to centroid1 → separation
    // avg of (0, 1) = 0.5 → margin ≈ 0.207
    assert(math.abs(l0.getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(l0.getDouble(4) - (math.sqrt(0.5) - 0.5)) < 1e-9)
  }

  test("a single label has null separation and margin") {
    val got = run(Seq((1L, Seq(1f, 0f), 0), (2L, Seq(1f, 1f), 0))).collect()
    assert(got.length === 1)
    assert(got.head.isNullAt(3) && got.head.isNullAt(4))
    assert(got.head.getDouble(2) > 0.9)
  }
}
